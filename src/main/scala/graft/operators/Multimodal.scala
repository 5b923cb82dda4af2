package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns plus typed metadata; decode /
  * feature-extraction runs per partition so a real implementation amortizes
  * codec/model initialization across a batch of rows (the same batching
  * shape `mapInPandas` gives Python). The decode step itself is a STUB —
  * the container ships no image/audio codecs — replaced by a deterministic
  * fake (byte stats) so the Spark-side contract (schema, partitioning,
  * batch iteration) is real and tested.
  */
object Multimodal {

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("content_hash", StringType),
    StructField("feature", ArrayType(DoubleType))))

  /** Wrap a text/binary source as a media table: (id, media_type, payload). */
  def asMediaTable(docs: DataFrame, idCol: String, payloadCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      (element_at(split(lit("image,audio,video"), ","),
        (col(idCol) % 3 + 1).cast("int"))).as("media_type"),
      col(payloadCol).cast("binary").as("payload"))

  /** STUB decoder: a real build would decode the codec here (per-partition
    * init, then per-row decode). The deterministic fake derives an 8-dim
    * "feature" from byte histograms so tests have stable expectations.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(featureSchema)
    media.mapPartitions { rows =>
      // per-partition "codec init" happens once, here.
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val id = r.getLong(r.fieldIndex("doc_id"))
        val mt = r.getString(r.fieldIndex("media_type"))
        val bytes = r.getAs[Array[Byte]]("payload")
        digest.reset()
        val hash = digest.digest(bytes).map("%02x".format(_)).mkString
        val feature = (0 until 8).map { b =>
          bytes.count(x => ((x & 0xff) % 8) == b).toDouble / math.max(bytes.length, 1)
        }.toArray
        Row(id, mt, bytes.length.toLong, hash, feature)
      }
    }(enc)
  }
}
