package graft.sinks

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro container-file sink + source built directly on avro-core (which
  * ships in the image; the spark-avro DataSource connector does not).
  * This makes K3 the reference's ACTUAL lake format — `EXPORT DATA ...
  * format='avro'` (reference dags/stellar_etl_airflow/
  * build_bq_generate_avro_job_task.py:26-34) — instead of the Parquet
  * layout substitute.
  *
  * Write shape matches EXPORT DATA's sharded output: one container file
  * per partition, rows ordered inside each file (sortWithinPartitions
  * upstream), no global order across shards. The writer runs in
  * foreachPartition — distributed, no driver collect; the reader
  * parallelizes one task per container file. At 100 TB both scale with
  * partition/file count exactly like the parquet paths.
  *
  * Type mapping (both directions, nullable = union(null, T)):
  * long/int/double/float/boolean/string/binary map 1:1;
  * TIMESTAMP → long + timestamp-micros; TIMESTAMP_NTZ → long +
  * local-timestamp-micros; DATE → int + date; DECIMAL(p,s) → bytes +
  * decimal(p,s); ARRAY<T> → array<T>.
  */
object AvroIO {

  def avroSchemaFor(schema: StructType, recordName: String = "GraftRow"): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroTypeFor(f.dataType, s"${recordName}_${f.name}")
      val t = if (f.nullable) Schema.createUnion(
        java.util.Arrays.asList(Schema.create(Schema.Type.NULL), base)) else base
      new Schema.Field(f.name, t, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    val rec = Schema.createRecord(recordName, null, "graft", false)
    rec.setFields(java.util.Arrays.asList(fields: _*))
    rec
  }

  private def avroTypeFor(dt: DataType, name: String): Schema = dt match {
    case LongType    => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, containsNull) =>
      val e = avroTypeFor(elem, name + "_elem")
      Schema.createArray(if (containsNull) Schema.createUnion(
        java.util.Arrays.asList(Schema.create(Schema.Type.NULL), e)) else e)
    case other =>
      throw new IllegalArgumentException(s"AvroIO: unsupported Spark type $other")
  }

  /** Spark value → Avro datum for one field. Timestamps use the session's
    * pinned UTC zone semantics: TIMESTAMP is an instant (epoch micros);
    * NTZ is a wall-clock local datetime (epoch micros of the local value
    * as if UTC) — the same µs the parquet writers store.
    */
  private def toAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (t: java.sql.Timestamp, TimestampType) =>
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    case (ldt: java.time.LocalDateTime, TimestampNTZType) =>
      ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
    case (d: java.sql.Date, DateType) => d.toLocalDate.toEpochDay.toInt
    case (dec: java.math.BigDecimal, dt2: DecimalType) =>
      java.nio.ByteBuffer.wrap(
        dec.setScale(dt2.scale).unscaledValue().toByteArray)
    case (b: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(b)
    case (s: scala.collection.Seq[_], ArrayType(elem, _)) =>
      s.map(toAvro(_, elem)).asJava
    case (x, _) => x
  }

  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: java.lang.Long, TimestampType) =>
      // floorDiv/floorMod, not truncating /%: pre-epoch micros are
      // negative and a negative setNanos argument throws
      val t = new java.sql.Timestamp(Math.floorDiv(l, 1000L))
      t.setNanos((Math.floorMod(l, 1000000L) * 1000L).toInt)
      t
    case (l: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(l, 1000000L), (Math.floorMod(l, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (i: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(i.longValue()))
    case (bb: java.nio.ByteBuffer, dt2: DecimalType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      new java.math.BigDecimal(new java.math.BigInteger(bytes), dt2.scale)
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val bytes = new Array[Byte](bb.remaining()); bb.duplicate().get(bytes)
      bytes
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (s: CharSequence, StringType) => s.toString
    case (arr: java.util.Collection[_], ArrayType(elem, _)) =>
      arr.asScala.map(fromAvro(_, elem)).toSeq
    case (x, _) => x
  }

  /** K3 in the reference's real format: one Avro container file per
    * partition (shard), rows in partition order — callers sort within
    * partitions upstream for the ORDER BY closed_at contract.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = avroSchemaFor(sparkSchema).toString
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    graft.core.Scratch.clean(df.sparkSession, path)
    // the dir must exist even for an all-empty write, so a reader of an
    // empty export sees zero files, not a missing path
    org.apache.hadoop.fs.FileSystem
      .get(new java.net.URI(path), conf.value)
      .mkdirs(new org.apache.hadoop.fs.Path(path))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val schema = new Schema.Parser().parse(avroJson)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(path), conf.value)
        // commit protocol: write to an attempt-unique temp name, rename
        // to the final shard on success. A speculative/zombie second
        // attempt writes its own temp; whichever renames first wins and
        // the loser discards — no interleaved container bytes, no
        // partial shard under the final name.
        val fin = new org.apache.hadoop.fs.Path(path, f"part-$pid%05d.avro")
        val tmp = new org.apache.hadoop.fs.Path(path,
          f".part-$pid%05d.avro.attempt-${tc.taskAttemptId()}%d.tmp")
        val out = fs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        try {
          rows.foreach { r =>
            val rec = new GenericData.Record(schema)
            var i = 0
            while (i < sparkSchema.length) {
              rec.put(sparkSchema(i).name, toAvro(r.get(i), sparkSchema(i).dataType))
              i += 1
            }
            writer.append(rec)
          }
        } finally writer.close()
        if (!fs.rename(tmp, fin)) {
          // a false rename is only benign when another attempt already
          // committed the shard — verify, or a transient fs failure
          // would silently drop every row of this partition behind a
          // valid _SUCCESS marker
          fs.delete(tmp, false)
          if (!fs.exists(fin))
            sys.error(s"AvroIO.write: rename to $fin failed and no " +
              "committed shard exists — refusing to lose the partition")
        }
      }
    }
    // job-level commit marker: a reader must not mistake a partially
    // written export (job died mid-way) for a complete one
    val f = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), conf.value)
    f.create(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), true).close()
  }

  /** Read a directory of Avro container files back as a DataFrame with
    * the DECLARED Spark schema (the k4-style contract: the reader states
    * what it expects; a drifted file fails loudly in the row converter).
    * One task per container file.
    */
  def read(spark: SparkSession, path: String, sparkSchema: StructType): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(path, "_SUCCESS")),
      s"AvroIO.read: $path has no _SUCCESS marker — incomplete or foreign export")
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.toString)
      .filter(f => f.endsWith(".avro") && !f.contains(".tmp")).sorted
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val schemaFields = sparkSchema.fields
    val rdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(files.length, 1))
      .flatMap { f =>
        val ffs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(f), conf.value)
        val in = ffs.open(new org.apache.hadoop.fs.Path(f))
        val reader = new DataFileStream[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // a task that stops consuming early (limit/take, downstream
        // failure) never drives hasNext to false, so the stream would
        // leak until GC — the completion listener closes it
        // deterministically on every task exit path (close is idempotent)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => reader.close()))
        // name drift fails loudly up front (get(name) on a missing
        // field would return silent nulls on every row), and rows
        // stream lazily — a shard is never buffered whole in memory
        schemaFields.foreach { sf =>
          if (reader.getSchema.getField(sf.name) == null) {
            reader.close()
            sys.error(s"AvroIO.read: declared column '${sf.name}' " +
              s"missing from writer schema of $f")
          }
        }
        new Iterator[Row] {
          private var open = true
          override def hasNext: Boolean = {
            val h = open && reader.hasNext
            if (open && !h) { reader.close(); open = false }
            h
          }
          override def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(schemaFields.toSeq.map(sf =>
              fromAvro(rec.get(sf.name), sf.dataType)))
          }
        }
      }
    spark.createDataFrame(rdd, sparkSchema)
  }
}
