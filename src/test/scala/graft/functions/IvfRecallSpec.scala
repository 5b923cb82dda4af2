package graft.functions

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall audit of the IVF variants on a held-out query set: Lloyd-refined
  * centroids must not lose recall vs the raw seed rule at equal nprobe
  * (seed cells are arbitrary corpus vectors; 2 Lloyd rounds move them
  * toward real density centers, tightening the probed neighborhoods).
  */
class IvfRecallSpec extends SparkSpec {

  import spark.implicits._

  private val heldOut = Seq(1L, 3L, 7L, 11L, 19L, 23L)
  private val k = 10
  private val nlist = 16
  private val nprobe = 4

  private def topIds(df: DataFrame): Set[Long] =
    df.select("vec_id").as[Long].collect().toSet

  test("2 Lloyd rounds: mean recall@10 >= seed centroids on held-out queries") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val cents = IvfIndex.lloydCentroids(emb, nlist, iters = 2)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cents.count()
    val (seedR, lloydR) = heldOut.map { qid =>
      val q = emb.filter(col("vec_id") === qid).select(col("embedding"))
      val truth = topIds(VectorFunctions.bruteForceTopK(emb, q, k))
      val seed = topIds(VectorFunctions.ivfTopK(emb, q, k, nlist, nprobe))
      val lloyd = topIds(IvfIndex.topKWithCentroids(emb, cents, q, k, nprobe))
      ((truth & seed).size.toDouble / k, (truth & lloyd).size.toDouble / k)
    }.unzip
    cents.unpersist()
    val (seedMean, lloydMean) = (seedR.sum / seedR.size, lloydR.sum / lloydR.size)
    info(f"seed recall@10 = $seedMean%.3f, lloyd recall@10 = $lloydMean%.3f")
    assert(lloydMean >= seedMean,
      f"Lloyd refinement lost recall: $lloydMean%.3f < $seedMean%.3f " +
        s"(per-query seed=$seedR lloyd=$lloydR)")
  }

  test("scale-path Lloyd (hash-agg means) agrees with the exact fold to 1e-6") {
    val emb = Tables.load(spark, sfDir, "embeddings")
    val exact = IvfIndex.lloydCentroids(emb, nlist, iters = 2)
      .select(col("cid"), posexplode(col("cvec")).as(Seq("dim", "v")))
    val fast = IvfIndex.lloydCentroidsFast(emb, nlist, iters = 2)
      .select(col("cid"), posexplode(col("cvec")).as(Seq("dim", "vf")))
    val maxDiff = exact.join(fast, Seq("cid", "dim"))
      .agg(max(abs(col("v") - col("vf")))).head().getDouble(0)
    assert(maxDiff <= 1e-6, s"fast/exact centroid divergence $maxDiff")
  }
}
