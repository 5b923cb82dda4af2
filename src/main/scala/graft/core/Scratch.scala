package graft.core

/** Deterministic scratch locations under java.io.tmpdir, keyed by a tag +
  * an arbitrary key (typically the source data dir): one rule shared by
  * every gate query / drain that stages intermediate storage, so isolation
  * and collision behavior can't silently diverge between call sites.
  * Same (tag, key) -> same path, overwritten per run by design (reruns of
  * a gate query must be idempotent, not accumulate).
  */
object Scratch {
  def dir(tag: String, key: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$tag|$key".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_$h"
  }

  /** Recursive scratch-dir delete — ONE definition of the Hadoop FS
    * cleanup every append-mode or staged gate uses for idempotent reruns.
    */
  def clean(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    ()
  }
}
