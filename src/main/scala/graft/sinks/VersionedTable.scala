package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based versioned table: snapshot isolation, time travel, and
  * METADATA-ONLY clones over plain parquet — the semantics of the
  * reference's `CLONE ... FOR SYSTEM_TIME AS OF` staging refresh
  * (reference dags/dag_stellar_dbt_staging_refresh.py:84-88) without a
  * table-format dependency (the image ships no Delta/Iceberg).
  *
  * Layout: immutable data files under `root/data/<uuid>/part-*.parquet`;
  * each commit writes `root/_manifests/v<N>.manifest` — a newline list of
  * the file paths (relative to root) that ARE version N. Readers resolve
  * one manifest and scan exactly its files; writers never mutate a data
  * file, so every historical version stays readable until an explicit
  * vacuum. The manifest write is the commit point (tmp + atomic rename on
  * the local/HDFS-style filesystems this targets): a crash before the
  * rename leaves the previous version current and some orphaned data
  * files — never a torn table.
  *
  * Clone = write the target's v0 manifest pointing at the SOURCE's data
  * files, qualified absolute — zero bytes of data move, exactly the
  * metadata-only CLONE the reference's staging refresh relies on being
  * cheap. Clones are snapshots: later source commits append new files,
  * never touch old ones, so the clone keeps reading its frozen file set.
  *
  * At 100 TB: commits add one small manifest write per batch; reads list
  * one manifest instead of a recursive directory walk (cheaper than
  * plain parquet dirs, the same trick table formats use); time travel
  * and rollback are manifest pointer moves.
  */
object VersionedTable {

  private def fs(spark: SparkSession, root: String): FileSystem =
    FileSystem.get(new java.net.URI(root), spark.sparkContext.hadoopConfiguration)

  private def manifestDir(root: String) = new Path(root, "_manifests")

  private def versions(f: FileSystem, root: String): Seq[Long] =
    if (!f.exists(manifestDir(root))) Seq.empty
    else f.listStatus(manifestDir(root)).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+\\.manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong }
      .sorted

  def latestVersion(spark: SparkSession, root: String): Option[Long] =
    versions(fs(spark, root), root).lastOption

  private def readManifest(f: FileSystem, root: String, v: Long): Seq[String] = {
    val in = f.open(new Path(manifestDir(root), s"v$v.manifest"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList.filter(_.nonEmpty)
    finally in.close()
  }

  private def writeManifest(f: FileSystem, root: String, v: Long,
                            files: Seq[String]): Unit = {
    f.mkdirs(manifestDir(root))
    val tmp = new Path(manifestDir(root), s".v$v.manifest.tmp")
    val out = f.create(tmp, true)
    try out.write((files.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    if (!f.rename(tmp, new Path(manifestDir(root), s"v$v.manifest")))
      sys.error(s"VersionedTable: commit rename failed for $root v$v")
  }

  /** Write `df`'s rows as new immutable data files; return their paths
    * (absolute). No manifest is written here — callers compose.
    */
  private def writeDataFiles(df: DataFrame, root: String): Seq[String] = {
    val spark = df.sparkSession
    val dir = new Path(new Path(root, "data"), java.util.UUID.randomUUID().toString)
    df.write.parquet(dir.toString)
    val f = fs(spark, root)
    f.listStatus(dir).toSeq.map(_.getPath.toString)
      .filter(p => p.endsWith(".parquet") || p.contains("part-"))
      .filterNot(_.endsWith("_SUCCESS"))
  }

  /** Commit `df` as the next version: `overwrite = true` replaces the
    * live file set, `false` appends to it. Returns the new version id.
    */
  def commit(df: DataFrame, root: String, overwrite: Boolean): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    val prev = versions(f, root).lastOption
    val newFiles = writeDataFiles(df, root)
    val live = if (overwrite) newFiles
      else prev.map(readManifest(f, root, _)).getOrElse(Seq.empty) ++ newFiles
    val v = prev.map(_ + 1).getOrElse(0L)
    writeManifest(f, root, v, live)
    v
  }

  /** Read one version (default: latest). Scans exactly the manifest's
    * files — historical versions stay readable because data files are
    * immutable.
    */
  def read(spark: SparkSession, root: String, version: Option[Long] = None): DataFrame = {
    val f = fs(spark, root)
    val v = version.orElse(versions(f, root).lastOption)
      .getOrElse(sys.error(s"VersionedTable: no versions at $root"))
    val files = readManifest(f, root, v)
    require(files.nonEmpty, s"VersionedTable: empty manifest $root v$v")
    spark.read.parquet(files: _*)
  }

  /** METADATA-ONLY clone of `srcRoot` at `version` into `dstRoot`: the
    * clone's v0 manifest points at the source's immutable files — zero
    * data bytes copied, constant-time at any table size. Later commits
    * to the clone write their own files; later commits to the source
    * never mutate the referenced ones.
    */
  def cloneAt(spark: SparkSession, srcRoot: String, version: Long,
              dstRoot: String): Unit = {
    val f = fs(spark, srcRoot)
    writeManifest(f, dstRoot, 0L, readManifest(f, srcRoot, version))
  }

  /** Roll the table back to `version` by committing its manifest as the
    * newest — history is preserved (roll-forward is another rollback).
    */
  def rollback(spark: SparkSession, root: String, version: Long): Long = {
    val f = fs(spark, root)
    val v = versions(f, root).last + 1
    writeManifest(f, root, v, readManifest(f, root, version))
    v
  }
}
