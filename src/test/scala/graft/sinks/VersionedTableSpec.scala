package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Manifest-based versioned table: snapshot isolation, time travel,
  * metadata-only clones, rollback.
  */
class VersionedTableSpec extends SparkSpec {

  import spark.implicits._

  private def ids(root: String, v: Option[Long] = None): Set[Long] =
    VersionedTable.read(spark, root, v).select("id").as[Long].collect().toSet

  test("commit history: every version stays readable after later overwrites") {
    val root = java.nio.file.Files.createTempDirectory("vt").toString
    val v0 = VersionedTable.commit(Seq(1L, 2L).toDF("id"), root, overwrite = true)
    val v1 = VersionedTable.commit(Seq(3L).toDF("id"), root, overwrite = false)
    val v2 = VersionedTable.commit(Seq(9L).toDF("id"), root, overwrite = true)
    assert(ids(root, Some(v0)) == Set(1L, 2L))
    assert(ids(root, Some(v1)) == Set(1L, 2L, 3L))
    assert(ids(root, Some(v2)) == Set(9L))
    assert(ids(root) == Set(9L), "latest wins by default")
    assert(VersionedTable.latestVersion(spark, root).contains(v2))
  }

  test("cloneAt is metadata-only and snapshot-isolated from later source commits") {
    val root = java.nio.file.Files.createTempDirectory("vt_src").toString
    val cl = java.nio.file.Files.createTempDirectory("vt_clone").toString + "/t"
    VersionedTable.commit(Seq(1L, 2L).toDF("id"), root, overwrite = true)
    val v1 = VersionedTable.commit(Seq(3L).toDF("id"), root, overwrite = false)
    VersionedTable.cloneAt(spark, root, v1, cl)
    assert(ids(cl) == Set(1L, 2L, 3L))
    // metadata-only: the clone root holds NO data files, only manifests
    val dataFiles = new java.io.File(cl).listFiles()
    assert(dataFiles.map(_.getName).toSet == Set("_manifests"),
      s"clone must copy zero data: ${dataFiles.map(_.getName).toSeq}")
    // snapshot isolation: source moves on, the clone's view is frozen
    VersionedTable.commit(Seq(99L).toDF("id"), root, overwrite = true)
    assert(ids(cl) == Set(1L, 2L, 3L))
    assert(ids(root) == Set(99L))
    // the clone accepts its own commits without touching the source
    VersionedTable.commit(Seq(7L).toDF("id"), cl, overwrite = false)
    assert(ids(cl) == Set(1L, 2L, 3L, 7L))
    assert(ids(root) == Set(99L))
  }

  test("rollback restores an old version as the newest, preserving history") {
    val root = java.nio.file.Files.createTempDirectory("vt_rb").toString
    val v0 = VersionedTable.commit(Seq(1L).toDF("id"), root, overwrite = true)
    VersionedTable.commit(Seq(2L).toDF("id"), root, overwrite = true)
    val v2 = VersionedTable.rollback(spark, root, v0)
    assert(ids(root) == Set(1L))
    assert(v2 == 2L)
    // roll-forward is just another rollback
    VersionedTable.rollback(spark, root, 1L)
    assert(ids(root) == Set(2L))
  }
}
