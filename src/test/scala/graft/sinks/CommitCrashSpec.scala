package graft.sinks

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Crash-injection sweep over the versioned-table commit protocol.
  *
  * The protocol's steps are: write data files → create version claim →
  * write nonce-suffixed manifest tmp → publish (atomic no-replace of
  * the final manifest name) → delete tmp. A crash can land between any
  * two. This spec enumerates each post-crash filesystem state — built
  * by hand the way the fence spec builds the claim race — and asserts
  * the two protocol invariants for every one:
  *
  *   1. READ SAFETY: the table reads as the last PUBLISHED version —
  *      crash debris (orphan claims, staged tmps, unreferenced data
  *      files) is invisible; no state ever reads torn.
  *   2. RECOVERY: a later writer lands the next version exactly once —
  *      immediately when the debris is aged (the claim breaker), with
  *      a clean retryable error when a claim looks live, and with
  *      replay protection intact throughout.
  */
class CommitCrashSpec extends SparkSpec {

  import spark.implicits._

  private def ids(root: String, v: Option[Long] = None): Set[Long] =
    VersionedTable.read(spark, root, v).select("id").as[Long].collect().toSet

  /** Fresh table with v0 = {1, 2} committed under txn "base". */
  private def mkTable(): String = {
    val root = java.nio.file.Files.createTempDirectory("crash").toString
    VersionedTable.commitBatch(Seq(1L, 2L).toDF("id"), root,
      overwrite = false, txnId = "base")
    root
  }

  private def mdir(root: String) = new java.io.File(root, "_manifests")

  private def age(f: java.io.File): Unit =
    assert(f.setLastModified(System.currentTimeMillis() - 120000L))

  test("crash after claim, before tmp: aged claim is broken and v1 " +
      "lands; a fresh claim reads as a live committer and errors " +
      "retryably — v0 readable throughout") {
    // dead committer (aged claim)
    val root = mkTable()
    val claim = new java.io.File(mdir(root), ".v1.claim")
    assert(claim.createNewFile())
    age(claim)
    assert(ids(root) == Set(1L, 2L), "debris invisible to readers")
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "rec")
    assert(ids(root) == Set(1L, 2L, 3L), "recovery commit lands")
    // live committer (fresh claim): the recoverer must NOT break it
    val root2 = mkTable()
    assert(new java.io.File(mdir(root2), ".v1.claim").createNewFile())
    val e = intercept[RuntimeException] {
      VersionedTable.commitBatch(Seq(3L).toDF("id"), root2,
        overwrite = false, txnId = "rec")
    }
    assert(e.getMessage.contains("claimed"))
    assert(ids(root2) == Set(1L, 2L), "failed recovery mutates nothing")
  }

  test("crash after tmp write, before publish: the staged manifest is " +
      "invisible, the aged claim breaks, and recovery wins the version " +
      "the dead writer staged for") {
    val root = mkTable()
    val claim = new java.io.File(mdir(root), ".v1.claim")
    assert(claim.createNewFile())
    // the dead writer's staged tmp: a VALID manifest body under the
    // nonce-suffixed staging name — exactly what a crash between the
    // tmp write and the publish leaves behind
    val tmp = new java.io.File(mdir(root), ".v1.manifest.tmp.deadbeef")
    java.nio.file.Files.write(tmp.toPath,
      "#txn:base\n#txn:ghost\n/nonexistent/file.parquet\n".getBytes("UTF-8"))
    age(claim); age(tmp)
    assert(VersionedTable.latestVersion(spark, root).contains(0L),
      "a staged-but-unpublished manifest is NOT a version")
    assert(ids(root) == Set(1L, 2L))
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "rec")
    assert(ids(root) == Set(1L, 2L, 3L))
    // the ghost txn never published, so it must NOT replay-protect
    VersionedTable.commitBatch(Seq(4L).toDF("id"), root,
      overwrite = false, txnId = "ghost")
    assert(ids(root) == Set(1L, 2L, 3L, 4L),
      "an unpublished txn id stays committable")
  }

  test("crash after publish, before tmp cleanup: the commit IS durable, " +
      "its txn replay-protects, and the orphan tmp/claim never corrupt " +
      "later versions") {
    val root = mkTable()
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "b1")
    // recreate the post-publish debris the crash would leave: the claim
    // is ALREADY on disk (claims persist as ignored dot-files), so the
    // only extra debris is the undeleted staging tmp
    assert(new java.io.File(mdir(root), ".v1.claim").exists(),
      "the real commit leaves its claim marker")
    val tmp = new java.io.File(mdir(root), ".v1.manifest.tmp.cafebabe")
    java.nio.file.Files.write(tmp.toPath, "junk\n".getBytes("UTF-8"))
    assert(ids(root) == Set(1L, 2L, 3L), "published commit durable")
    // replay of the published txn no-ops despite the debris
    VersionedTable.commitBatch(Seq(99L).toDF("id"), root,
      overwrite = false, txnId = "b1")
    assert(ids(root) == Set(1L, 2L, 3L), "replay no-op")
    // the next version is unaffected by v1's leftover claim/tmp
    VersionedTable.commitBatch(Seq(4L).toDF("id"), root,
      overwrite = false, txnId = "b2")
    assert(ids(root) == Set(1L, 2L, 3L, 4L))
    assert(ids(root, Some(1L)) == Set(1L, 2L, 3L), "history intact")
  }

  test("crash after data files, before any manifest step: orphan data " +
      "is invisible to readers and reaped by vacuum; the retry commits " +
      "cleanly") {
    val root = mkTable()
    // the dead writer got its parquet out but never wrote a manifest
    val orphanDir = new java.io.File(s"$root/data/orphan-uuid")
    Seq(77L).toDF("id").write.parquet(orphanDir.toString)
    assert(ids(root) == Set(1L, 2L), "unreferenced data invisible")
    // the retry is a plain re-commit (new data files, new manifest)
    VersionedTable.commitBatch(Seq(77L).toDF("id"), root,
      overwrite = false, txnId = "retry")
    assert(ids(root) == Set(1L, 2L, 77L))
    // vacuum reaps the orphan files (they are referenced by NO manifest)
    val orphanParquets = orphanDir.listFiles()
      .filter(f => f.getName.endsWith(".parquet") || f.getName.contains("part-"))
    assert(orphanParquets.nonEmpty, "fixture self-check")
    VersionedTable.vacuum(spark, root, keepLast = 2)
    orphanParquets.foreach(p => assert(!p.exists(), s"vacuum must reap $p"))
    assert(ids(root) == Set(1L, 2L, 77L), "live versions untouched")
  }

  test("torn manifest (no-hardlink fallback mid-write): a complete-lines " +
      "prefix WITHOUT the terminator is rejected retryably by reads AND " +
      "by a commit reading prev — never silently acted on") {
    val root = mkTable()
    // emulate the CREATE_NEW fallback observed mid-flush: the final name
    // exists, its prefix is complete lines, the terminator not yet out
    val v0 = new java.io.File(mdir(root), "v0.manifest")
    // drop the checksum sidecar: the hand-rewrite below must exercise the
    // terminator check, not the ChecksumFileSystem mismatch
    new java.io.File(mdir(root), ".v0.manifest.crc").delete()
    val full = new String(
      java.nio.file.Files.readAllBytes(v0.toPath), "UTF-8")
    assert(full.trim.endsWith("#end"), "fixture self-check: terminator last")
    val torn = full.linesIterator.toList.dropRight(1) // drop only #end
    java.nio.file.Files.write(v0.toPath,
      (torn.mkString("\n") + "\n").getBytes("UTF-8"))
    val e1 = intercept[RuntimeException] { ids(root) }
    assert(e1.getMessage.contains("incomplete"))
    // a concurrent commit reading prev mid-write must NOT carry a
    // truncated file set forward — it errors retryably instead
    val e2 = intercept[RuntimeException] {
      VersionedTable.commitBatch(Seq(9L).toDF("id"), root,
        overwrite = false, txnId = "during-torn")
    }
    assert(e2.getMessage.contains("incomplete"))
    // the publish completing (terminator lands) makes the same reads pass
    java.nio.file.Files.write(v0.toPath, full.getBytes("UTF-8"))
    assert(ids(root) == Set(1L, 2L))
  }

  test("legacy manifest (pre-terminator format): terminator-less versions " +
      "read via SOUND evidence only — a verified checksum sidecar or a " +
      "superseding successor; mtime age alone never admits one (a " +
      "hard-crashed torn fallback write must stay a loud error forever)") {
    // checksummed legacy: terminator-less content with a VALID .crc
    // sidecar (both write paths produce the sidecar only after the full
    // content is out) — reads fine, fresh or aged
    val root = mkTable()
    val v0 = new java.io.File(mdir(root), "v0.manifest")
    val full = new String(
      java.nio.file.Files.readAllBytes(v0.toPath), "UTF-8")
    val legacy = full.linesIterator.toList.dropRight(1).mkString("\n") + "\n"
    def installLegacy(withCrc: Boolean): Unit = {
      val crc = new java.io.File(mdir(root), ".v0.manifest.crc")
      crc.delete()
      if (withCrc) {
        // write through the local ChecksumFileSystem so the sidecar
        // matches the legacy content, then move file + sidecar into place
        val lfs = org.apache.hadoop.fs.FileSystem.getLocal(
          spark.sparkContext.hadoopConfiguration)
        val fix = new org.apache.hadoop.fs.Path(mdir(root).toString, "legacy_fix")
        val out = lfs.create(fix, true)
        try out.write(legacy.getBytes("UTF-8")) finally out.close()
        java.nio.file.Files.move(
          new java.io.File(mdir(root), "legacy_fix").toPath, v0.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.move(
          new java.io.File(mdir(root), ".legacy_fix.crc").toPath, crc.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      } else
        java.nio.file.Files.write(v0.toPath, legacy.getBytes("UTF-8"))
    }
    installLegacy(withCrc = true)
    assert(ids(root) == Set(1L, 2L), "checksummed legacy manifest must read")
    age(v0)
    assert(ids(root) == Set(1L, 2L), "aged checksummed legacy must read")
    // and a commit on top of it works (prev read succeeds)
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "on-legacy")
    assert(ids(root) == Set(1L, 2L, 3L))
    // superseded legacy: v0 terminator-less, NO sidecar, fresh or aged —
    // cannot be mid-write (its successor committed on top), reads fine
    installLegacy(withCrc = false)
    assert(ids(root, Some(0L)) == Set(1L, 2L),
      "superseded legacy manifest must time-travel")
    assert(ids(root) == Set(1L, 2L, 3L))
    // neither sidecar nor successor: stays a loud retryable error EVEN
    // AGED — this is exactly the hard-crashed torn fallback write, and
    // admitting it on age would silently act on a truncated file set
    val root2 = mkTable()
    val v02 = new java.io.File(mdir(root2), "v0.manifest")
    new java.io.File(mdir(root2), ".v0.manifest.crc").delete()
    val full2 = new String(
      java.nio.file.Files.readAllBytes(v02.toPath), "UTF-8")
    java.nio.file.Files.write(v02.toPath,
      (full2.linesIterator.toList.dropRight(1).mkString("\n") + "\n")
        .getBytes("UTF-8"))
    age(v02)
    val e = intercept[RuntimeException] { ids(root2) }
    assert(e.getMessage.contains("incomplete"))
  }

  test("every crash state composes with the CAS: a stale-snapshot " +
      "writer still errors before committing, whatever debris is on disk") {
    val root = mkTable()
    // debris soup: aged claim for v1 + staged tmp + orphan data
    val claim = new java.io.File(mdir(root), ".v1.claim")
    assert(claim.createNewFile()); age(claim)
    java.nio.file.Files.write(
      new java.io.File(mdir(root), ".v1.manifest.tmp.feed").toPath,
      "junk\n".getBytes("UTF-8"))
    Seq(66L).toDF("id").write.parquet(s"$root/data/orphan-2")
    // a writer that read "empty table" commits nothing against v0
    val e = intercept[RuntimeException] {
      VersionedTable.commitBatchIf(Seq(9L).toDF("id"), root,
        overwrite = false, txnId = "stale", expected = None)
    }
    assert(e.getMessage.contains("advanced"))
    // the correctly-read writer lands v1 through the broken claim
    VersionedTable.commitBatchIf(Seq(9L).toDF("id"), root,
      overwrite = false, txnId = "fresh", expected = Some(0L))
    assert(ids(root) == Set(1L, 2L, 9L))
  }
}
