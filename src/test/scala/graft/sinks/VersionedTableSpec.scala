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

  test("publish fence: a committer whose claim was broken cannot clobber " +
      "the recoverer's committed manifest — the second publish errors out") {
    val root = java.nio.file.Files.createTempDirectory("vt_fence").toString
    VersionedTable.commit(Seq(1L).toDF("id"), root, overwrite = true)
    // simulate the ADVICE race: writer A claims v1 then pauses past the
    // 60s grace (age the claim by back-dating its mtime); recoverer B
    // breaks the claim and commits v1; A must then FAIL its commit, not
    // silently overwrite B's manifest + txn ledger
    val mdir = new java.io.File(root, "_manifests")
    val claim = new java.io.File(mdir, ".v1.claim")
    assert(claim.createNewFile(), "A's claim")
    assert(claim.setLastModified(System.currentTimeMillis() - 120000L))
    // B: a normal commit — the stale-claim breaker lets it through
    val vB = VersionedTable.commit(Seq(2L).toDF("id"), root, overwrite = false)
    assert(vB == 1L)
    assert(ids(root) == Set(1L, 2L))
    // A wakes mid-writeManifest (post-claim, pre-publish — unreachable
    // through the public API without thread injection) and tries to
    // publish its staging file at v1: the publish primitive is an atomic
    // create-if-absent (hard link on file://), so the collision REFUSES
    // and B's manifest content — txn ledger included — stays untouched.
    // A plain rename here would have silently replaced it (the ADVICE
    // lost-update).
    val before = java.nio.file.Files.readString(
      new java.io.File(mdir, "v1.manifest").toPath)
    val tmp = new java.io.File(mdir, ".v1.manifest.tmp.stale")
    java.nio.file.Files.writeString(tmp.toPath, "#txn:ghost\nghost.parquet\n")
    intercept[java.nio.file.FileAlreadyExistsException] {
      java.nio.file.Files.createLink(
        new java.io.File(mdir, "v1.manifest").toPath, tmp.toPath)
    }
    val after = java.nio.file.Files.readString(
      new java.io.File(mdir, "v1.manifest").toPath)
    assert(after == before, "B's committed manifest must be untouched")
    assert(ids(root) == Set(1L, 2L))
  }

  test("datasetRefresh refuses a destination that resolves to a source " +
      "table root instead of deleting the source") {
    val src = java.nio.file.Files.createTempDirectory("vt_ds_guard").toString
    VersionedTable.commit(Seq(1L, 2L).toDF("id"), s"$src/t1", overwrite = true)
    // dstRoot == srcRoot with an empty suffix: the clone target IS the
    // source table — must refuse before any delete
    val err = intercept[IllegalArgumentException] {
      VersionedTable.datasetRefresh(spark, src, src, suffix = "")
    }
    assert(err.getMessage.contains("refusing to touch the source"))
    // the source survived intact
    assert(ids(s"$src/t1") == Set(1L, 2L))
    // a non-colliding suffix into the same root still works (the
    // reference's same-dataset _stg shape)
    val out = VersionedTable.datasetRefresh(spark, src, src, suffix = "_stg")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("cloned_table", "t1")))
    assert(ids(s"$src/t1_stg") == Set(1L, 2L))
    // a scheme/spelling difference cannot slip past the guard: the same
    // destination written file://-qualified still refuses
    val err2 = intercept[IllegalArgumentException] {
      VersionedTable.datasetRefresh(spark, src, s"file:$src", suffix = "")
    }
    assert(err2.getMessage.contains("refusing to touch the source"))
    assert(ids(s"$src/t1") == Set(1L, 2L))
    // ancestor hole: a table named like the dataset dir's own leaf makes
    // the clone destination the dataset dir itself (an ANCESTOR of every
    // source table) when dstRoot is the dataset's parent — refused, not
    // recursively deleted
    val wrap = java.nio.file.Files.createTempDirectory("vt_anc").toString
    VersionedTable.commit(Seq(7L).toDF("id"), s"$wrap/ds/ds", overwrite = true)
    val err3 = intercept[IllegalArgumentException] {
      VersionedTable.datasetRefresh(spark, s"$wrap/ds", wrap, suffix = "")
    }
    assert(err3.getMessage.contains("refusing to touch the source"))
    assert(ids(s"$wrap/ds/ds") == Set(7L))
  }

  test("commitBatch: a replayed txn id is a no-op, not a duplicate append") {
    val root = java.nio.file.Files.createTempDirectory("vt_txn").toString
    VersionedTable.commitBatch(Seq(1L, 2L).toDF("id"), root,
      overwrite = false, txnId = "b0")
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "b1")
    // replay both batches (crash-retry shape): same ids, same data
    VersionedTable.commitBatch(Seq(1L, 2L).toDF("id"), root,
      overwrite = false, txnId = "b0")
    VersionedTable.commitBatch(Seq(3L).toDF("id"), root,
      overwrite = false, txnId = "b1")
    assert(ids(root) == Set(1L, 2L, 3L))
    assert(VersionedTable.read(spark, root).count() == 3,
      "replays must not duplicate rows")
    // a NEW txn still commits
    VersionedTable.commitBatch(Seq(4L).toDF("id"), root,
      overwrite = false, txnId = "b2")
    assert(ids(root) == Set(1L, 2L, 3L, 4L))
    // the ledger survives a PLAIN commit in between...
    VersionedTable.commit(Seq(5L).toDF("id"), root, overwrite = false)
    VersionedTable.commitBatch(Seq(99L).toDF("id"), root,
      overwrite = false, txnId = "b1")
    assert(ids(root) == Set(1L, 2L, 3L, 4L, 5L), "replay after plain commit must no-op")
    // ...and survives vacuum: old manifests drop, replay protection stays
    VersionedTable.vacuum(spark, root, keepLast = 1)
    VersionedTable.commitBatch(Seq(99L).toDF("id"), root,
      overwrite = false, txnId = "b0")
    assert(ids(root) == Set(1L, 2L, 3L, 4L, 5L), "replay after vacuum must no-op")
  }

  test("commitBatchIf: a stale-snapshot writer fails BEFORE writing; a " +
      "replayed txn no-ops regardless of the precondition; the published " +
      "manifest carries its checksum sidecar") {
    val root = java.nio.file.Files.createTempDirectory("vt_cas").toString
    val v0 = VersionedTable.commitBatchIf(Seq(1L).toDF("id"), root,
      overwrite = false, txnId = "c0", expected = None)
    assert(v0 == 0L)
    // writer that read at "no table yet" but v0 landed since: CAS fails
    val e = intercept[RuntimeException] {
      VersionedTable.commitBatchIf(Seq(2L).toDF("id"), root,
        overwrite = false, txnId = "c1", expected = None)
    }
    assert(e.getMessage.contains("advanced"))
    assert(ids(root) == Set(1L), "failed CAS must not commit")
    // matching precondition commits
    VersionedTable.commitBatchIf(Seq(2L).toDF("id"), root,
      overwrite = false, txnId = "c1", expected = Some(0L))
    assert(ids(root) == Set(1L, 2L))
    // replay of c0 with a WRONG precondition still no-ops (already in)
    val r = VersionedTable.commitBatchIf(Seq(1L).toDF("id"), root,
      overwrite = false, txnId = "c0", expected = Some(999L))
    assert(r == 1L && ids(root) == Set(1L, 2L))
    // local-fs publish keeps the ChecksumFileSystem sidecar at the
    // final name (the hard-link path copies it before dropping the tmp)
    val mdir = new java.io.File(root, "_manifests")
    assert(new java.io.File(mdir, "v0.manifest").exists())
    assert(new java.io.File(mdir, ".v0.manifest.crc").exists(),
      s"sidecar missing: ${mdir.listFiles().map(_.getName).toSeq.sorted}")
  }

  test("vacuum drops unreferenced data files but keeps every retained version readable") {
    val root = java.nio.file.Files.createTempDirectory("vt_vac").toString
    VersionedTable.commit(Seq(1L).toDF("id"), root, overwrite = true)
    VersionedTable.commit(Seq(2L).toDF("id"), root, overwrite = true)
    val v2 = VersionedTable.commit(Seq(3L).toDF("id"), root, overwrite = false)
    def dataFileCount: Int = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      try it.filter(p => p.toString.contains("part-") && !p.toString.endsWith(".crc"))
        .count().toInt
      finally it.close()
    }
    val before = dataFileCount
    VersionedTable.vacuum(spark, root, keepLast = 2)
    assert(dataFileCount < before, "v0's orphaned file must be deleted")
    // kept versions still read
    assert(ids(root, Some(v2)) == Set(2L, 3L))
    assert(ids(root, Some(v2 - 1)) == Set(2L))
    // the dropped version's manifest is gone
    intercept[Exception] { ids(root, Some(0L)) }
  }

  test("changesBetween: file-set diff yields inserts/deletes; transient versions net out") {
    val root = java.nio.file.Files.createTempDirectory("vt_cdc").toString
    val v0 = VersionedTable.commit(Seq(1L, 2L).toDF("id"), root, overwrite = true)
    val v1 = VersionedTable.commit(Seq(3L).toDF("id"), root, overwrite = false)
    val v2 = VersionedTable.commit(Seq(9L).toDF("id"), root, overwrite = true)
    def feed(a: Long, b: Long): Map[String, Set[Long]] =
      VersionedTable.changesBetween(spark, root, a, b)
        .select("_change_type", "id").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // append-only step: pure insert feed sized by the delta
    assert(feed(v0, v1) == Map("insert" -> Set(3L)))
    // across the destructive overwrite: old files deleted, new inserted
    assert(feed(v1, v2) ==
      Map("insert" -> Set(9L), "delete" -> Set(1L, 2L, 3L)))
    // endpoint diff nets out the transient v1 file entirely
    assert(feed(v0, v2) ==
      Map("insert" -> Set(9L), "delete" -> Set(1L, 2L)))
    // identical endpoints: an EMPTY feed with the right schema
    val same = VersionedTable.changesBetween(spark, root, v2, v2)
    assert(same.count() == 0 && same.columns.contains("_change_type"))
  }

  test("history lists every version with txn ids and file counts") {
    val root = java.nio.file.Files.createTempDirectory("vt_hist").toString
    VersionedTable.commit(Seq(1L).toDF("id"), root, overwrite = true)
    VersionedTable.commitBatch(Seq(2L).toDF("id"), root,
      overwrite = false, txnId = "b7")
    val h = VersionedTable.history(spark, root)
      .select("version", "txn_id").as[(Long, Option[String])].collect().toSeq
    assert(h == Seq((0L, None), (1L, Some("b7"))))
  }

  test("optimize compacts many small commits into few clustered files, " +
      "content-identical, history intact, vacuum reclaims") {
    val root = java.nio.file.Files.createTempDirectory("vt_opt").toString
    // 6 tiny appends -> many small files
    (0 until 6).foreach { i =>
      VersionedTable.commitBatch(
        Seq((i * 10L, i % 3), (i * 10L + 1, (i + 1) % 3)).toDF("id", "seg")
          .repartition(2),
        root, overwrite = false, txnId = s"b$i")
    }
    val before = VersionedTable.read(spark, root)
      .select("id", "seg").as[(Long, Int)].collect().toSet
    val vPre = VersionedTable.latestVersion(spark, root).get
    val nFilesPre = VersionedTable.history(spark, root)
      .filter($"version" === vPre).select("n_files").head.getLong(0)

    val vOpt = VersionedTable.optimize(spark, root, targetFiles = 2,
      clusterBy = Seq("seg"))
    val after = VersionedTable.read(spark, root)
      .select("id", "seg").as[(Long, Int)].collect().toSet
    assert(after == before, "optimize must not change table content")
    val nFilesPost = VersionedTable.history(spark, root)
      .filter($"version" === vOpt).select("n_files").head.getLong(0)
    assert(nFilesPost <= 2 && nFilesPost < nFilesPre,
      s"compaction failed: $nFilesPre -> $nFilesPost files")
    // clustering: each rewritten file holds a contiguous seg range — the
    // layout min-max skipping prunes on
    val perFile = VersionedTable.read(spark, root)
      .select($"seg", org.apache.spark.sql.functions
        .input_file_name().as("f"))
      .groupBy("f").agg(countDistinct($"seg").as("n")).select("n")
      .as[Long].collect()
    assert(perFile.forall(_ <= 2), s"files span too many segs: ${perFile.toSeq}")
    // history intact: the pre-optimize version still reads its own files
    assert(VersionedTable.read(spark, root, Some(vPre))
      .select("id", "seg").as[(Long, Int)].collect().toSet == before)
    // replay protection survives: re-sending an old txn is still a no-op
    val vReplay = VersionedTable.commitBatch(Seq((999L, 9)).toDF("id", "seg"),
      root, overwrite = false, txnId = "b3")
    assert(vReplay == vOpt, "replayed txn after optimize must be a no-op")
    // vacuum to the optimized version reclaims the small files; the
    // current read is unaffected
    VersionedTable.vacuum(spark, root, keepLast = 1)
    assert(VersionedTable.read(spark, root)
      .select("id", "seg").as[(Long, Int)].collect().toSet == before)
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

  test("datasetRefresh clones every table metadata-only, skips backup " +
      "names, reports views, and a rerun replaces cleanly") {
    val src = java.nio.file.Files.createTempDirectory("vt_ds").toString
    val dst = java.nio.file.Files.createTempDirectory("vt_dsstg").toString
    VersionedTable.commit(Seq(1L, 2L).toDF("id"), s"$src/ta", overwrite = true)
    VersionedTable.commit(Seq(3L).toDF("id"), s"$src/tb", overwrite = true)
    VersionedTable.commit(Seq(9L).toDF("id"), s"$src/ta_bkp_20240101",
      overwrite = true)
    Seq(7L).toDF("id").createOrReplaceTempView("vt_ds_view")
    val out = VersionedTable.datasetRefresh(spark, src, dst,
        suffix = "_stg", views = Seq("vt_ds_view", "vt_ds_ghost"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("cloned_table", "ta"), ("cloned_table", "tb"),
      ("cloned_view", "vt_ds_view"), ("missing_view", "vt_ds_ghost")))
    assert(ids(s"$dst/ta_stg") == Set(1L, 2L))
    assert(ids(s"$dst/tb_stg") == Set(3L))
    // ZERO data bytes copied: every clone root holds only manifests, and
    // each clone's manifest lines are identical to the source's — file
    // identity, not file copies
    Seq("ta", "tb").foreach { n =>
      val files = new java.io.File(s"$dst/${n}_stg").listFiles().map(_.getName)
      assert(files.toSet == Set("_manifests"),
        s"clone $n must hold no data dirs: ${files.toSeq}")
      def manifest(p: String) = java.nio.file.Files
        .readString(java.nio.file.Paths.get(p)).trim
      assert(manifest(s"$dst/${n}_stg/_manifests/v0.manifest") ==
        manifest(s"$src/$n/_manifests/v0.manifest"))
    }
    assert(!new java.io.File(s"$dst/ta_bkp_20240101_stg").exists(),
      "backup-named tables must be excluded")
    assert(spark.table("vt_ds_view_stg").as[Long].collect().toSeq == Seq(7L))
    // CREATE OR REPLACE: a refresh after a source commit re-points
    VersionedTable.commit(Seq(5L).toDF("id"), s"$src/ta", overwrite = true)
    VersionedTable.datasetRefresh(spark, src, dst, suffix = "_stg")
    assert(ids(s"$dst/ta_stg") == Set(5L))
    // a dataset that does not exist reports missing_dataset
    val miss = VersionedTable.datasetRefresh(spark, s"$src/nope", dst)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(miss == Seq(("missing_dataset", "nope")))
  }

  test("datasetRefresh FOR SYSTEM_TIME AS OF: the cutoff picks each " +
      "table's newest version at or before it; older-only tables clone, " +
      "newer-only tables report missing") {
    val src = java.nio.file.Files.createTempDirectory("vt_dst").toString
    val dst = java.nio.file.Files.createTempDirectory("vt_dststg").toString
    def stamp(table: String, v: Long, t: Long): Unit = {
      val f = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(src), spark.sparkContext.hadoopConfiguration)
      f.setTimes(new org.apache.hadoop.fs.Path(
        s"$src/$table/_manifests/v$v.manifest"), t, -1)
    }
    val t0 = 1700000000000L
    VersionedTable.commit(Seq(1L).toDF("id"), s"$src/ta", overwrite = true)
    VersionedTable.commit(Seq(2L).toDF("id"), s"$src/ta", overwrite = true)
    stamp("ta", 0, t0); stamp("ta", 1, t0 + 7200000L) // v1 two hours later
    VersionedTable.commit(Seq(8L).toDF("id"), s"$src/tnew", overwrite = true)
    stamp("tnew", 0, t0 + 7200000L) // born after the cutoff
    val out = VersionedTable.datasetRefresh(spark, src, dst,
        suffix = "_stg", asOfMillis = Some(t0 + 3600000L))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("cloned_table", "ta"), ("missing_table", "tnew")))
    assert(ids(s"$dst/ta_stg") == Set(1L),
      "the cutoff must pick v0, not the newer v1")
  }
}
