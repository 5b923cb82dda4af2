package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** D2/D3 semantics + the merge/window equivalence property (SURVEY §5):
  * applying per-batch merges must equal the W1 latest-state window over the
  * full concatenated change log.
  */
class MergeSpecTest extends SparkSpec {

  import spark.implicits._

  private def log(rows: (String, Long, Long, Boolean, Double)*) =
    rows.toDF("account_id", "last_modified_ledger", "ledger_entry_change", "deleted", "balance")

  test("tombstone merge: delete/update/insert branches") {
    val target = log(("a", 1, 1, false, 10.0), ("b", 1, 1, false, 20.0))
    val source = log(("a", 2, 1, true, 0.0), ("b", 2, 1, false, 25.0), ("c", 2, 1, false, 30.0))
    val out = MergeOps.merge(target, source, MergeSpec(Seq("account_id"), Some("deleted")))
      .select("account_id", "balance").as[(String, Double)].collect().toMap
    assert(out == Map("b" -> 25.0, "c" -> 30.0))
  }

  test("insertUnique ignores keys already present") {
    val target = log(("a", 1, 1, false, 10.0))
    val source = log(("a", 9, 9, false, 99.0), ("b", 2, 1, false, 20.0))
    val out = MergeOps.insertUnique(target, source, Seq("account_id"))
      .select("account_id", "balance").as[(String, Double)].collect().toMap
    assert(out == Map("a" -> 10.0, "b" -> 20.0))
  }

  test("sequential merges == latest-state window over the whole log") {
    val batch1 = log(("a", 1, 1, false, 10.0), ("b", 1, 1, false, 20.0))
    val batch2 = log(("a", 2, 1, false, 11.0), ("c", 2, 1, false, 30.0))
    val batch3 = log(("b", 3, 1, true, 0.0), ("c", 3, 1, false, 31.0))
    val spec = MergeSpec(Seq("account_id"), Some("deleted"))

    val merged = Seq(batch2, batch3).foldLeft(batch1)((t, b) => MergeOps.merge(t, b, spec))

    val full = batch1.unionByName(batch2).unionByName(batch3)
    val windowed = CurrentState
      .latestByKey(full, Seq("account_id"), Seq("last_modified_ledger", "ledger_entry_change"))
      .filter(!col("deleted"))

    val m = merged.select("account_id", "balance").as[(String, Double)].collect().toSet
    val w = windowed.select("account_id", "balance").as[(String, Double)].collect().toSet
    assert(m == w, s"merge path $m != window path $w")
  }

  test("dedupInsertNewRows keeps the oldest staging row per new key") {
    val staging = log(("a", 1, 1, false, 1.0), ("a", 2, 1, false, 2.0),
      ("d", 1, 1, false, 4.0), ("d", 2, 1, false, 5.0))
    val existing = log(("a", 0, 0, false, 0.0)).select("account_id")
    val out = MergeOps.dedupInsertNewRows(staging, existing,
      Seq("account_id"), Seq("last_modified_ledger", "ledger_entry_change"))
    assert(out.select("account_id", "balance").as[(String, Double)].collect().toSeq ==
      Seq(("d", 4.0)), "existing key 'a' skipped; oldest row of 'd' kept")
  }
}
