package graft.streaming

import graft.SparkSpec
import graft.operators.{CurrentState, MergeOps, MergeSpec}
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental current-state materialization: the streaming-side D2 path.
  *
  * The reference reconstructs "current state" at query time with a window
  * (W1) but can equally maintain it incrementally by merging each batch of
  * ledger-entry changes (SURVEY §2.9 "stateful ops"). This spec drives the
  * foreachBatch shape — per-batch collapse + tombstone merge into a running
  * snapshot — over real event data split into arrival batches, and proves
  * the invariant that makes incremental maintenance trustworthy: the
  * merged snapshot equals the W1 window over the full concatenated log,
  * regardless of batch boundaries.
  */
class IncrementalStateSpec extends SparkSpec {

  test("per-batch merge maintenance == window over the full log") {
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"),
        // model deletions: error events are tombstones for the user's state
        (col("event_type") === "error").as("deleted"))

    // three arrival batches by time
    val batches: Seq[DataFrame] = Seq(
      ev.filter(to_date(col("ts")) <= "2024-01-10"),
      ev.filter(to_date(col("ts")) > "2024-01-10" && to_date(col("ts")) <= "2024-01-20"),
      ev.filter(to_date(col("ts")) > "2024-01-20"))

    val spec = MergeSpec(Seq("user_id"), Some("deleted"))
    val empty = ev.limit(0)
    val snapshot = batches.foldLeft(empty) { (snap, batch) =>
      // collapse the batch to one row per key first (the state exports
      // guarantee this per ledger range; a time-split batch does not)
      val collapsed = CurrentState.latestByKey(batch, Seq("user_id"), Seq("ts", "event_id"))
      MergeOps.merge(snap, collapsed, spec)
    }

    val windowed = CurrentState.latestByKey(ev, Seq("user_id"), Seq("ts", "event_id"))
      .filter(!col("deleted"))

    import spark.implicits._
    val m = snapshot.select("user_id", "event_id").as[(Long, Long)].collect().toSet
    val w = windowed.select("user_id", "event_id").as[(Long, Long)].collect().toSet
    assert(m == w, s"incremental snapshot diverged: only-merge=${m -- w}, only-window=${w -- m}")
    assert(m.nonEmpty)
  }
}
