package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics for the round-4 audit-mart and DSIR additions. The DuckDB
  * gate pins exact values at sf0.01/sf0.1; these specs pin the properties
  * that make the operators RIGHT: the wide audit coalesce is one
  * aggregation pass whose flags agree with its measures, and DSIR
  * importance actually upweights the target domain.
  */
class AuditDsirSpec extends SparkSpec {

  test("s9_audit_wide: flags agree with measures, one row per job") {
    val df = graft.SparkEntry.queries("s9_audit_wide")(spark, sfDir).cache()
    try {
      val n = df.count()
      assert(n > 0)
      assert(df.select(col("job_id")).distinct().count() == n,
        "exactly one wide row per job")
      // runtime_ms comes exclusively from purchase legs, so it is non-null
      // exactly when the job saw a data-read (purchase) event
      assert(df.filter(col("has_data_read") =!= col("runtime_ms").isNotNull)
        .count() == 0)
      // avg_slots is defined exactly on jobs with a non-zero runtime
      assert(df.filter(col("avg_slots").isNotNull &&
        (col("runtime_ms").isNull || col("runtime_ms") === 0)).count() == 0)
      // cost scales with billed bytes: 1 GiB at $5/TiB = 5/1024 USD
      val bad = df.filter(
        abs(col("est_cost_usd") - col("billed_gb") * lit(5.0 / 1024.0)) >
          lit(1e-9)).count()
      assert(bad == 0, "cost must be the billed-terabyte rate")
    } finally { df.unpersist(); () }
  }

  test("t_dsir_sample: importance upweights the target domain and the " +
      "sampled set is deterministic") {
    val df = graft.SparkEntry.queries("t_dsir_sample")(spark, sfDir).cache()
    try {
      val byDomain = df.groupBy(col("source") === "src0")
        .agg(avg(col("importance")).as("imp")).collect()
        .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
      assert(byDomain(true) > byDomain(false),
        s"target-domain docs must score higher on average: $byDomain")
      // acceptance is a pure function of (doc_id, importance): re-running
      // the query yields the SAME sampled set, not just the same size
      val again = graft.SparkEntry.queries("t_dsir_sample")(spark, sfDir)
      assert(df.filter(col("kept")).select("doc_id")
        .exceptAll(again.filter(col("kept")).select("doc_id")).count() == 0)
      // the filter is selective but not degenerate
      val kept = df.filter(col("kept")).count()
      assert(kept > 0 && kept < df.count())
    } finally { df.unpersist(); () }
  }
}
