package graft

/** The driver contract itself: every registered query must carry a DuckDB
  * oracle (a query without one silently downgrades to a rows-only check
  * at the driver — this spec makes that a build failure instead), and the
  * flagship entry must return rows on the smoke-test scale.
  */
class SparkEntrySpec extends SparkSpec {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries missing an oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"orphaned oracles: ${(o -- q).toSeq.sorted}")
  }

  test("entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
