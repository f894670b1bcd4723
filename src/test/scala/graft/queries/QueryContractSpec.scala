package graft.queries

import graft.SparkSpec

/** In-query contract assertions for queries whose oracle checks a
  * published bound rather than an engine-specific value (q38 HLL, q79
  * approx_percentile): the oracle hash-match only proves the bound column
  * computed 1 — these specs assert it from Scala too, with the failure
  * message naming the offending group.
  */
class QueryContractSpec extends SparkSpec {

  test("q79: every group's approx-percentile estimate is within the GK rank bound") {
    val rows = graft.SparkEntry.queries("q79_approx_percentiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") > 0L, s"group ${r.get(0)} has empty population")
      assert(r.getAs[Long]("within_bound") == 1L,
        s"group ${r.get(0)}: estimate outside the 1/accuracy + 1/n rank bound")
    }
  }

  test("q38: HLL estimate verified within its 5% bound for every group") {
    val rows = graft.SparkEntry.queries("q38_approx_count_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("within_5pct") == 1L,
        s"group ${r.get(0)}: HLL estimate outside 5% of exact distinct")
    }
  }
}
