package graft.queries

import graft.{SparkEntry, SparkSpec}

/** The chain queries persist stage handoffs through [[Handoff]]; after
  * the harness releases them, NO cached blocks from the chain may
  * outlive the query — a long-lived session running chains repeatedly
  * must not accumulate storage until eviction pressure. */
class HandoffSpec extends SparkSpec {

  test("chain handoffs release: no persistent RDDs survive releaseAll") {
    // settle any leftovers from other suites sharing the session first
    Handoff.releaseAll()
    spark.catalog.clearCache()
    val baseline = spark.sparkContext.getPersistentRDDs.size
    // q153 persists 4 stage frames via .handoff
    SparkEntry.queries("q153_chain_attrition")(spark, sf).collect()
    assert(Handoff.outstanding >= 4,
      s"chain handoffs must register for release, got ${Handoff.outstanding}")
    assert(spark.sparkContext.getPersistentRDDs.size > baseline,
      "the handoffs should be persisted while the result is being consumed")
    Handoff.releaseAll()
    assert(Handoff.outstanding == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= baseline,
      s"released chain left cached blocks: " +
        s"${spark.sparkContext.getPersistentRDDs.size} > $baseline")
  }

  test("releaseAll is idempotent and safe with nothing registered") {
    Handoff.releaseAll()
    Handoff.releaseAll()
    assert(Handoff.outstanding == 0)
  }
}
