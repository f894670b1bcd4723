package graft.queries

import graft.SparkSpec

/** Round-13 unpersist audit (verdict item #7): the FULL query corpus
  * runs end to end and every query must leave zero cached blocks
  * behind once the harness's per-query release runs — the exact
  * discipline Verify and Bench apply (Handoff.releaseAll +
  * clearCache). A bare `.persist()` that bypasses Handoff/IndexStore
  * shows up here as a leaked RDD attributed to its query. */
class CacheDisciplineSpec extends SparkSpec {

  test("full corpus leaves no outstanding handoffs or persisted RDDs") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val leaks = scala.collection.mutable.ArrayBuffer.empty[String]
    names.foreach { name =>
      try graft.SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          fail(s"$name failed at $sf: ${e.getClass.getName}: ${e.getMessage}")
      }
      Handoff.releaseAll()
      assert(Handoff.outstanding == 0,
        s"releaseAll must drain the handoff registry after $name")
      spark.catalog.clearCache()
      val left = spark.sparkContext.getPersistentRDDs
      if (left.nonEmpty) {
        leaks += s"$name (${left.size} RDDs)"
        left.values.foreach(_.unpersist(false)) // isolate per-query blame
      }
    }
    assert(leaks.isEmpty,
      s"queries leaked persisted RDDs past the harness release: " +
        leaks.mkString("; "))
  }
}
