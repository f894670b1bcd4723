package graft.operators

/** Session-scoped registry for RDD-LEVEL persists — local-checkpoint
  * blocks an iterative operator must keep alive past its own return
  * (the lazy result DataFrame reads them) but that must release at the
  * harness boundary. The cacheManager path ([[graft.queries.Handoff]],
  * `spark.catalog.clearCache()`) cannot see these: `localCheckpoint`
  * persists the RDD directly, so without this registry every
  * [[ConnectedComponents]] call pinned its final labels blocks for the
  * session lifetime (the round-13 CacheDisciplineSpec finding).
  *
  * Contract (sharper than Handoff's): release only AFTER the consumer
  * has materialized the result — a local checkpoint's lineage is
  * truncated, so a released frame cannot recompute; a post-release
  * action fails loudly instead of silently recomputing. Verify/Bench
  * satisfy this by construction (they release after each query's
  * parquet/noop materialization). */
object BlockRegistry {
  private val rdds =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.rdd.RDD[_]]()
  private val dfs =
    new java.util.concurrent.ConcurrentLinkedQueue[org.apache.spark.sql.DataFrame]()

  /** Register a persisted RDD for the next [[releaseAll]]. */
  def track(r: org.apache.spark.rdd.RDD[_]): Unit = rdds.add(r)

  /** Register a persisted DATAFRAME for the next [[releaseAll]] — the
    * operator-side mirror of [[graft.queries.Handoff]] (which lives a
    * package up and cannot be imported here without a cycle). Used by
    * operators whose lazy result references one subtree from two
    * consumers (e.g. [[TextAnalysis.bpePackedExport]]'s token table),
    * so the subtree computes once per materialization instead of
    * twice. Unlike the RDD contract, a released frame CAN recompute —
    * release is a cache drop, not a lineage truncation. */
  def track(df: org.apache.spark.sql.DataFrame): Unit = dfs.add(df)

  /** Unpersist every registered RDD and DataFrame (non-blocking,
    * idempotent). */
  def releaseAll(): Unit = {
    var r = rdds.poll()
    while (r != null) {
      try r.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      r = rdds.poll()
    }
    var f = dfs.poll()
    while (f != null) {
      try f.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      f = dfs.poll()
    }
  }

  /** Registered-but-unreleased count, both layers (spec introspection). */
  def outstanding: Int = rdds.size() + dfs.size()
}
