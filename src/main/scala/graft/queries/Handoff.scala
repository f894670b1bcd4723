package graft.queries

import org.apache.spark.sql.DataFrame

/** Release discipline for chain handoff persists.
  *
  * The multi-stage curation chains (q118/q127/q148/q153/q157/q159)
  * persist 3–6 stage frames each so stage k's consumers never recompute
  * stages 1..k−1 — but the frames are referenced by the LAZY DataFrame
  * the query returns, so the query builder cannot unpersist them itself
  * (unpersist before materialization would strip the cache marker and
  * defeat the handoff). Bare `.persist()` therefore pinned storage for
  * the session lifetime in any caller that wasn't the bench's
  * clearCache() loop.
  *
  * `df.handoff` registers the persisted frame here; the harness calls
  * [[releaseAll]] AFTER materializing a query (Verify after each
  * parquet dump, Bench next to each clearCache), so repeated chain runs
  * in one long-lived session never accumulate cached blocks. Releasing
  * is idempotent and safe at any point after the caller has consumed
  * the result.
  */
object Handoff {
  private val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Persist `df` and register it for the next [[releaseAll]]. */
  def persist(df: DataFrame): DataFrame = {
    val p = df.persist()
    frames.add(p)
    p
  }

  /** Unpersist every registered handoff frame (non-blocking), and
    * drain the RDD-level [[graft.operators.BlockRegistry]] (local-
    * checkpoint blocks from iterative operators — invisible to both
    * `Dataset.unpersist` and `clearCache`). */
  def releaseAll(): Unit = {
    var f = frames.poll()
    while (f != null) {
      try f.unpersist(blocking = false)
      catch { case scala.util.control.NonFatal(_) => () }
      f = frames.poll()
    }
    graft.operators.BlockRegistry.releaseAll()
  }

  /** Registered-but-unreleased count, both layers (spec introspection). */
  def outstanding: Int =
    frames.size() + graft.operators.BlockRegistry.outstanding

  implicit class HandoffOps(private val df: DataFrame) extends AnyVal {
    /** `.persist()` with release tracking — use for every chain
      * handoff frame a query returns lazily. */
    def handoff: DataFrame = Handoff.persist(df)
  }
}
