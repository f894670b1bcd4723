package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate VIEW over a [[TxLogTable]] — the
  * materialized-view story the Delta ecosystem builds on the change
  * feed, in its linear-aggregate form (the DBSP/differential-dataflow
  * observation: count and sum are group homomorphisms, so a view
  * maintains under a delta stream as `state += Σ inserts − Σ deletes`
  * without ever recomputing the base table).
  *
  * Mechanics per [[maintain]] call:
  *  1. the last APPLIED source version is read from the view table's
  *     own SetTransaction record (`iv:<source>` app id) — no side
  *     files, crash-safe by construction;
  *  2. the net row delta since then comes from ONE
  *     [[TxLogTable.changesBetween]] call (fromVersion −1 on first
  *     load = "everything is an insert"), which scans only the file
  *     symmetric difference of the two snapshots — an append-only
  *     interval costs exactly the appended files;
  *  3. signed partial aggregates of the delta merge into the prior
  *     view state with one mergeable groupBy (state size = GROUP
  *     cardinality, never corpus size), groups whose count reaches 0
  *     drop (the multiset-semantics guarantee);
  *  4. the new state publishes with [[TxLogTable.overwrite]] carrying
  *     `txn = (iv:<source>, srcVersion)` — idempotent per source
  *     version, so a crashed/replayed maintain can never double-apply
  *     a delta, and the view itself is an ACID table (time travel
  *     shows every refresh).
  *
  * Supported aggregates: `count(*)` (always, as `cnt`) and `sum` of
  * each `sumCols` column (as `sum_<col>`). Averages derive as
  * sum/cnt downstream. Min/max are NOT maintainable from deltas alone
  * (a deleted extremum needs the base table) — deliberately out of
  * scope, matching the linear-aggregate contract.
  */
object IncrementalView {

  private def appIdFor(source: String): String =
    "iv:" + source.replaceAll("[^A-Za-z0-9_:/.@=-]", "_")

  /** The source version the view at `view` has applied (−1 = never). */
  def appliedVersion(view: String, source: String): Long =
    TxLogTable.lastTransaction(view, appIdFor(source)).getOrElse(-1L)

  /** Refresh the view to the source's current head; returns the source
    * version now applied. No-op (and no commit) when already current. */
  def maintain(spark: SparkSession, source: String, view: String,
      keyCols: Seq[String], sumCols: Seq[String]): Long = {
    require(keyCols.nonEmpty, "view needs at least one group key")
    val srcHead = TxLogTable.currentVersion(source)
    require(srcHead >= 0, s"source $source is empty — nothing to maintain")
    val applied = appliedVersion(view, source)
    if (applied >= srcHead) return applied
    val delta = TxLogTable.changesBetween(spark, source, applied, srcHead)
    val sign = when(col("_change_type") === "insert", lit(1L))
      .otherwise(lit(-1L))
    val keyCs = keyCols.map(col)
    val deltaAgg = delta.groupBy(keyCs: _*)
      .agg(sum(sign).as("cnt"),
        sumCols.map(c => sum(sign * col(c)).as(s"sum_$c")): _*)
    val prior =
      if (applied < 0) None
      else Some(TxLogTable.read(spark, view))
    val merged = prior match {
      case None => deltaAgg
      case Some(p) => p.unionByName(deltaAgg)
        .groupBy(keyCs: _*)
        .agg(sum(col("cnt")).as("cnt"),
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
    }
    val next = merged.filter(col("cnt") > 0)
    TxLogTable.overwrite(spark, next, view,
      txn = Some((appIdFor(source), srcHead)))
    srcHead
  }
}
