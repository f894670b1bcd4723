package graft.streaming

import graft.functions.MisraGries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/** Streaming frequent-items: [[graft.functions.MisraGries]] summaries
  * maintained as keyed stream state — the streaming twin of batch q81,
  * as [[StreamingDedup]] is to the batch LSH operator.
  *
  * Each micro-batch folds a group's arriving tokens into its O(k)
  * counter state (the exact `reduce` of the batch Aggregator, so the
  * sketch guarantees carry verbatim) and emits the refreshed summary:
  * heavy hitters are continuously queryable while state stays bounded at
  * k counters + one count per group REGARDLESS of stream length — the
  * property that makes frequent-items viable over an unbounded ingest.
  * Guarantees over everything seen so far: est ≤ true ≤ est + n/k, and
  * any token with true count > n/k is in the summary.
  *
  * The group key is the shuffle key (same as the batch groupBy); use
  * with `outputMode("update")`.
  */
object StreamingSketch {

  final case class HeavySummary(key: String, n_tokens: Long,
      summary: Map[String, Long])

  def heavyHittersStream(spark: SparkSession, tokens: DataFrame,
      keyCol: String, tokenCol: String, k: Int = 64): DataFrame = {
    import spark.implicits._
    val mg = MisraGries(k)
    tokens
      // null tokens would NPE inside the Misra-Gries fold (binarySearch on
      // the summary keys); they carry no frequency information, so drop
      // them at the source rather than failing the streaming query
      .filter(col(tokenCol).isNotNull)
      .select(col(keyCol).cast("string"), col(tokenCol).cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[String], Array[Long], Long), HeavySummary](
        GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: org.apache.spark.sql.streaming.GroupState[(Array[String], Array[Long], Long)]) =>
          val (ks, cs, n0) = state.getOption
            .getOrElse((Array.empty[String], Array.empty[Long], 0L))
          var buf = (ks, cs)
          var n = n0
          rows.foreach { case (_, tok) => buf = mg.reduce(buf, tok); n += 1 }
          state.update((buf._1, buf._2, n))
          HeavySummary(key, n, mg.finish(buf))
      }
      .toDF()
  }
}
