package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2.B): ranking, analytic (lag/lead/
  * first/last), aggregates over ROWS and RANGE frames, top-k per group.
  *
  * Determinism discipline: every window ORDER BY ends in a unique key so
  * ranks and frames are reproducible across engines. Partition keys are
  * the natural distribution keys (nation, user) — one shuffle per window
  * spec; specs that share partitioning reuse the exchange.
  */
object Windows extends QueryModule {

  /** row_number / rank / dense_rank / ntile over suppliers per nation. */
  private val q21 = QueryDef(
    "q21_window_ranking",
    (s, d) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      Tables.supplier(s, d)
        .select(col("s_nationkey"), col("s_suppkey"),
          round(col("s_acctbal"), 2).as("bal"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("s_nationkey"), col("rn"))
    },
    Some("""
      SELECT s_nationkey, s_suppkey, round(s_acctbal, 2) AS bal,
             row_number() OVER w AS rn,
             rank() OVER w AS rk,
             dense_rank() OVER w AS drk,
             ntile(4) OVER w AS quartile
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC NULLS LAST, s_suppkey ASC)
      ORDER BY s_nationkey, rn"""))

  /** lag / lead / first_value / last_value per user ordered by time.
    * Restricted to a user slice to keep the oracle result compact. */
  private val q22 = QueryDef(
    "q22_window_lag_lead",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 2).as("v"),
          round(lag(col("value"), 1).over(w), 2).as("prev_v"),
          round(lead(col("value"), 1).over(w), 2).as("next_v"),
          first(col("event_type")).over(wFull).as("first_type"),
          last(col("event_type")).over(wFull).as("last_type"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id, round(value, 2) AS v,
             round(lag(value, 1) OVER w, 2) AS prev_v,
             round(lead(value, 1) OVER w, 2) AS next_v,
             first_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
             last_value(event_type) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
      FROM events
      WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY user_id, event_id"""))

  /** ROWS frames: running sum + moving average (3-row window). */
  private val q23 = QueryDef(
    "q23_window_rows_frame",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .filter(col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          Rnd.halfUp(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_sum"),
          Rnd.halfUp(avg(col("value")).over(w.rowsBetween(-2, 0)), 2).as("mov_avg3"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             floor(sum(value) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100.0 + 0.5) / 100.0 AS running_sum,
             floor((avg(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS mov_avg3
      FROM events
      WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
      ORDER BY user_id, event_id"""))

  /** RANGE frame over event-time seconds: 1-hour trailing window per user
    * (the time-series "sliding aggregate" shape). */
  private val q24 = QueryDef(
    "q24_window_range_frame",
    (s, d) => {
      val ev = Tables.events(s, d).filter(col("user_id") < 20)
        .withColumn("ts_sec", unix_timestamp(col("ts")))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_sec"))
        .rangeBetween(-3600, 0)
      ev.select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_1h"),
          Rnd.halfUp(sum(col("value")).over(w), 2).as("sum_1h"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""
      SELECT user_id, event_id,
             count(*) OVER w AS n_1h,
             floor(sum(value) OVER w * 100.0 + 0.5) / 100.0 AS sum_1h
      FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
      WHERE user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
      ORDER BY user_id, event_id"""))

  /** Top-k per group: 3 priciest orders per priority class. */
  private val q25 = QueryDef(
    "q25_topk_per_group",
    (s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy(col("o_orderpriority"), col("rn"))
    },
    Some("""
      SELECT o_orderpriority, rn, o_orderkey, price FROM (
        SELECT o_orderpriority, o_orderkey, round(o_totalprice, 2) AS price,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC) AS rn
        FROM orders)
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn"""))

  override val entries: Seq[QueryDef] = Seq(q21, q22, q23, q24, q25)
}
