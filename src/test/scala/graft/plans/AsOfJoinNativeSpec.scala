package graft.plans

import graft.{SparkSpec, Tables}
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("native exec: semantics on known data (latest <=, ties, no-match null)") {
    val quotes = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100.0),
      (1L, ts("2026-01-01 10:05:00"), 101.0),
      (2L, ts("2026-01-01 10:03:00"), 200.0)).toDF("k", "qts", "px")
    val trades = Seq(
      (10L, 1L, ts("2026-01-01 10:04:59")),
      (11L, 1L, ts("2026-01-01 10:05:00")),
      (12L, 2L, ts("2026-01-01 10:02:00")),
      (13L, 3L, ts("2026-01-01 10:00:00"))).toDF("trade_id", "k", "tts")
    val out = AsOfJoinNative.asof(trades, quotes.withColumnRenamed("k", "k2")
        .withColumnRenamed("k2", "k"), "k", "tts", "qts")
      .select(col("trade_id"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).contains(100.0))
    assert(out(11L).contains(101.0))
    assert(out(12L).isEmpty)
    assert(out(13L).isEmpty)
  }

  test("native exec: string keys and null keys/timestamps (no NPE, null-extended)") {
    val quotes = Seq(
      (Some("aapl"), Some(ts("2026-01-01 10:00:00")), 100.0),
      (Some("aapl"), Some(ts("2026-01-01 10:05:00")), 101.0),
      (None: Option[String], Some(ts("2026-01-01 09:00:00")), 666.0), // null key: matches nothing
      (Some("msft"), None: Option[Timestamp], 777.0) // null ts: matches nothing
    ).toDF("sym", "qts", "px")
    val trades = Seq(
      (10L, Some("aapl"), Some(ts("2026-01-01 10:04:00"))),
      (11L, Some("msft"), Some(ts("2026-01-01 10:04:00"))), // only null-ts quote → no match
      (12L, None: Option[String], Some(ts("2026-01-01 10:04:00"))), // null key → null-extended
      (13L, Some("aapl"), None: Option[Timestamp]) // null ts → null-extended
    ).toDF("trade_id", "sym", "tts")
    val out = AsOfJoinNative.asof(trades, quotes
        .withColumnRenamed("sym", "sym2").withColumnRenamed("sym2", "sym"),
        "sym", "tts", "qts")
      .select(col("trade_id"), col("px"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(10L).contains(100.0))
    assert(out(11L).isEmpty)
    assert(out(12L).isEmpty)
    assert(out(13L).isEmpty)
  }

  test("native exec agrees row-for-row with the compositional as-of on events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("sts"),
        col("event_id").as("signup_event"), col("value").as("signup_value"))

    val composed = AsOfJoin.asof(purchases, signups, "user_id", "ts", "sts",
        payload = Seq("signup_event", "signup_value"))
      .select(col("event_id"), col("signup_event"), col("signup_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    val native = AsOfJoinNative.asof(purchases, signups, "user_id", "ts", "sts")
      .select(col("event_id"), col("signup_event"), col("signup_value"))
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    assert(native == composed)
    assert(native.nonEmpty)
  }

  test("native plan: AsOfJoinExec with per-partition sorts, no window/join operators") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter(col("event_type") === "purchase").select(col("event_id"), col("user_id"), col("ts"))
    val r = ev.filter(col("event_type") === "signup").select(col("user_id"), col("ts").as("sts"), col("value"))
    val df = AsOfJoinNative.asof(l, r, "user_id", "ts", "sts")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin user_id"), p.take(2000))
    assert(p.contains("Sort ["), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("Window"), p.take(2000))
  }
}
