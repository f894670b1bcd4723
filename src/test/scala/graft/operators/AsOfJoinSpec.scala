package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val quotes = Seq(
    (1L, ts("2026-01-01 10:00:00"), 100.0),
    (1L, ts("2026-01-01 10:05:00"), 101.0),
    (2L, ts("2026-01-01 10:03:00"), 200.0))
    .toDF("k", "qts", "px")

  private val trades = Seq(
    (10L, 1L, ts("2026-01-01 10:04:59")), // latest quote = 100.0
    (11L, 1L, ts("2026-01-01 10:05:00")), // equality matches → 101.0
    (12L, 2L, ts("2026-01-01 10:02:00")), // before any quote → null
    (13L, 3L, ts("2026-01-01 10:00:00"))) // unknown key → null
    .toDF("trade_id", "k", "tts")

  private def run(tol: Option[Long] = None) =
    AsOfJoin.asof(trades, quotes, "k", "tts", "qts", Seq("px"), tol)
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap

  test("asof: latest right at-or-before left; equality included; no-match null") {
    val m = run()
    assert(m(10L).contains(100.0))
    assert(m(11L).contains(101.0))
    assert(m(12L).isEmpty)
    assert(m(13L).isEmpty)
  }

  test("asof with tolerance: stale matches dropped") {
    val lateTrade = Seq((20L, 1L, ts("2026-01-01 12:00:00"))).toDF("trade_id", "k", "tts")
    val strict = AsOfJoin.asof(lateTrade, quotes, "k", "tts", "qts", Seq("px"), Some(60L))
      .select("px").as[Option[Double]].head()
    val loose = AsOfJoin.asof(lateTrade, quotes, "k", "tts", "qts", Seq("px"), Some(3600L * 3))
      .select("px").as[Option[Double]].head()
    assert(strict.isEmpty)   // quote is ~2h old, tolerance 60s
    assert(loose.contains(101.0))
  }

  test("asof plan: single key shuffle + window, no cartesian/theta join") {
    val p = AsOfJoin.asof(trades, quotes, "k", "tts", "qts", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }
}
