package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (1L, 10L, ts("2026-01-01 10:30:00")), // inside w100
    (2L, 10L, ts("2026-01-01 11:00:00")), // exactly at end → excluded (half-open)
    (3L, 10L, ts("2026-01-01 10:00:00")), // exactly at start → included
    (4L, 20L, ts("2026-01-01 10:30:00")), // other key, no window
    (5L, 10L, ts("2026-01-03 00:00:00"))) // far outside
    .toDF("event_id", "k", "ts")

  private val intervals = Seq(
    (100L, 10L, ts("2026-01-01 10:00:00"), ts("2026-01-01 11:00:00")),
    (101L, 10L, ts("2026-01-01 10:45:00"), ts("2026-01-01 12:00:00"))) // overlaps w100
    .toDF("window_id", "k", "w_start", "w_end")

  test("point-in-interval semantics: half-open, multi-overlap, key-scoped") {
    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts", "w_start", "w_end")
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (3L, 100L), (2L, 101L)))
  }

  test("bucketization does not drop matches across bucket boundaries") {
    // interval spanning multiple small buckets; point in a middle bucket
    val out = RangeJoin.pointInInterval(points, intervals, "k", "ts", "w_start", "w_end",
      bucketSeconds = 60L)
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (3L, 100L), (2L, 101L)))
  }

  test("plan: equi hash join on (key, bucket), no nested-loop/cartesian") {
    val p = RangeJoin.pointInInterval(points, intervals, "k", "ts", "w_start", "w_end")
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("property: bucketized join equals the naive theta join on random interval mixes") {
    val rnd = new scala.util.Random(23)
    val base = ts("2026-03-01 00:00:00").getTime
    for (trial <- 1 to 4) {
      val pts = (1 to 300).map { i =>
        (i.toLong, (rnd.nextInt(8) + 1).toLong,
          new Timestamp(base + rnd.nextInt(500000) * 1000L))
      }
      // mixed lengths: seconds to days, some zero-length (empty by half-open)
      val ivs = (1 to 120).map { i =>
        val start = base + rnd.nextInt(500000) * 1000L
        val len = rnd.nextInt(4) match {
          case 0 => 0L
          case 1 => rnd.nextInt(120) * 1000L
          case 2 => rnd.nextInt(7200) * 1000L
          case _ => rnd.nextInt(200000) * 1000L
        }
        (i.toLong, (rnd.nextInt(8) + 1).toLong,
          new Timestamp(start), new Timestamp(start + len))
      }
      val p = pts.toDF("event_id", "k", "ts")
      val iv = ivs.toDF("window_id", "k", "w_start", "w_end")
      val naive = p.join(iv, p("k") === iv("k") &&
          p("ts") >= iv("w_start") && p("ts") < iv("w_end"))
        .select("event_id", "window_id").as[(Long, Long)].collect().toSet
      for (width <- Seq(0L, 1L, 60L, 86400L)) { // 0 = derived
        val got = RangeJoin.pointInInterval(p, iv, "k", "ts", "w_start", "w_end", width)
          .select("event_id", "window_id").as[(Long, Long)].collect().toSet
        assert(got == naive, s"trial $trial width $width diverges from theta join")
      }
    }
  }

  test("derived bucket width: median interval length, robust to skewed length mixes") {
    // 9 one-minute intervals + 1 one-day interval: mean would be ~2.4h
    // (day-length buckets, terrible point selectivity); median stays 60s
    val base = ts("2026-01-01 00:00:00").getTime
    val skewed = ((1 to 9).map { i =>
      (i.toLong, 10L, new Timestamp(base + i * 100000L),
        new Timestamp(base + i * 100000L + 60000L))
    } :+ ((10L, 10L, new Timestamp(base), new Timestamp(base + 86400000L))))
      .toDF("window_id", "k", "w_start", "w_end")
    assert(RangeJoin.medianIntervalSeconds(skewed, "w_start", "w_end") == 60L)

    // derived width produces the same rows as any explicit width
    val explicit = RangeJoin.pointInInterval(points, intervals,
        "k", "ts", "w_start", "w_end", bucketSeconds = 60L)
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    val derived = RangeJoin.pointInInterval(points, intervals,
        "k", "ts", "w_start", "w_end")
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    assert(derived == explicit)

    // empty interval side: fall back, don't NPE
    val empty = skewed.limit(0)
    assert(RangeJoin.medianIntervalSeconds(empty, "w_start", "w_end") == 3600L)
  }
}
