package graft.operators

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("decayedScore: exact micro-unit halving at one half-life; nulls excluded") {
    val hl = 7 * 86400.0
    val events = Seq(
      (1L, ts("2024-03-15 00:00:00"), 10.0),            // newest: weight 1
      (1L, ts("2024-03-08 00:00:00"), 10.0),            // one half-life: 0.5
      (2L, ts("2024-03-01 00:00:00"), 8.0),             // two half-lives: 0.25
      (3L, null.asInstanceOf[Timestamp], 99.0))         // dropped
      .toDF("user_id", "ts", "value")
    val out = EventAnalytics.decayedScore(events, "user_id", "ts", "value", hl)
      .orderBy("user_id")
      .as[(Long, Long, Long)].collect().toList
    // user 1: 10e6 + 5e6; user 2: 8 * 0.25 * 1e6 = 2e6 (exact powers of
    // two — exp(-k ln2) is exact halving up to libm ulp, absorbed by the
    // micro rounding)
    assert(out == List((1L, 2L, 15000000L), (2L, 1L, 2000000L)), out.toString)

    // a NULL-value row holding the newest timestamp must not shift the
    // reference instant — scores are identical with or without it
    val poisoned = events.union(
      Seq((9L, ts("2024-03-20 00:00:00"), Double.NaN)).toDF("user_id", "ts", "value")
        .withColumn("value",
          org.apache.spark.sql.functions.lit(null).cast("double")))
    val same = EventAnalytics.decayedScore(poisoned, "user_id", "ts", "value", hl)
      .orderBy("user_id").as[(Long, Long, Long)].collect().toList
    assert(same == out, s"null-value row shifted the reference: $same vs $out")
  }

  test("funnel: strict in-order matching; out-of-order steps never count") {
    val events = Seq(
      // A completes in order
      ("A", "signup", "2024-01-01 10:00:00"),
      ("A", "click", "2024-01-02 10:00:00"),
      ("A", "purchase", "2024-01-03 10:00:00"),
      // B clicked BEFORE signing up — stalls at stage 1
      ("B", "click", "2024-01-01 09:00:00"),
      ("B", "signup", "2024-01-01 11:00:00"),
      // C skips click — the purchase after signup must NOT count
      ("C", "signup", "2024-01-01 08:00:00"),
      ("C", "purchase", "2024-01-02 08:00:00"),
      // D purchased before ever signing up
      ("D", "purchase", "2024-01-01 07:00:00"),
      ("D", "signup", "2024-01-02 07:00:00"))
      .map { case (u, e, t) => (u, e, ts(t)) }
      .toDF("user_id", "event_type", "ts")
    val out = EventAnalytics.funnel(events, "user_id", "ts", "event_type",
        Seq("signup", "click", "purchase"))
      .orderBy("stage")
      .as[(Int, String, Long)].collect().toList
    assert(out == List((1, "signup", 4L), (2, "click", 1L), (3, "purchase", 1L)),
      s"only A progresses past stage 1: $out")
  }

  test("cohortRetention: first-week cohorts, integer offsets, maxWeeks cap") {
    val events = Seq(
      (1L, "2024-01-01 12:00:00"), (1L, "2024-01-10 12:00:00"), // w0, w1
      (1L, "2024-01-03 09:00:00"),                              // w0 again (dedup)
      (2L, "2024-01-02 12:00:00"),                              // w0 only
      (3L, "2024-01-08 12:00:00"), (3L, "2024-01-22 12:00:00")) // w1, w3
      .map { case (u, t) => (u, ts(t)) }
      .toDF("user_id", "ts")
    val out = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
      .select(col("cohort_week").cast("string"), col("week_offset"), col("n_users"))
      .as[(String, Long, Long)].collect().toList
    assert(out == List(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 1L, 1L),
      ("2024-01-08", 0L, 1L), ("2024-01-08", 2L, 1L)), out.toString)

    val capped = EventAnalytics.cohortRetention(events, "user_id", "ts",
        maxWeeks = 1)
      .select("week_offset").as[Long].collect().toSet
    assert(capped == Set(0L, 1L), s"offset 2 must be capped away: $capped")

    // plan: distinct + aggregates + a user-keyed join — never a window
    val plan = EventAnalytics.cohortRetention(events, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }

  test("dailyAnomalies: closed-form z on a planted spike; degenerate types excluded") {
    // 'click': 4 quiet days of 10 and one spike of 50
    // mean = 18, var = (5*2900 - 90^2)/(5*4) = 320, std = sqrt(320)
    val quiet = (1 to 4).map(i => ("click", ts(f"2024-01-0$i 10:00:00")))
    val spike = Seq.fill(5)("2024-01-05").zipWithIndex
      .flatMap { case (d, _) => Seq.fill(10)(("click", ts(s"$d 10:00:00"))) }
    val clicks = quiet.flatMap { case (e, t) => Seq.fill(10)((e, t)) } ++ spike
    // 'flat': identical every day -> zero variance -> no rows ever
    val flat = (1 to 3).map(i => ("flat", ts(f"2024-01-0$i 10:00:00")))
    // 'once': a single observed day -> n < 2 -> excluded
    val once = Seq(("once", ts("2024-01-01 10:00:00")))
    val events = (clicks ++ flat ++ once).toDF("event_type", "ts")

    val z50 = (50.0 - 18.0) / math.sqrt(320.0 / 4.0 * 4.0 / 4.0)
    // recompute carefully: std = sqrt((n*Sxx - S^2)/(n*(n-1)))
    val stdExact = math.sqrt((5.0 * 2900.0 - 90.0 * 90.0) / (5.0 * 4.0))
    val out = EventAnalytics.dailyAnomalies(events, "event_type", "ts",
        zThreshold = 1.5)
      .as[(String, java.sql.Date, Long, Double)].collect().toList
    assert(out.map(_._1).distinct == List("click"),
      s"flat/once types must never alert: $out")
    assert(out.map(_._3) == List(50L), s"only the spike clears 1.5 sigma: $out")
    assert(math.abs(out.head._4 - (50.0 - 18.0) / stdExact) < 1e-12,
      s"${out.head._4} vs ${(50.0 - 18.0) / stdExact} (z50 sanity: $z50)")

    // threshold 0 returns every observed day of types with variance
    val all = EventAnalytics.dailyAnomalies(events, "event_type", "ts", 0.0)
    assert(all.count() == 5 && !all.queryExecution.executedPlan.toString
      .contains("Window"))
  }

  test("transitionMatrix: ordered lag counts, ts ties break on event id, row probs") {
    val events = Seq(
      // user 1: A -> B -> A -> C, with the last two sharing a timestamp
      (1L, 1L, "A", "2024-01-01 10:00:00"),
      (2L, 1L, "B", "2024-01-01 11:00:00"),
      (3L, 1L, "A", "2024-01-01 12:00:00"),
      (4L, 1L, "C", "2024-01-01 12:00:00"),
      // user 2: A -> B
      (5L, 2L, "A", "2024-01-02 09:00:00"),
      (6L, 2L, "B", "2024-01-02 10:00:00"))
      .map { case (e, u, et, t) => (e, u, et, ts(t)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = EventAnalytics.transitionMatrix(events, "user_id", "ts",
        "event_type")
      .orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2, t._3)) ==
      List(("A", "B", 2L), ("A", "C", 1L), ("B", "A", 1L)),
      s"tie at 12:00 must order id 3 before id 4 (A -> C, not C -> A): $out")
    assert(math.abs(out(0)._4 - 2.0 / 3.0) < 1e-12)
    assert(math.abs(out(1)._4 - 1.0 / 3.0) < 1e-12)
    assert(out(2)._4 == 1.0)
  }

  test("gapFillInterpolate: two-phase split ≡ whole-spine window, across chunk boundaries") {
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // observations 40 hours apart with chunkBuckets = 4: the gap spans
    // ~10 chunks, so LOCF/interp for most buckets must come from the
    // cross-chunk CARRY, not the within-chunk window; a third key has a
    // single observation (null interp after, locf carries to the end)
    val events = Seq(
      ("a", "2024-01-01 00:30:00", 10.0),
      ("a", "2024-01-02 16:15:00", 90.0), // 40 h later
      ("a", "2024-01-02 16:45:00", 110.0), // same bucket, mean = 100
      ("b", "2024-01-01 05:10:00", 7.0),
      ("b", "2024-01-01 06:20:00", 13.0),
      ("c", "2024-01-01 12:00:00", 5.0)
    ).map { case (k, t, v) => (k, ts(t), v) }.toDF("k", "t", "v")
    def run(cb: Int) =
      EventAnalytics.gapFillInterpolate(events, "k", "t", "v",
          unit = "hour", chunkBuckets = cb)
        .orderBy(col("key"), col("bucket"))
        .as[(String, java.sql.Timestamp, Long, Option[Long], Option[Long], Option[Long])]
        .collect().toList
    val tiny = run(4) // forces many cross-chunk carries
    val whole = run(1 << 20) // one chunk = the old whole-spine window
    assert(tiny == whole, s"two-phase must be exact:\n$tiny\nvs\n$whole")
    // spine covers the observed range for every key (shared bounds)
    val byKey = tiny.groupBy(_._1)
    assert(byKey("a").size == 41 && byKey("c").size == 41)
    // key a: bucket 20 of 0..40 interpolates between 10e6 and 100e6
    val aRows = byKey("a")
    assert(aRows.head._4.contains(10000000L))
    assert(aRows.last._4.contains(100000000L))
    val mid = aRows(20)
    assert(mid._4.isEmpty && mid._6.contains(55000000L),
      s"linear midpoint across chunks: $mid")
    assert(mid._5.contains(10000000L), "LOCF carries across chunks")
    // key c: single observation at bucket 12 — locf carries forward
    // only, interp null outside the observed pair
    val cRows = byKey("c")
    assert(cRows(11)._5.isEmpty && cRows(11)._6.isEmpty)
    assert(cRows(12)._4.contains(5000000L))
    assert(cRows(40)._5.contains(5000000L) && cRows(40)._6.isEmpty)
  }

  test("downsampleLargestTriangle: endpoints kept, spike kept, bucket cap, no per-point window") {
    // key 1: 100 points over ~100 minutes, flat except a huge spike at
    // point 57 — the spike's bucket MUST select the spike (largest
    // triangle against flat neighbors)
    val rows = (0 until 100).map { i =>
      (1L, i.toLong, ts(f"2024-03-01 10:${i / 60}%02d:${i % 60}%02d"),
        if (i == 57) 500.0 else 1.0 + (i % 3) * 0.01)
    } ++ Seq((2L, 200L, ts("2024-03-02 00:00:00"), 7.0)) // single-point key
    val df = rows.toDF("user_id", "event_id", "ts", "value")
    val out = EventAnalytics.downsampleLargestTriangle(
        df, "user_id", "ts", "value", "event_id", buckets = 10)
      .select("key", "bucket", "id").as[(Long, Long, Long)].collect()
    val k1 = out.filter(_._1 == 1L)
    assert(k1.length <= 10 && k1.length >= 3, s"bucket cap: ${k1.length}")
    val ids = k1.map(_._3).toSet
    assert(ids.contains(0L), "series first point must survive")
    assert(ids.contains(99L), "series last point must survive")
    assert(ids.contains(57L), s"the spike must survive downsampling: $ids")
    // one row per present bucket
    assert(k1.map(_._2).distinct.length == k1.length)
    // single-point key: exactly its one point, bucket 0
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0L, 200L)))
    // determinism
    val again = EventAnalytics.downsampleLargestTriangle(
        df, "user_id", "ts", "value", "event_id", buckets = 10)
      .select("key", "bucket", "id").as[(Long, Long, Long)].collect()
    assert(out.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
    // scale guard: no window keyed below the bucket spine — every
    // Window in the plan consumes the bucket-aggregate side (≤ buckets
    // rows per key), which holds iff no Window operator line mentions
    // the raw per-point columns (__t/__tr/__v/__id); the per-point
    // argmax is aggregate-only (the three-phase pattern)
    val planLines = EventAnalytics.downsampleLargestTriangle(
        df, "user_id", "ts", "value", "event_id", buckets = 10)
      .queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("Window ")).toSeq
    assert(planLines.nonEmpty, "expected spine windows in the plan")
    assert(planLines.forall(l => !Seq("__t#", "__tr#", "__v#", "__id#")
        .exists(l.contains)),
      s"windows must ride the bucket spine only:\n${planLines.mkString("\n")}")
  }
}
