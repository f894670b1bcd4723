package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.{AsOfJoin, EventAnalytics, Skew}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time-series + skew operators beyond the reference's surface: as-of
  * join (oracle: DuckDB's native ASOF JOIN — an independent
  * implementation of the same semantics) and salted aggregation (oracle:
  * the plain GROUP BY it must exactly equal). */
object TimeSeriesQueries extends QueryModule {

  /** Point-in-time join: each purchase matched to the user's latest
    * signup at-or-before the purchase timestamp. */
  private val q72 = QueryDef(
    "q72_asof_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"),
          col("event_id").as("signup_event"), col("value").as("signup_value"))
      AsOfJoin.asof(purchases, signups, "user_id",
          leftTs = "ts", rightTs = "signup_ts",
          payload = Seq("signup_event", "signup_value"))
        .select(col("event_id"), col("user_id"),
          date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
          col("signup_event"), col("signup_value"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      signups AS (
        SELECT user_id, ts AS signup_ts, event_id AS signup_event, value AS signup_value
        FROM events WHERE event_type = 'signup')
      SELECT p.event_id, p.user_id,
             strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             s.signup_event, s.signup_value
      FROM purchases p
      ASOF LEFT JOIN signups s
        ON p.user_id = s.user_id AND p.ts >= s.signup_ts
      ORDER BY p.event_id"""))

  /** Salted two-phase aggregation over a deliberately skewed key (10% of
    * users collapse onto key 0) — must exactly equal the plain GROUP BY. */
  private val q73 = QueryDef(
    "q73_salted_agg",
    (s, d) => {
      val skewed = Tables.events(s, d)
        .withColumn("skew_key",
          when(col("user_id") % 10 === 0, lit(0L)).otherwise(col("user_id")))
      Skew.saltedCountSum(skewed, "skew_key", "value", salt = 16)
        .select(col("skew_key"), col("n"), Rnd.halfUp(col("total"), 2).as("total"))
        .orderBy(col("skew_key"))
    },
    Some("""
      SELECT CASE WHEN user_id % 10 = 0 THEN 0 ELSE user_id END AS skew_key,
             count(*) AS n, floor(sum(value) * 100.0 + 0.5) / 100.0 AS total
      FROM events
      GROUP BY 1
      ORDER BY skew_key"""))

  /** Bucketized interval join: purchases matched to the 1-hour promo
    * window opened by each signup of the same user. Oracle is the naive
    * theta join — same rows, different plan shape. */
  private val q74 = QueryDef(
    "q74_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val windows = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("event_id").as("window_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      // bucketSeconds = 0: width derived from the data (median interval
      // length) so the fan-out stays near one bucket per interval at
      // every scale — the fixed 3600 was the round-7 superlinear knob
      graft.operators.RangeJoin.pointInInterval(
          purchases, windows, "user_id", "ts", "w_start", "w_end",
          bucketSeconds = 0L)
        .select(col("event_id"), col("user_id"), col("window_id"))
        .orderBy(col("event_id"), col("window_id"))
    },
    Some("""
      WITH purchases AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      windows AS (
        SELECT user_id, event_id AS window_id, ts AS w_start,
               ts + INTERVAL 1 HOUR AS w_end
        FROM events WHERE event_type = 'signup')
      SELECT p.event_id, p.user_id, w.window_id
      FROM purchases p JOIN windows w
        ON p.user_id = w.user_id AND p.ts >= w.w_start AND p.ts < w.w_end
      ORDER BY p.event_id, w.window_id"""))

  /** Batch sessionization (gaps-and-islands): 30-minute inactivity gap
    * splits sessions; per-session event count and duration. */
  private val q75 = QueryDef(
    "q75_sessionize",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
        .withColumn("session_idx", sum(col("new_sess")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          (max(unix_timestamp(col("ts"))) - min(unix_timestamp(col("ts")))).as("duration_sec"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    Some("""
      WITH g AS (
        SELECT user_id, event_id, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        FROM events),
      f AS (
        SELECT user_id, event_id, ts,
               CASE WHEN prev_ts IS NULL
                      OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                    THEN 1 ELSE 0 END AS new_sess
        FROM g),
      sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
        FROM f)
      SELECT user_id, session_idx, count(*) AS n_events,
             max(CAST(floor(epoch(ts)) AS BIGINT)) - min(CAST(floor(epoch(ts)) AS BIGINT)) AS duration_sec
      FROM sess
      GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  /** Exact interpolated percentiles + fixed-width histogram.
    *
    * Scale note: exact `percentile` sorts each group in memory — right
    * for the oracle (DuckDB quantile_cont must match bit-for-bit) and
    * fine at per-group cardinalities that fit an executor. At 100 TB
    * swap `percentile` → `approx_percentile(value, p, accuracy)`
    * (t-digest-backed, mergeable, bounded state); the histogram branch
    * is already a plain two-level aggregation and needs no change. */
  private val q76 = QueryDef(
    "q76_percentiles_histogram",
    (s, d) => {
      val ev = Tables.events(s, d)
      val pct = ev.groupBy(col("event_type"))
        .agg(
          Rnd.halfUp(expr("percentile(value, 0.5)"), 4).as("p50"),
          Rnd.halfUp(expr("percentile(value, 0.9)"), 4).as("p90"),
          Rnd.halfUp(expr("percentile(value, 0.99)"), 4).as("p99"))
      val hist = ev.groupBy(col("event_type"),
          floor(col("value") / 100).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_bins"), max(col("n")).as("max_bin_n"))
      pct.join(hist, Seq("event_type"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH pct AS (
        SELECT event_type,
               floor(quantile_cont(value, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50,
               floor(quantile_cont(value, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90,
               floor(quantile_cont(value, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99
        FROM events GROUP BY event_type),
      hist AS (
        SELECT event_type, count(*) AS n_bins, max(n) AS max_bin_n FROM (
          SELECT event_type, CAST(floor(value / 100) AS BIGINT) AS bin, count(*) AS n
          FROM events GROUP BY 1, 2)
        GROUP BY event_type)
      SELECT pct.event_type, p50, p90, p99, n_bins, max_bin_n
      FROM pct JOIN hist USING (event_type)
      ORDER BY event_type"""))

  /** q76's 100 TB twin: `approx_percentile` (Greenwald–Khanna summaries —
    * mergeable, bounded state per group, no in-memory group sort). The
    * estimate is engine-specific, so like q38 the oracle contract is the
    * published BOUND, verified inside the query: for each percentile p the
    * estimate's rank interval [#(value < est), #(value <= est)] / n must
    * come within `1/accuracy + 1/n` of p (GK guarantees rank error <=
    * n/accuracy; the 1/n term absorbs rank discreteness). Spark emits
    * `within_bound = 1` iff all three percentiles satisfy it; DuckDB emits
    * the group key, n, and a constant 1 — an out-of-bound estimate
    * hash-mismatches. The estimate's rank is computed with one broadcast
    * join of the tiny per-group estimate row back onto events (plans:
    * agg -> broadcast join -> agg; no window, no sort). */
  private val q79 = QueryDef(
    "q79_approx_percentiles",
    (s, d) => {
      val acc = 1000
      val ev = Tables.events(s, d)
      val ap = ev.groupBy(col("event_type"))
        .agg(expr(s"approx_percentile(value, array(0.5D, 0.9D, 0.99D), $acc)").as("ap"))
      def ltEq(p: Int, op: (Column, Column) => Column): Column =
        sum(when(op(col("value"), col("ap")(p)), 1L).otherwise(0L))
      val ranked = ev.join(broadcast(ap), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(
          // non-null count: approx_percentile and the rank sums both ignore
          // NULL value, so the ratio population must exclude NULLs too
          count(col("value")).as("n"),
          ltEq(0, _ < _).as("lt50"), ltEq(0, _ <= _).as("le50"),
          ltEq(1, _ < _).as("lt90"), ltEq(1, _ <= _).as("le90"),
          ltEq(2, _ < _).as("lt99"), ltEq(2, _ <= _).as("le99"))
      val eps = lit(1.0d / acc) + lit(1.0d) / col("n")
      def ok(lt: String, le: String, p: Double): Column =
        (col(lt) / col("n") - lit(p) <= eps) && (lit(p) - col(le) / col("n") <= eps)
      ranked.select(
          col("event_type"), col("n"),
          when(ok("lt50", "le50", 0.5) && ok("lt90", "le90", 0.9) && ok("lt99", "le99", 0.99), 1L)
            .otherwise(0L).as("within_bound"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type, count(value) AS n, CAST(1 AS BIGINT) AS within_bound
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  /** Recency-weighted purchase value per user
    * ([[EventAnalytics.decayedScore]]): half-life 7 days back from the
    * newest purchase, per-event contributions fixed-pointed to integer
    * micro-units and summed as longs (order-independent); the oracle
    * interpolates the SAME decay-rate literal the plan compiled in. */
  private val q139 = QueryDef(
    "q139_decayed_engagement",
    (s, d) => {
      EventAnalytics.decayedScore(
          Tables.events(s, d).filter(col("event_type") === "purchase"),
          "user_id", "ts", "value", halfLifeSeconds = 7 * 86400.0)
        .orderBy(col("user_id"))
    },
    Some(s"""
      WITH f AS (
        SELECT user_id, ts, value FROM events
        WHERE event_type = 'purchase' AND user_id IS NOT NULL
          AND ts IS NOT NULL AND value IS NOT NULL),
      t0 AS (SELECT max(epoch_us(ts)) AS t0 FROM f),
      c AS (
        SELECT user_id,
               CAST(floor(value * exp(${-EventAnalytics.decayRate(7 * 86400.0)}
                 * (CAST(t0.t0 - epoch_us(ts) AS DOUBLE) / 1000000.0))
                 * 1000000.0 + 0.5) AS BIGINT) AS u
        FROM f, t0)
      SELECT user_id, count(*) AS n_events,
             CAST(sum(u) AS BIGINT) AS decayed_micro
      FROM c GROUP BY user_id
      ORDER BY user_id"""))

  /** Ordered 3-step funnel ([[EventAnalytics.funnel]]):
    * signup → click → purchase, each step strictly after the previous
    * one for the same user — per-stage user counts, monotone by
    * construction. */
  private val q140 = QueryDef(
    "q140_ordered_funnel",
    (s, d) => {
      EventAnalytics.funnel(Tables.events(s, d), "user_id", "ts",
          "event_type", Seq("signup", "click", "purchase"))
        .orderBy(col("stage"))
    },
    Some("""
      WITH b AS (
        SELECT user_id AS u, ts AS t, event_type AS et FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      s1 AS (SELECT u, min(t) AS t FROM b WHERE et = 'signup' GROUP BY u),
      s2 AS (
        SELECT b.u, min(b.t) AS t FROM b JOIN s1 ON s1.u = b.u
        WHERE b.et = 'click' AND b.t > s1.t GROUP BY b.u),
      s3 AS (
        SELECT b.u, min(b.t) AS t FROM b JOIN s2 ON s2.u = b.u
        WHERE b.et = 'purchase' AND b.t > s2.t GROUP BY b.u)
      SELECT * FROM (VALUES
        (1, 'signup', (SELECT count(*) FROM s1)),
        (2, 'click', (SELECT count(*) FROM s2)),
        (3, 'purchase', (SELECT count(*) FROM s3)))
        AS t(stage, event_type, n_users)
      ORDER BY stage"""))

  /** Weekly cohort retention ([[EventAnalytics.cohortRetention]]):
    * first-event-week cohorts, active-user counts at integer week
    * offsets (UTC weeks are exact 7-day multiples — the offset is
    * arithmetic, not calendar logic). */
  private val q141 = QueryDef(
    "q141_cohort_retention",
    (s, d) => {
      EventAnalytics.cohortRetention(Tables.events(s, d), "user_id", "ts",
          maxWeeks = 8)
        .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
          col("week_offset"), col("n_users"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH uw AS (
        SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
      c AS (SELECT u, min(w) AS cw FROM uw GROUP BY u)
      SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
             CAST((epoch_us(w) - epoch_us(cw)) / 604800000000.0 AS BIGINT)
               AS week_offset,
             count(*) AS n_users
      FROM uw JOIN c USING (u)
      WHERE CAST((epoch_us(w) - epoch_us(cw)) / 604800000000.0 AS BIGINT) <= 8
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** Ingest anomaly monitor ([[EventAnalytics.dailyAnomalies]]):
    * (event_type, day) cells ≥ 1.5σ from the type's observed-day
    * baseline, moments exact in DECIMAL/HUGEINT so the z-scores are
    * engine-identical (the q133 pattern applied to the pipeline's own
    * ingest tables). */
  private val q142 = QueryDef(
    "q142_ingest_anomalies",
    (s, d) => {
      EventAnalytics.dailyAnomalies(Tables.events(s, d), "event_type", "ts",
          zThreshold = 1.5)
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("n_events"), Rnd.halfUp(col("z"), 6).as("z6"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""
      WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
        FROM events
        WHERE event_type IS NOT NULL AND ts IS NOT NULL
        GROUP BY event_type, CAST(ts AS DATE)),
      mo AS (
        SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
               sum(CAST(n_events AS HUGEINT)) AS s,
               sum(CAST(n_events AS HUGEINT) * CAST(n_events AS HUGEINT)) AS sxx
        FROM daily GROUP BY event_type),
      j AS (
        SELECT d.event_type, d.day, d.n_events,
               CAST(mo.n AS DOUBLE) AS nd,
               CAST(mo.s AS DOUBLE) AS sd,
               CAST(mo.n * mo.sxx - mo.s * mo.s AS DOUBLE) AS varnum
        FROM daily d JOIN mo USING (event_type)
        WHERE CAST(mo.n AS BIGINT) >= 2
          AND CAST(mo.n * mo.sxx - mo.s * mo.s AS DOUBLE) > 0.0),
      zz AS (
        SELECT event_type, day, n_events,
               (CAST(n_events AS DOUBLE) - sd / nd)
                 / sqrt(varnum / (nd * (nd - 1.0))) AS z
        FROM j)
      SELECT event_type, strftime(day, '%Y-%m-%d') AS day, n_events,
             floor(z * 1000000.0 + 0.5) / 1000000.0 AS z6
      FROM zz
      WHERE abs(z) >= 1.5
      ORDER BY event_type, day"""))

  /** First-order event-transition matrix
    * ([[EventAnalytics.transitionMatrix]]): per-user time-ordered lag,
    * exact (prev → next) counts, and each edge's share of its
    * predecessor's out-degree; timestamp ties break on event_id so
    * bursts replay identically. */
  private val q151 = QueryDef(
    "q151_event_transitions",
    (s, d) => {
      EventAnalytics.transitionMatrix(Tables.events(s, d),
          "user_id", "ts", "event_type")
        .select(col("prev_type"), col("next_type"), col("n"),
          Rnd.halfUp(col("prob"), 6).as("prob6"))
        .orderBy(col("prev_type"), col("next_type"))
    },
    Some("""
      WITH o AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY ts ASC, event_id ASC) AS prev_type
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND event_type IS NOT NULL),
      c AS (
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM o WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type),
      t AS (
        SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot
        FROM c GROUP BY prev_type)
      SELECT c.prev_type, c.next_type, c.n,
             floor((CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS prob6
      FROM c JOIN t USING (prev_type)
      ORDER BY c.prev_type, c.next_type"""))

  /** Time-bucket gap filling with LOCF + linear interpolation
    * ([[EventAnalytics.gapFillInterpolate]]) — the
    * `time_bucket_gapfill` / `SAMPLE BY ... FILL` surface: a sparse
    * event slice (≈5% of purchase/error rows) bucketed hourly, the
    * full hourly spine generated over the observed range, counts
    * filled with 0, the micro-rounded bucket mean carried forward
    * (`locf6`) and linearly interpolated (`interp6`) across the gaps.
    * The oracle replays the identical spine, neighbor windows, and
    * integer-input interpolation rational. */
  private val q160 = QueryDef(
    "q160_gapfill_interpolate",
    (s, d) => {
      val sub = Tables.events(s, d)
        .filter(col("event_type").isin("error", "purchase") &&
          col("user_id") % 19 === 0)
      EventAnalytics.gapFillInterpolate(sub, "event_type", "ts", "value")
        .select(col("key").as("event_type"),
          date_format(col("bucket"), "yyyy-MM-dd HH:mm:ss").as("bucket_s"),
          col("n"), col("m6"), col("locf6"), col("interp6"))
        .orderBy(col("event_type"), col("bucket_s"))
    },
    Some("""
      WITH sub AS (
        SELECT event_type, ts, value FROM events
        WHERE event_type IN ('error', 'purchase') AND user_id % 19 = 0),
      b AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS n,
               CAST(floor(sum(value) / count(*) * 1000000.0 + 0.5) AS BIGINT) AS m6
        FROM sub GROUP BY 1, 2),
      bounds AS (
        SELECT date_trunc('hour', min(ts)) AS lo,
               date_trunc('hour', max(ts)) AS hi FROM sub),
      spine AS (
        -- keys derive from the OBSERVED data (the operator's contract:
        -- a type with zero surviving rows gets no spine), not a literal
        SELECT t.event_type, g.bucket
        FROM (SELECT DISTINCT event_type FROM sub) t,
             (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds) g),
      f AS (
        SELECT s.event_type, s.bucket, COALESCE(b.n, 0) AS n, b.m6
        FROM spine s LEFT JOIN b USING (event_type, bucket)),
      w AS (
        SELECT *,
          last_value(m6 IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN m6 IS NOT NULL THEN bucket END IGNORE NULLS)
            OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
          first_value(m6 IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN m6 IS NOT NULL THEN bucket END IGNORE NULLS)
            OVER (PARTITION BY event_type
            ORDER BY bucket ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM f)
      SELECT event_type,
             strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_s, n, m6,
             pv AS locf6,
             CASE WHEN m6 IS NOT NULL THEN m6
                  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                    CAST(floor(pv + (nv - pv) *
                      (epoch(bucket) - epoch(pt)) / (epoch(nt) - epoch(pt))
                      + 0.5) AS BIGINT)
                  ELSE NULL END AS interp6
      FROM w
      ORDER BY event_type, bucket_s"""))

  /** LTTB-family downsampling ([[EventAnalytics
    * .downsampleLargestTriangle]]): each user's event series reduced to
    * ≤ 12 visually-representative points — endpoints kept, middle
    * buckets keep the point forming the largest triangle with the
    * prefix/suffix centroids (the parallel-variant anchors). The whole
    * selection is exact integer arithmetic (micro-unit values, rebased
    * integer micros, truncating-division centroids, DECIMAL cross
    * product), so the oracle replays it bit-exactly — including every
    * area tie — with DuckDB HUGEINT products and `//` division. */
  private val q168 = QueryDef(
    "q168_lttb_downsample",
    (s, d) => EventAnalytics.downsampleLargestTriangle(
        Tables.events(s, d), "user_id", "ts", "value", "event_id",
        buckets = 12)
      .orderBy(col("key"), col("bucket")),
    Some("""
      WITH p0 AS (
        SELECT user_id AS k, event_id AS id, epoch_us(ts) AS t,
               CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
               ts, value
        FROM events
        WHERE user_id IS NOT NULL AND ts IS NOT NULL
          AND value IS NOT NULL AND event_id IS NOT NULL),
      rng AS (SELECT k, min(t) AS t0, max(t) AS t1 FROM p0 GROUP BY k),
      p AS (
        SELECT p0.k, p0.id, p0.t, p0.v, p0.ts, p0.value, p0.t - rng.t0 AS tr,
               least(CAST(11 AS BIGINT),
                     ((p0.t - rng.t0) * 12) // (rng.t1 - rng.t0 + 1)) AS b
        FROM p0 JOIN rng USING (k)),
      ba AS (
        SELECT k, b, CAST(SUM(tr) AS BIGINT) AS st,
               CAST(SUM(v) AS BIGINT) AS sv, count(*) AS n
        FROM p GROUP BY k, b),
      an AS (
        SELECT k, b,
          CAST(SUM(st) OVER wp AS BIGINT) AS tp,
          CAST(SUM(sv) OVER wp AS BIGINT) AS vp,
          CAST(SUM(n) OVER wp AS BIGINT) AS np,
          CAST(SUM(st) OVER wn AS BIGINT) AS tn,
          CAST(SUM(sv) OVER wn AS BIGINT) AS vn,
          CAST(SUM(n) OVER wn AS BIGINT) AS nn,
          MIN(b) OVER (PARTITION BY k) AS bmin,
          MAX(b) OVER (PARTITION BY k) AS bmax
        FROM ba
        WINDOW wp AS (PARTITION BY k ORDER BY b
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               wn AS (PARTITION BY k ORDER BY b
                      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      tt AS (
        SELECT p.*, an.tp, an.vp, an.np, an.tn, an.vn, an.nn,
               an.bmin, an.bmax
        FROM p JOIN an USING (k, b)),
      selfirst AS (
        SELECT k, b, id, ts, value FROM (
          SELECT *, row_number() OVER (PARTITION BY k, b
                      ORDER BY t ASC, id ASC) AS rn
          FROM tt WHERE b = bmin) WHERE rn = 1),
      sellast AS (
        SELECT k, b, id, ts, value FROM (
          SELECT *, row_number() OVER (PARTITION BY k, b
                      ORDER BY t DESC, id ASC) AS rn
          FROM tt WHERE b = bmax AND bmax <> bmin) WHERE rn = 1),
      mid AS (
        SELECT *,
          abs(CAST((tp // np) - (tn // nn) AS HUGEINT)
                * CAST(v - (vp // np) AS HUGEINT)
              - CAST((tp // np) - tr AS HUGEINT)
                * CAST((vn // nn) - (vp // np) AS HUGEINT)) AS area
        FROM tt WHERE b <> bmin AND b <> bmax),
      selmid AS (
        SELECT k, b, id, ts, value FROM (
          SELECT *, row_number() OVER (PARTITION BY k, b
                      ORDER BY area DESC, t ASC, id ASC) AS rn
          FROM mid) WHERE rn = 1)
      SELECT k AS key, b AS bucket, id, ts, value FROM (
        SELECT * FROM selfirst
        UNION ALL SELECT * FROM sellast
        UNION ALL SELECT * FROM selmid)
      ORDER BY key, bucket"""))

  override val entries: Seq[QueryDef] =
    Seq(q72, q73, q74, q75, q76, q79, q139, q140, q141, q142, q151, q160,
      q168)
}
