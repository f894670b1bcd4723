package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-lake analytics over the ingested stream: the queries a product
  * team runs against the time-partitioned event tables the reference's
  * ingester produces (`ingester.go:522-548` lays the files out by event
  * time precisely so engines can ask these questions cheaply).
  * Three classics: recency-weighted value, ordered funnels, cohort
  * retention — each shaped as mergeable aggregates over (user, time)
  * rows, never a per-user window over an unbounded event history.
  */
object EventAnalytics {

  /** Exponentially time-decayed value per user:
    * `Σ value · exp(−ln2 · Δt / halfLife)` with Δt measured back from
    * the newest matching event — the "engagement score" shape where a
    * purchase last week counts ~half of one today (half-life in
    * seconds).
    *
    * Determinism: the reference instant is the exact integer micros
    * max (one bounded driver collect); each event's contribution is a
    * fixed double DAG on (value, Δt_micros) rounded to integer
    * micro-units (`floor(x·10⁶ + 0.5)`, the q117/q138 pattern) and
    * summed as longs — order-independent, engine-exact when the replay
    * interpolates the SAME decay-rate literal. Callers divide by 10⁶
    * for the score.
    *
    * Scale shape: one filtered scan, a scalar max, ONE mergeable hash
    * aggregate keyed by user (map-side partials). Returns
    * (user_id, n_events, decayed_micro [long]).
    */
  def decayedScore(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeSeconds: Double): DataFrame = {
    require(halfLifeSeconds > 0, s"half-life must be positive: $halfLifeSeconds")
    // the reference instant comes from the SAME null-filtered rows the
    // sum runs over — a null-value row holding the newest timestamp
    // must not shift every other row's decay
    val scored = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
      col(valueCol).isNotNull)
    val tmax = scored.agg(max(unix_micros(col(tsCol)))).head()
    if (tmax.isNullAt(0))
      return events.sparkSession.emptyDataFrame
        .select(lit(0L).as("user_id"), lit(0L).as("n_events"),
          lit(0L).as("decayed_micro")).limit(0)
    val t0 = tmax.getLong(0)
    // decay rate in 1/sec, one literal shared with the oracle replay
    val rate = decayRate(halfLifeSeconds)
    val dtSec = (lit(t0) - unix_micros(col(tsCol))).cast("double") / lit(1.0e6)
    val contrib = floor(col(valueCol).cast("double") * exp(lit(-rate) * dtSec)
      * lit(1.0e6) + lit(0.5)).cast("long")
    scored
      .groupBy(col(userCol).as("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(contrib).as("decayed_micro"))
  }

  /** The exact decay-rate constant (ln2 / halfLife) so oracles can
    * interpolate the bit-same literal the plan uses. */
  def decayRate(halfLifeSeconds: Double): Double =
    math.log(2.0) / halfLifeSeconds

  /** Ordered k-step funnel: per user, the first `steps.head` event, then
    * the first `steps(1)` event STRICTLY AFTER it, and so on — the
    * "signup → click → purchase, in that order" question, immune to the
    * classic unordered-funnel bug where a purchase before signup counts.
    * Returns one row per stage: (stage [1-based], event_type, n_users),
    * n_users monotonically non-increasing.
    *
    * Scale shape: one pass per stage, each a filtered scan + mergeable
    * min-aggregate keyed by user joined to the previous stage's
    * (user, ts) table — k user-keyed exchanges of narrow rows, never a
    * per-user event-history sort. At 100 TB the per-stage filter
    * (event_type pushdown to the scan) does the heavy pruning.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      index: IndexStore = IndexStore.default): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val base = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"), col(tsCol).as("t"), col(typeCol).as("et"))
    // each stage's (u, first-ts) table feeds TWO consumers — its count
    // and the next stage's gate join — so it is persisted through
    // `index`, or stage k would recompute stages 1..k-1
    var prev = Option.empty[DataFrame]
    val counts = steps.map { step =>
      val mine = base.filter(col("et") === step)
      val gated = prev match {
        case None => mine
        case Some(p) =>
          mine.join(p.select(col("u"), col("t").as("__pt")), Seq("u"))
            .filter(col("t") > col("__pt"))
      }
      val r = IndexStore.persist(
        gated.groupBy(col("u")).agg(min(col("t")).as("t")), index)
      prev = Some(r)
      r.count()
    }
    counts.zip(steps).zipWithIndex
      .map { case ((n, step), i) => (i + 1, step, n) }
      .toDF("stage", "event_type", "n_users")
  }

  /** First-order event-type transition matrix: for each user's
    * time-ordered event stream, count (previous type → next type)
    * transitions and each row's share of its predecessor's outgoing
    * edges — the Markov view of product flows (what actually follows a
    * signup?). Ordering ties on the timestamp break by `orderIdCol`, so
    * the matrix is deterministic on real logs where bursts share a
    * timestamp.
    *
    * Scale shape: ONE window per user partition (bounded by a user's
    * own history — the sessionize/as-of cost class, never a global
    * sort) for the lag, then mergeable (prev, next) count aggregates;
    * the row-probability denominator is a rollup of the count table
    * joined back on the narrow prev key. Returns
    * (prev_type, next_type, n, prob [n / out-degree of prev]).
    */
  def transitionMatrix(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, orderIdCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(orderIdCol).asc)
    val c = events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .withColumn("prev_type", lag(col(typeCol), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col(typeCol).as("next_type"))
      .agg(count(lit(1)).as("n"))
    val tot = c.groupBy(col("prev_type")).agg(sum(col("n")).as("__tot"))
    c.join(tot, Seq("prev_type"))
      .withColumn("prob",
        col("n").cast("double") / col("__tot").cast("double"))
      .select(col("prev_type"), col("next_type"), col("n"), col("prob"))
  }

  /** Ingest anomaly detection: flag (event_type, day) cells whose daily
    * event count sits ≥ `zThreshold` sample standard deviations from
    * that type's observed-day baseline — the monitor a pipeline points
    * at its own ingest tables to catch a collapsed source or a
    * duplicate-storm before it poisons downstream curation. Baseline
    * statistics are over OBSERVED days only (an absent day is a missing
    * partition, which deserves its own alert, not a zero in the mean).
    *
    * Determinism (the q133 dependence machinery): daily counts are
    * exact integers; per-type n, Σc, Σc² accumulate as DECIMAL(38,0)
    * (counts at 100 TB overflow a long when squared), the cancellation
    * n·Σc² − (Σc)² happens in exact arithmetic, and only the final
    * divide/sqrt DAG runs in doubles — the z-score is engine-exact.
    * Zero-variance types (every day identical) produce no rows rather
    * than ±∞.
    *
    * Scale shape: one scan → ONE mergeable (type, day) count aggregate;
    * the per-type moment rollup and the join back are over one-row-per-
    * day cells, not events. No window. Returns
    * (event_type, day [date], n_events, z) for |z| ≥ zThreshold.
    */
  def dailyAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      zThreshold: Double = 2.0): DataFrame = {
    require(zThreshold >= 0, s"zThreshold must be >= 0: $zThreshold")
    val dec = "decimal(38,0)"
    val daily = events.filter(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val mo = daily.groupBy(col("event_type")).agg(
      count(lit(1)).cast(dec).as("__n"),
      sum(col("n_events").cast(dec)).as("__s"),
      sum(col("n_events").cast(dec) * col("n_events").cast(dec)).as("__sxx"))
    val nD = col("__n").cast("double")
    val varNum = (col("__n") * col("__sxx") - col("__s") * col("__s"))
      .cast("double")
    val std = sqrt(varNum / (nD * (nD - lit(1.0))))
    val z = (col("n_events").cast("double") -
      col("__s").cast("double") / nD) / std
    daily.join(mo, Seq("event_type"))
      .filter(col("__n").cast("long") >= 2 && varNum > lit(0.0))
      .withColumn("z", z)
      .filter(abs(col("z")) >= lit(zThreshold))
      .select(col("event_type"), col("day"), col("n_events"), col("z"))
  }

  /** Weekly cohort retention: users are cohorted by the ISO week of
    * their FIRST event; for each cohort and week offset k, the number
    * of cohort users active in cohort-week + k. Returns
    * (cohort_week [date], week_offset, n_users), offsets 0..maxWeeks.
    *
    * Scale shape: events collapse to distinct (user, week) rows in one
    * aggregate (map-side dedup of arbitrarily chatty users), cohorts
    * are a min-rollup of that table, the offset join is user-keyed, and
    * the final count is a mergeable aggregate — no window over a user's
    * history. UTC weeks are exact 7-day multiples, so the offset is
    * integer arithmetic, not calendar guesswork.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      maxWeeks: Int = 8): DataFrame = {
    require(maxWeeks >= 0, s"maxWeeks must be >= 0: $maxWeeks")
    val uw = events.filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("u"),
        date_trunc("week", col(tsCol)).as("w"))
      .distinct()
    val cohorts = uw.groupBy(col("u")).agg(min(col("w")).as("cw"))
    uw.join(cohorts, Seq("u"))
      .withColumn("week_offset",
        ((unix_seconds(col("w")) - unix_seconds(col("cw"))) / lit(604800L))
          .cast("long"))
      .filter(col("week_offset") <= maxWeeks)
      .groupBy(to_date(col("cw")).as("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Time-bucket gap filling with LOCF and linear interpolation — the
    * `time_bucket_gapfill`/`SAMPLE BY ... FILL` operator every
    * time-series surface ships: bucket events per key, generate the
    * COMPLETE bucket spine over the observed range, and for empty
    * buckets carry the last observation forward (`locf6`) and linearly
    * interpolate between the neighboring observations (`interp6`).
    * Counts fill with 0; metric columns carry null before the first /
    * after the last observation (the Timescale contract).
    *
    * Determinism: the bucket metric is the micro-rounded mean
    * (`floor(avg·10⁶+0.5)` long, the engine's fixed-point convention);
    * interpolation computes the rational
    * `pv + (nv−pv)·(t−t_prev)/(t_next−t_prev)` from those integer
    * inputs and epoch seconds, then micro-rounds — bit-identical in any
    * engine replaying the same integers.
    *
    * Scale shape: one mergeable groupBy builds the observed buckets;
    * the spine is `sequence(lo, hi)` exploded from a one-row bounds
    * aggregate (never a driver loop); and the neighbor lookup is
    * TWO-PHASE so no window task ever sorts a key's whole spine:
    *
    *  1. the spine chunks into fixed runs of `chunkBuckets` buckets
    *     and a window per (key, chunk) finds the within-chunk
    *     previous/next observation — every task is ≤ chunkBuckets
    *     rows regardless of horizon;
    *  2. a per-(key, chunk) aggregate keeps each chunk's first/last
    *     observation — keys × (horizon / chunkBuckets) rows, metadata
    *     scale — and a window over THAT carries the cross-chunk
    *     previous/next; the join-back fills the buckets whose chunk
    *     holds no earlier/later observation.
    *
    * This is the engine's distributed-prefix pattern ([[Packing]]'s
    * two-phase sum) applied to LOCF: a multi-year minute-grain spine
    * (~2.6M buckets/key) costs ~320 bounded window tasks per key plus
    * one metadata-scale pass, not one 2.6M-row sort. Returns
    * (key, bucket, n, m6, locf6, interp6).
    */
  def gapFillInterpolate(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, unit: String = "hour",
      index: IndexStore = IndexStore.default,
      chunkBuckets: Int = 8192): DataFrame = {
    require(Set("minute", "hour", "day", "week")(unit),
      s"unsupported bucket unit $unit")
    require(chunkBuckets > 0, s"chunkBuckets must be positive: $chunkBuckets")
    // ONE pass over the event volume: the bucket aggregate collapses it
    // to keys × observed-buckets rows and persists via `index`; the key
    // dimension and the spine bounds both derive from that tiny table
    // (date_trunc is monotone, so min/max bucket == trunc(min/max ts)),
    // never from a second event scan
    val b = IndexStore.persist(events
      .groupBy(col(keyCol).as("key"), date_trunc(unit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("__sv"))
      .withColumn("m6",
        floor(col("__sv") / col("n") * lit(1.0e6) + lit(0.5)).cast("long"))
      .drop("__sv"), index)
    val keys = b.select(col("key")).distinct()
    val spine = b
      .agg(min(col("bucket")).as("lo"), max(col("bucket")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr(s"interval 1 $unit"))).as("bucket"))
      .join(broadcast(keys)) // tiny dimension rides the spine rows
    val stepSec = unit match {
      case "minute" => 60L
      case "hour" => 3600L
      case "day" => 86400L
      case "week" => 604800L
    }
    val filled = spine.join(b, Seq("key", "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      // fixed-length chunk id: any contiguous grouping is CORRECT (the
      // cross-chunk carry below handles neighbors over the boundary);
      // fixed epochs-based runs just keep every chunk ≤ chunkBuckets
      .withColumn("__c", floor(unix_timestamp(col("bucket")) /
        lit(stepSec * chunkBuckets)).cast("long"))
    val W = org.apache.spark.sql.expressions.Window
    // phase 1 — within-chunk neighbors: tasks bounded by chunkBuckets
    val wc = W.partitionBy(col("key"), col("__c")).orderBy(col("bucket"))
    val local = filled
      .withColumn("__pv0", last(col("m6"), ignoreNulls = true)
        .over(wc.rowsBetween(Long.MinValue, 0)))
      .withColumn("__pt0", last(when(col("m6").isNotNull, col("bucket")),
        ignoreNulls = true).over(wc.rowsBetween(Long.MinValue, 0)))
      .withColumn("__nv0", first(col("m6"), ignoreNulls = true)
        .over(wc.rowsBetween(0, Long.MaxValue)))
      .withColumn("__nt0", first(when(col("m6").isNotNull, col("bucket")),
        ignoreNulls = true).over(wc.rowsBetween(0, Long.MaxValue)))
    // phase 2 — per-chunk first/last observation (keys × chunks rows,
    // metadata scale), then the cross-chunk carry over that summary
    val summary = filled.groupBy(col("key"), col("__c"))
      .agg(
        max(when(col("m6").isNotNull, struct(col("bucket"), col("m6"))))
          .as("__lastObs"),
        min(when(col("m6").isNotNull, struct(col("bucket"), col("m6"))))
          .as("__firstObs"))
    val ws = W.partitionBy(col("key")).orderBy(col("__c"))
    val carry = summary
      .withColumn("__cp", last(col("__lastObs"), ignoreNulls = true)
        .over(ws.rowsBetween(Long.MinValue, -1)))
      .withColumn("__cn", first(col("__firstObs"), ignoreNulls = true)
        .over(ws.rowsBetween(1, Long.MaxValue)))
      .select(col("key"), col("__c"), col("__cp"), col("__cn"))
    local.join(carry, Seq("key", "__c"))
      .withColumn("__pv", coalesce(col("__pv0"), col("__cp").getField("m6")))
      .withColumn("__pt", coalesce(col("__pt0"), col("__cp").getField("bucket")))
      .withColumn("__nv", coalesce(col("__nv0"), col("__cn").getField("m6")))
      .withColumn("__nt", coalesce(col("__nt0"), col("__cn").getField("bucket")))
      .withColumn("locf6", col("__pv"))
      .withColumn("interp6",
        when(col("m6").isNotNull, col("m6")).otherwise(
          when(col("__pv").isNotNull && col("__nv").isNotNull,
            floor(col("__pv") +
              (col("__nv") - col("__pv")).cast("double") *
                (unix_timestamp(col("bucket")) - unix_timestamp(col("__pt"))) /
                (unix_timestamp(col("__nt")) - unix_timestamp(col("__pt"))) +
              lit(0.5)).cast("long"))))
      .select(col("key"), col("bucket"), col("n"), col("m6"),
        col("locf6"), col("interp6"))
  }

  /** Time-series DOWNSAMPLING by largest-triangle bucket selection —
    * the LTTB family (Steinarsson, "Downsampling Time Series for
    * Visual Representation", 2013) in a PARALLEL variant: classic LTTB
    * anchors each bucket's triangle on the point SELECTED in the
    * previous bucket, an inherently serial per-key scan; here the
    * anchors are the CENTROIDS of everything before / after the
    * bucket, so every bucket's selection is independent. The first and
    * last present buckets keep the series' first/last point (LTTB's
    * endpoint rule).
    *
    * Determinism contract (cross-engine exact): values quantize to
    * micro-units via floor(v·10⁶+0.5) (the oracle-safe rounding);
    * times are integer micros REBASED to the key's min; bucket
    * assignment and centroids are integer truncating division (both
    * engines truncate toward zero); the triangle-area comparison is
    * the exact integer cross product carried in DECIMAL(38,0) — no
    * floating point reaches any comparison. Ties break
    * (area desc, t asc, id asc). Bounds: span·buckets, per-key sums of
    * rebased micros, and (span × value-range-micros) must fit int64 /
    * 38 digits respectively — hundreds of key-years at the defaults.
    *
    * Scale shape: NO per-point window — each class's selection is ONE
    * mergeable struct-max aggregate (rank tuple leads the struct, a
    * unique (−t, −id) suffix makes the payload inert), so a hot key
    * costs partial-aggregate cells, never one sorted task; the only
    * windows ride the per-key BUCKET SPINE (≤ `buckets` rows, the
    * gapFill bound). Returns one row per (key, present bucket):
    * (key, bucket, id, ts, value). */
  def downsampleLargestTriangle(events: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, idCol: String,
      buckets: Int = 64,
      index: IndexStore = IndexStore.default): DataFrame = {
    require(buckets >= 3 && buckets <= 100000,
      s"buckets must be in [3, 100000], got $buckets")
    val W = org.apache.spark.sql.expressions.Window
    val pts0 = events.filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull && col(idCol).isNotNull)
      .select(col(keyCol).as("__k"), col(idCol).cast("long").as("__id"),
        unix_micros(col(tsCol)).as("__t"),
        floor(col(valueCol).cast("double") * lit(1e6) + lit(0.5))
          .cast("long").as("__v"),
        col(tsCol).as("__ts"), col(valueCol).as("__value"))
    val rng = pts0.groupBy(col("__k"))
      .agg(min(col("__t")).as("__t0"), max(col("__t")).as("__t1"))
    // materialized once via `index` (session-temp parquet by default):
    // the per-point frame feeds the bucket aggregate AND nine
    // aggregate/join consumers across the three selection phases —
    // without it every pick phase re-derives points from the raw scan
    val pts = IndexStore.persist(pts0.join(rng, Seq("__k"))
      .withColumn("__tr", col("__t") - col("__t0"))
      .withColumn("__b", least(lit(buckets - 1).cast("long"),
        expr(s"(__tr * ${buckets}L) div (__t1 - __t0 + 1L)")))
      .drop("__t0", "__t1"), index)
    // per-(key, present-bucket) sums, then prefix/suffix centroid sums
    // over the bucket spine; a middle bucket always has a non-empty
    // prefix AND suffix (the min/max-t points pin the end buckets)
    val baggs = pts.groupBy(col("__k"), col("__b"))
      .agg(sum(col("__tr")).as("__st"), sum(col("__v")).as("__sv"),
        count(lit(1)).as("__n"))
    val ws = W.partitionBy(col("__k")).orderBy(col("__b"))
    val wk = W.partitionBy(col("__k"))
    val anchors = baggs
      .withColumn("__Tp", sum(col("__st")).over(ws.rowsBetween(Long.MinValue, -1)))
      .withColumn("__Vp", sum(col("__sv")).over(ws.rowsBetween(Long.MinValue, -1)))
      .withColumn("__np", sum(col("__n")).over(ws.rowsBetween(Long.MinValue, -1)))
      .withColumn("__Tn", sum(col("__st")).over(ws.rowsBetween(1, Long.MaxValue)))
      .withColumn("__Vn", sum(col("__sv")).over(ws.rowsBetween(1, Long.MaxValue)))
      .withColumn("__nn", sum(col("__n")).over(ws.rowsBetween(1, Long.MaxValue)))
      .withColumn("__bmin", min(col("__b")).over(wk))
      .withColumn("__bmax", max(col("__b")).over(wk))
      .select(col("__k"), col("__b"), col("__Tp"), col("__Vp"), col("__np"),
        col("__Tn"), col("__Vn"), col("__nn"), col("__bmin"), col("__bmax"))
    val tagged = pts.join(anchors, Seq("__k", "__b"))
    // selection is ONE mergeable aggregate per class: max of a struct
    // whose leading fields are the rank tuple (struct comparison is
    // lexicographic; (−t, −id) is unique per row, so the payload
    // fields after it never decide a comparison). Never a per-point
    // window, never a join — a hot bucket folds into partial-agg cells.
    def pick(df: DataFrame, r1: Column, r2: Column, r3: Column): DataFrame =
      df.groupBy(col("__k"), col("__b"))
        .agg(max(struct(r1.as("r1"), r2.as("r2"), r3.as("r3"),
          col("__id").as("id"), col("__ts").as("ts"),
          col("__value").as("value"))).as("__sel"))
        .select(col("__k"), col("__b"), col("__sel.id").as("__id"),
          col("__sel.ts").as("__ts"), col("__sel.value").as("__value"))
    // firsts: min (t, id) == max (−t, −id); lasts: max t then min id
    val firsts = pick(tagged.filter(col("__b") === col("__bmin")),
      -col("__t"), -col("__id"), lit(0L))
    val lasts = pick(tagged.filter(col("__b") === col("__bmax") &&
      col("__bmax") =!= col("__bmin")),
      col("__t"), -col("__id"), lit(0L))
    val mids = pick(
      tagged.filter(col("__b") =!= col("__bmin") && col("__b") =!= col("__bmax"))
        .withColumn("__xA", expr("__Tp div __np"))
        .withColumn("__yA", expr("__Vp div __np"))
        .withColumn("__xC", expr("__Tn div __nn"))
        .withColumn("__yC", expr("__Vn div __nn"))
        .withColumn("__area", abs(
          (col("__xA") - col("__xC")).cast("decimal(19,0)") *
            (col("__v") - col("__yA")).cast("decimal(19,0)") -
          (col("__xA") - col("__tr")).cast("decimal(19,0)") *
            (col("__yC") - col("__yA")).cast("decimal(19,0)"))),
      col("__area"), -col("__t"), -col("__id"))
    firsts.unionByName(lasts).unionByName(mids)
      .select(col("__k").as("key"), col("__b").as("bucket"),
        col("__id").as("id"), col("__ts").as("ts"), col("__value").as("value"))
  }
}
