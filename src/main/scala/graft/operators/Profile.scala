package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts, lexicographic
  * min/max, and the modal value — the ANALYZE-style statistics pass a
  * pipeline runs before planning joins, partitioning, or skew handling
  * over unfamiliar data (the reference ingests blind; at 100 TB you
  * profile before you plan).
  *
  * Shape: columns MELT into narrow (col_name, value) rows via one
  * explode — a single scan regardless of column count — then ONE
  * shuffle keyed by (column, value) builds the distinct-value table
  * (a hot value aggregates map-side before it travels), and every
  * statistic derives from that table by pure hash aggregation:
  * n_rows = sum(cnt), n_null = cnt of the null group, n_distinct =
  * row count (exact distinct as a by-product — no count_distinct
  * Expand), min/max over the values, and the mode as a two-phase
  * aggregate (per-column max(cnt), broadcast join back, min(value)
  * tie-break). There is NO per-column window sort, so a near-key
  * column (distinct count ~ row count) never funnels into a single
  * task. Values profile as strings so one plan serves every column
  * type; [[numericColumns]] is the typed second branch (numeric
  * min/max/mean and a bound-verified GK quantile hook) for columns
  * where string ordering lies.
  */
object Profile {

  /** Profile `cols` of `df`: one output row per column —
    * (col_name, n_rows, n_null, n_distinct, min_value, max_value,
    * top_value, top_count). `n_distinct` and min/max are over the
    * string form; the modal value breaks count ties by value asc.
    *
    * `approxDistinct = true` swaps the exact `count_distinct` for
    * `approx_count_distinct` (HLL++, default rsd) computed straight
    * off the melted stream — the 100 TB posture when the (col, value)
    * distinct table itself is too wide to materialize and callers can
    * also live without an exact mode (the mode still computes here,
    * from the same counts table as the exact path). Exact remains the
    * default and the oracle contract (q88). */
  def columns(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.value").as("value"))
    // one wide-key shuffle builds the distinct-value table (nulls kept
    // as their own group); both the stats and the mode derive from it,
    // so the exchange is planned once and reused
    val counts = melted
      .groupBy(col("col_name"), col("value")).agg(count(lit(1)).as("cnt"))
    val stats =
      if (approxDistinct)
        melted.groupBy(col("col_name")).agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
          approx_count_distinct(col("value")).as("n_distinct"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
      else
        counts.groupBy(col("col_name")).agg(
          sum(col("cnt")).as("n_rows"),
          sum(when(col("value").isNull, col("cnt")).otherwise(0L)).as("n_null"),
          // rows of the counts table with a non-null value ARE the
          // distinct values — exact distinct with no Expand
          count(col("value")).as("n_distinct"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
    // Two-phase mode: per-column max count (tiny: one row per profiled
    // column, broadcast) → equi-join keeps only the tied winners →
    // min(value) resolves the tie deterministically. Same result as a
    // (cnt desc, value asc) window without its single-task sort.
    val nn = counts.filter(col("value").isNotNull)
    val maxCnt = nn.groupBy(col("col_name")).agg(max(col("cnt")).as("cnt"))
    val top = nn.join(broadcast(maxCnt), Seq("col_name", "cnt"))
      .groupBy(col("col_name"))
      .agg(min(col("value")).as("top_value"), max(col("cnt")).as("top_count"))
    stats.join(top, Seq("col_name"), "left")
  }

  /** Typed numeric profile — the second branch of the melted scan that
    * [[columns]]' string profile can't serve: per numeric column
    * (col_name, n_rows, n_null, min_value, max_value, mean, qs,
    * within_bound) with true numeric ordering (strings put "9" > "10"),
    * an exact mean, and the GK quantile sketch of q79's
    * `approx_percentile` hooked in (`qs` = one approx value per
    * requested percentile).
    *
    * Shape: the same melt-to-narrow-rows trick — one scan for any
    * column count — and then a SINGLE hash aggregate computes every
    * moment AND the GK sketch together (both are mergeable, map-side
    * partial). `within_bound` re-ranks each sketch value against the
    * data (one broadcast join back, the q79 bound: rank error ≤
    * 1/accuracy + 1/n) so the sketch is VERIFIED, not trusted — at
    * 100 TB that check is how a profile survives skew nobody predicted.
    * Mean is emitted raw; callers wanting cross-engine hashes round it
    * (float sums differ in the last ulps across aggregation orders). */
  def numericColumns(df: DataFrame, cols: Seq[String],
      percentiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 1000): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p < 1),
      "percentiles must lie in (0, 1)")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("double").as("x"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.x").as("x"))
    val pArr = percentiles.map(p => s"${p}D").mkString("array(", ", ", ")")
    val stats = melted.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("x").isNull, 1L).otherwise(0L)).as("n_null"),
      min(col("x")).as("min_value"),
      max(col("x")).as("max_value"),
      avg(col("x")).as("mean"),
      expr(s"approx_percentile(x, $pArr, $accuracy)").as("qs"))
    // verify the sketch against the data: for percentile p and sketch
    // value v, rank(< v)/n - p and p - rank(<= v)/n must both be within
    // the GK guarantee
    val ranked = melted.join(broadcast(stats.select(col("col_name"), col("qs"))),
        Seq("col_name"))
      .groupBy(col("col_name"))
      .agg(
        count(col("x")).as("n"),
        array(percentiles.indices.map(i =>
          struct(
            sum(when(col("x") < col("qs")(i), 1L).otherwise(0L)).as("lt"),
            sum(when(col("x") <= col("qs")(i), 1L).otherwise(0L)).as("le"))): _*)
          .as("ranks"))
    val eps = lit(1.0 / accuracy) + lit(1.0) / col("n")
    val ok = percentiles.zipWithIndex.map { case (p, i) =>
      (col("ranks")(i).getField("lt") / col("n") - lit(p) <= eps) &&
        (lit(p) - col("ranks")(i).getField("le") / col("n") <= eps)
    }.reduce(_ && _)
    stats.join(
      ranked.select(col("col_name"),
        when(col("n") === 0, 1L).otherwise(when(ok, 1L).otherwise(0L))
          .as("within_bound")),
      Seq("col_name"), "left")
  }

  /** Typed temporal profile — the third branch of the melted scan, for
    * DATE/TIMESTAMP columns where both the string branch (lexicographic
    * "9" > "10" pathologies are gone but so is calendar arithmetic) and
    * the numeric branch (doubles) are the wrong shape: per column
    * (col_name, n_rows, n_null, min_value, max_value, span_days).
    * DATE columns cast to timestamp (midnight), so both temporal types
    * melt through one branch and one plan. Same scale contract as the
    * siblings: one scan for any column count, ONE mergeable hash
    * aggregate, no window — the plan shape is fixed by the column list,
    * not the data. */
  def temporalColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("timestamp").as("t"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.t").as("t"))
    melted.groupBy(col("col_name")).agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("t").isNull, 1L).otherwise(0L)).as("n_null"),
        min(col("t")).as("min_value"),
        max(col("t")).as("max_value"))
      .withColumn("span_days",
        datediff(to_date(col("max_value")), to_date(col("min_value"))).cast("long"))
  }

  /** Equi-width histogram of a numeric column: `nBuckets` buckets
    * spanning [min, max], exact per-bucket counts — the distribution
    * view the scalar profile ([[numericColumns]]) summarizes away, for
    * choosing packing capacities, length cutoffs, or skew salts by eye.
    *
    * Determinism: bounds are one 2-cell driver collect of exact column
    * extremes; the bucket index `min(nBuckets−1, floor((x−lo)/width))`
    * is a fixed double DAG on them (identical in any IEEE engine —
    * callers round the emitted bucket EDGES, which are presentation);
    * counts are exact. A zero-width column (constant) lands wholly in
    * bucket 0. Only non-empty buckets are emitted.
    *
    * Scale shape: one extremes aggregate, one scan with a shuffle-free
    * bucket projection, ONE mergeable count aggregate keyed by bucket
    * (at most nBuckets cells). Returns (bucket, lo, hi, n).
    */
  def histogram(df: DataFrame, colName: String, nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    val x = col(colName).cast("double")
    val mm = df.filter(x.isNotNull)
      .agg(min(x).as("lo"), max(x).as("hi")).head()
    if (mm.isNullAt(0))
      return df.sparkSession.emptyDataFrame
        .select(lit(0L).as("bucket"), lit(0.0).as("lo"), lit(0.0).as("hi"),
          lit(0L).as("n")).limit(0)
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    val width = (hi - lo) / nBuckets
    val bucket =
      if (width == 0.0) lit(0L)
      else least(lit((nBuckets - 1).toLong),
        floor((x - lit(lo)) / lit(width))).cast("long")
    df.filter(x.isNotNull)
      .groupBy(bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"),
        (lit(lo) + col("bucket").cast("double") * lit(width)).as("lo"),
        (lit(lo) + (col("bucket") + lit(1L)).cast("double") * lit(width)).as("hi"),
        col("n"))
  }

  /** Bivariate dependence profile: per-group Pearson correlation, sample
    * covariance, and the least-squares regression line (slope, intercept,
    * r²) of `yCol` on `xCol` — the relationship statistics a curation
    * pipeline reads before trusting one signal as a proxy for another
    * (does quality score track length? does price track quantity?).
    *
    * Cross-engine exactness: the built-in `corr`/`regr_slope` aggregates
    * sum doubles in partition order, and the `n·Sxy − Sx·Sy` form then
    * amplifies those last-ulp differences by catastrophic cancellation —
    * so the moments here are EXACT integers instead: each value is
    * fixed-pointed at 10^scale (`floor(x·f + 0.5)`, deterministic in any
    * IEEE engine), and Sx, Sy, Sxy, Sxx, Syy accumulate as
    * DECIMAL(38,0) — order-independent, overflow-checked, identical on
    * any engine. The cancellation happens IN exact arithmetic
    * (n·Sxy − Sx·Sy as a decimal), and only the final division/sqrt DAG
    * runs in doubles on bit-identical inputs. Callers wanting
    * hash-stable output across engines round the double stats (the q102
    * half-up pattern) to absorb sub-ulp decimal→double conversion
    * differences.
    *
    * Scale shape: one scan, ONE mergeable hash aggregate keyed by the
    * group columns (map-side partials — a trillion rows per group cost
    * six decimal cells each), a scalar projection after. No window, no
    * second pass, no driver data. Rows where either value is null are
    * excluded (pairwise-complete, the convention every SQL corr shares).
    *
    * Precondition: each group needs ≥ 2 pairs and nonzero variance on
    * both sides, else the stats divide by zero (NaN), matching the
    * undefined-correlation contract.
    */
  def dependence(df: DataFrame, xCol: String, yCol: String,
      groupCols: Seq[String], scale: Int = 2): DataFrame = {
    require(groupCols.nonEmpty, "dependence profile needs group columns")
    require(scale >= 0 && scale <= 6, s"fixed-point scale $scale out of [0,6]")
    val f = math.pow(10, scale)
    val dec = "decimal(38,0)"
    val gs = groupCols.map(col)
    val m = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(gs
        :+ floor(col(xCol).cast("double") * lit(f) + lit(0.5)).cast(dec).as("__x")
        :+ floor(col(yCol).cast("double") * lit(f) + lit(0.5)).cast(dec).as("__y"): _*)
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).cast(dec).as("__n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y")).as("__sy"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__y") * col("__y")).as("__syy"))
    val nD = col("__n").cast("double")
    val num = (col("__n") * col("__sxy") - col("__sx") * col("__sy")).cast("double")
    val dx = (col("__n") * col("__sxx") - col("__sx") * col("__sx")).cast("double")
    val dy = (col("__n") * col("__syy") - col("__sy") * col("__sy")).cast("double")
    val slope = num / dx
    val corrC = num / sqrt(dx * dy)
    m.select(gs ++ Seq(
      col("__n").cast("long").as("n_pairs"),
      corrC.as("corr"),
      (num / (nD * (nD - lit(1.0)) * lit(f * f))).as("covar_samp"),
      slope.as("slope"),
      ((col("__sy").cast("double") - slope * col("__sx").cast("double"))
        / (nD * lit(f))).as("intercept"),
      (corrC * corrC).as("r2")): _*)
  }
}
