package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deterministic sampling for training-data pipelines: Bernoulli
  * subsampling, train/val/test splits, and per-source mixture weighting,
  * all driven by one 60-bit hash coordinate per row.
  *
  * Why hash-based instead of `df.sample()`: at 100 TB a sample must be
  *  - REPRODUCIBLE: membership is a pure function of (salt, id) — the
  *    same rows are selected on every run, any cluster size, any
  *    partitioning, any engine (the md5 coordinate replays in SQL — q83
  *    hash-verifies per-row membership against DuckDB);
  *  - SHUFFLE-FREE: a filter/projection, so it composes with column
  *    pruning and predicate pushdown and costs one map pass;
  *  - CONSISTENT ACROSS TABLES: sampling two tables by the same key and
  *    salt keeps them join-compatible (the classic "sample the users,
  *    not the events" problem);
  *  - STRATIFIABLE: per-stratum rates (deduplication-aware source
  *    weighting à la training-mixture recipes) are a literal when-chain
  *    over a bounded config map — no join, nothing broadcast — or,
  *    past [[Sampling.BranchCutoff]] strata, a broadcast-joined
  *    (stratum, threshold) lookup (a thousand-branch CASE tree is the
  *    wrong plan; a broadcast hash probe is not).
  *
  * Rows are kept when `h60(salt|id) < rate·2^60`; thresholds are
  * computed once, driver-side, as long literals, so the per-row test is
  * a single integer compare with no floating-point row-side arithmetic.
  *
  * The reference has no sampling (rtdl ingests everything); extension
  * surface per the LLM-pipeline mandate.
  */
object Sampling {

  private val Two60: Long = 1L << 60

  /** Above this many groups, per-group literal when-chains become a
    * broadcast-joined (group, threshold) lookup. A CASE tree with
    * thousands of branches at best falls out of whole-stage codegen and
    * at worst blows up analysis, while a broadcast hash join against a
    * metadata-scale lookup costs one hashed probe per row — same
    * thresholds, same rows kept, same determinism. Below the cutoff the
    * literal chain wins (no build side, constant-folded), so it stays
    * the default for the metadata-scale group counts these operators
    * document. */
  val BranchCutoff = 64

  /** Per-group integer threshold as (augmented df, threshold column,
    * temp cols to drop): a literal when-chain at or below `cutoff`
    * groups, a broadcast-joined lookup above. `keyType` is the lookup
    * key's Spark type (pass the group column's own type when entries
    * came from the data; StringType when they come from a caller map
    * keyed by strings — matching the `=== lit(key)` cast semantics of
    * the chain). Rows whose group misses the lookup get `defaultThr`
    * (left join + coalesce ≡ the chain's otherwise-branch). */
  private def groupThreshold(df: DataFrame, groupCol: String,
      entries: Seq[(Any, Long)], defaultThr: Long,
      keyType: org.apache.spark.sql.types.DataType,
      cutoff: Int): (DataFrame, Column, Seq[String]) =
    if (entries.size <= cutoff) {
      val chain = entries.sortBy(_._1.toString)
        .foldLeft(lit(defaultThr): Column) { case (els, (g, t)) =>
          when(col(groupCol) === lit(g), lit(t)).otherwise(els)
        }
      (df, chain, Nil)
    } else {
      import scala.jdk.CollectionConverters._
      import org.apache.spark.sql.types.{LongType, StructField, StructType}
      import org.apache.spark.sql.Row
      val lookup = df.sparkSession.createDataFrame(
        entries.map { case (g, t) => Row(g, t) }.asJava,
        StructType(Seq(StructField("__g", keyType), StructField("__thr", LongType))))
      val joined = df.join(broadcast(lookup), col(groupCol) === col("__g"), "left")
      (joined, coalesce(col("__thr"), lit(defaultThr)), Seq("__g", "__thr"))
    }

  /** The row's sampling coordinate: uniform in [0, 2^60). Distinct
    * `salt`s give independent coordinates (split vs subsample decisions
    * must not correlate). */
  def coord(id: Column, salt: String): Column =
    TextFunctions.h60(concat_ws("|", lit(salt), id.cast("string")))

  /** `rate·2^60` as the integer keep-threshold (rate 1.0 keeps all). */
  def threshold(rate: Double): Long = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) Two60 else (rate * Two60.toDouble).toLong
  }

  /** Deterministic Bernoulli sample at `rate`. */
  def sample(df: DataFrame, idCol: String, rate: Double,
      salt: String = "graft"): DataFrame =
    df.filter(coord(col(idCol), salt) < lit(threshold(rate)))

  /** Deterministic split assignment (train/val/test and the like): adds
    * `asCol` with the first name whose cumulative fraction bucket holds
    * the row's coordinate. `fractions` must sum to 1 (±1e-9); every row
    * gets exactly one split, rows never migrate between splits when
    * OTHER fractions change only downstream of their bucket. */
  def split(df: DataFrame, idCol: String, fractions: Seq[(String, Double)],
      salt: String = "graft", asCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "at least one split required")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val c = coord(col(idCol), salt)
    // cumulative thresholds, left fold in declaration order — the oracle
    // must accumulate in the same order for bit-identical boundaries
    val cuts = fractions.scanLeft(0.0)(_ + _._2).tail.map(threshold)
    val assigned = fractions.zip(cuts).dropRight(1)
      .foldRight(lit(fractions.last._1): Column) { case ((nameCut, cut), els) =>
        when(c < lit(cut), lit(nameCut._1)).otherwise(els)
      }
    df.withColumn(asCol, assigned)
  }

  /** Exact-n deterministic stratified sample: the `n` rows with the
    * smallest coordinates per stratum (ties broken by id), selected
    * WITHOUT sorting any stratum in a single task.
    *
    * The naive shape — `row_number() over (partition by stratum order by
    * coord)` — puts a whole stratum in one task: for strata like
    * language at 100 TB that is a billion-row sort on one core (the
    * q88-mode-window class of scale bug). Instead, oversample-verify-
    * escalate:
    *   1. count rows per stratum (one hash aggregate — map-side partial);
    *   2. keep rows with `coord < oversample·n/cnt · 2^60` — a pure
    *      filter that leaves ~oversample·n CANDIDATES per stratum;
    *   3. rank only the candidates (window over ≤ O(n) rows per stratum
    *      — bounded by the parameter, not the corpus) and keep rank ≤ n;
    *   4. verify: a stratum with ≥ n rows total must yield ≥ n selected;
    *      if the uniform-hash tail bound ever fails (probability ~e^-n
    *      at oversample 4), double the oversample and repeat. The loop
    *      is driver-side over per-stratum counts (bounded metadata, like
    *      the IVF codebook) and terminates at rate 1.
    * Selection is identical to the naive shape — the filter only removes
    * rows that could never rank ≤ n — so an engine replaying the plain
    * window (the oracle) agrees row-for-row.
    *
    * Rows with a NULL stratum are dropped up front: null is not a
    * stratum (`=== null` never matches, so a null "stratum" could never
    * fill its quota and would escalate forever); callers who want nulls
    * sampled should coalesce them to a sentinel first.
    */
  def stratified(df: DataFrame, idCol: String, strataCol: String, n: Int,
      salt: String = "graft-strat", oversample: Double = 4.0,
      branchCutoff: Int = BranchCutoff): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(oversample > 1.0, s"oversample must exceed 1, got $oversample")
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(col(strataCol).isNotNull)
    val c = coord(col(idCol), salt)
    val counts = rows.groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap // bounded: one row per stratum
    var over = oversample
    var result: DataFrame = null
    var done = counts.isEmpty
    if (done) result = rows.limit(0)
    while (!done) {
      // termination witness: once every stratum's threshold saturates at
      // 1.0 the filter is the identity and the ranked selection IS the
      // naive window — the verify step cannot fail, so the loop ends
      val saturated = counts.values.forall(cnt => over * n / cnt.toDouble >= 1.0)
      val entries = counts.toSeq.map { case (s, cnt) =>
        (s, threshold(math.min(1.0, over * n / cnt.toDouble))) }
      val (withThr, thr, tmpCols) = groupThreshold(rows, strataCol, entries,
        0L, df.schema(strataCol).dataType, branchCutoff)
      val candidates = withThr.filter(c < thr).drop(tmpCols: _*)
      val ranked = candidates.withColumn("__rk",
        row_number().over(Window.partitionBy(col(strataCol))
          .orderBy(c.asc, col(idCol).asc)))
      result = ranked.filter(col("__rk") <= n).drop("__rk")
      val got = result.groupBy(col(strataCol)).agg(count(lit(1)).as("__got"))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      done = saturated || counts.forall { case (s, cnt) =>
        got.getOrElse(s, 0L) >= math.min(cnt, n.toLong) }
      if (!done) over = over * 2
    }
    result
  }

  /** Deterministic global shuffle order for training export: assign every
    * row its position in the hash-shuffled ordering of the corpus —
    * `shuffle_pos` = rank by (coordinate, id). Training pipelines read
    * the export in this order; because it is a pure function of
    * (salt, id), the order is identical on every run, cluster size, or
    * engine, and resumable mid-epoch (position p is always the same row).
    *
    * The global rank avoids the single-partition `row_number()` window
    * the same way [[Packing.assign]] avoids it for prefix sums: the top
    * bits of the 60-bit coordinate range-bucket the rows (the coordinate
    * is uniform, so buckets are balanced BY CONSTRUCTION — no sampling
    * step needed), per-bucket counts prefix-sum over a metadata-scale
    * window, offsets broadcast back, and each bucket ranks its own rows
    * in parallel. One shuffle of narrow rows; no task sees more than one
    * bucket.
    */
  def shuffleOrder(df: DataFrame, idCol: String, salt: String = "graft-shuf",
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val width = Two60 / buckets
    val c = coord(col(idCol), salt)
    val bucketed = df.withColumn("__h", c)
      .withColumn("__bkt", expr(s"__h div ${width}L")) // integer div: exact at 2^60
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    bucketed
      .join(broadcast(offsets), Seq("__bkt"))
      .withColumn("shuffle_pos", col("__off") - lit(1L) +
        row_number().over(Window.partitionBy(col("__bkt"))
          .orderBy(col("__h").asc, col(idCol).asc)))
      .drop("__h", "__bkt", "__off")
  }

  /** Shard assignment for training export: rows in deterministic
    * shuffle order ([[shuffleOrder]]), cut into `nShards` contiguous,
    * balanced shards — `shard = pos·nShards div N`, sizes differing by
    * at most one. The shard id is what a writer partitions on
    * (`partitionBy("shard")` / `repartitionByRange`), giving N equal
    * training files whose contents and order are a pure function of
    * (salt, ids) — re-runnable and resumable. N rides a broadcast 1-row
    * aggregate; the assignment itself is integer arithmetic on the
    * already-computed position (replayable in any engine).
    */
  def exportShards(df: DataFrame, idCol: String, nShards: Int,
      salt: String = "graft-shuf", buckets: Int = 1024): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val ordered = shuffleOrder(df, idCol, salt, buckets)
    val n = ordered.agg(count(lit(1)).as("__n"))
    ordered.crossJoin(broadcast(n))
      .withColumn("shard",
        expr(s"CAST(shuffle_pos * ${nShards}L div __n AS INT)"))
      .drop("__n")
  }

  /** [[exportShards]] WITHIN each group: every group gets its own
    * deterministic shuffle order and its own `nShards` contiguous,
    * balanced shards — the curriculum-export shape (stage training on
    * quality/difficulty bands: band → shard → file, each band's shards
    * independently re-runnable and resumable). `groupCol` must be
    * metadata-scale (bands, languages — the [[temperature]] contract):
    * the offset table is groups × `buckets` rows and broadcasts.
    *
    * Scale shape: same as [[shuffleOrder]] with (group, bucket) offset
    * keys — the prefix-sum window runs over ≤ `buckets` rows PER GROUP
    * (metadata), the per-row rank window over one (group, bucket) slice
    * (~n_g/buckets rows), never a whole group in one task. Per-group
    * sizes ride a broadcast G-row aggregate. */
  def exportShardsPerGroup(df: DataFrame, idCol: String, groupCol: String,
      nShards: Int, salt: String = "graft-shuf",
      buckets: Int = 1024): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      s"buckets must be a power of two, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val width = Two60 / buckets
    val c = coord(col(idCol), salt)
    // internal null-safe join key: the offset/size joins are equality
    // joins, and a null groupCol would match nothing — rows silently
    // vanishing from an EXPORT. The (isNull, value) struct has no null
    // fields, so null-group rows shard as their own group (groupBy
    // already counted them as one) and no sentinel can collide with a
    // real group value.
    val gk = struct(col(groupCol).isNull.as("n"),
      coalesce(col(groupCol).cast("string"), lit("")).as("v"))
    val bucketed = df.withColumn("__h", c)
      .withColumn("__bkt", expr(s"__h div ${width}L"))
      .withColumn("__gk", gk)
    val offsets = bucketed.groupBy(col("__gk"), col("__bkt"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum(col("__n")).over(Window.partitionBy(col("__gk"))
          .orderBy(col("__bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__gk"), col("__bkt"), col("__off"))
    val ng = bucketed.groupBy(col("__gk")).agg(count(lit(1)).as("__ng"))
    bucketed
      .join(broadcast(offsets), Seq("__gk", "__bkt"))
      .join(broadcast(ng), Seq("__gk"))
      .withColumn("shuffle_pos", col("__off") - lit(1L) +
        row_number().over(Window.partitionBy(col("__gk"), col("__bkt"))
          .orderBy(col("__h").asc, col(idCol).asc)))
      .withColumn("shard", expr(s"CAST(shuffle_pos * ${nShards}L div __ng AS INT)"))
      .drop("__h", "__bkt", "__off", "__ng", "__gk")
  }

  /** Weighted sampling WITHOUT replacement, derandomized — the A-ES
    * exponential race (Efraimidis & Spirakis, IPL 2006): every row gets
    * key = −ln(u)/w with u its md5-uniform coordinate in (0, 1], and
    * the k SMALLEST keys win — provably equivalent to drawing k rows
    * one by one with probability ∝ weight, without replacement. The
    * [[sample]]/[[temperature]] family draws Bernoulli at per-group
    * rates (expected sizes); this is the exact-k, per-row-weight
    * member the family was missing (importance-weighted eval sets,
    * size-proportional spot checks).
    *
    * Determinism discipline: u = (coord+1)/2^60 (never 0), key rounded
    * half-up-6 before the compare, ties to the smaller id — every row's
    * fate replays in any engine. Rows with weight ≤ 0 or null are
    * EXCLUDED (they have no draw probability).
    *
    * Scale shape: one shuffle-free projection, then
    * TakeOrderedAndProject — per-partition top-k + a k-row driver
    * merge, never a global sort. */
  /** The A-ES race key for one row: −ln(u)/w rounded half-up-6, u the
    * row's md5-uniform coordinate in (0, 1]. Shared by the global
    * [[weightedSample]] and per-group compositions (rank the SAME key
    * inside each group for an exact-k per-group weighted draw). */
  def wrsKey(id: Column, weight: Column,
      salt: String = "graft-wrs"): Column = {
    val u = (coord(id, salt) + lit(1L)).cast("double") /
      lit(1.152921504606846976e18) // 2^60
    floor(-log(u) / weight.cast("double") * lit(1000000.0) + lit(0.5)) /
      lit(1000000.0)
  }

  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: String = "graft-wrs"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("key6", wrsKey(col(idCol), col(weightCol), salt))
      .orderBy(col("key6").asc, col(idCol).asc)
      .limit(k)
  }

  /** Deterministic weighted source interleave — the blended-dataset
    * schedule (how mixture weights become an actual READ ORDER for
    * training): weights are RATIONAL slot counts per period
    * (en 4 : zh 2 : es 2 : de 1 : fr 1 ⇒ 4 of every 10 consecutive
    * docs are en), each source's documents take their deterministic
    * per-source shuffle order, and document k of source s lands at
    *
    *   global_pos = (k div c_s)·D + offset_s(k mod c_s)
    *
    * where D = Σ slots and offset_s is s's slot pattern inside one
    * D-slot period. The pattern comes from EXACT integer virtual time —
    * slot j of source s at (j+1)·(L/c_s), L = lcm of the counts, ranked
    * with ties to the lexicographically smaller source — so there are
    * no float comparisons anywhere and the schedule replays in any
    * engine. global_pos is UNIQUE (within a source, distinct k; across
    * sources, period slots are disjoint); consuming in global_pos order
    * yields every window of D documents at the mixture's proportions
    * until a source exhausts, after which its slots simply skip (the
    * trainer reads the next available index, or loops the source for
    * multi-epoch blends). Rows whose source has no slot entry are
    * EXCLUDED (no weight ⇒ no schedule position).
    *
    * Scale shape: per-source rank rides the [[exportShardsPerGroup]]
    * machinery (windows over metadata-scale slices only), then
    * global_pos is a pure integer projection with the D-int pattern as
    * plan literals. Returns df's columns + (shuffle_pos, global_pos). */
  def interleave(df: DataFrame, idCol: String, sourceCol: String,
      slots: Map[String, Int], salt: String = "graft-shuf",
      buckets: Int = 1024): DataFrame = {
    require(slots.nonEmpty && slots.values.forall(_ > 0),
      "every source needs a positive slot count")
    val period = slots.values.sum.toLong
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmAll = slots.values.map(_.toLong).reduce((a, b) => a / gcd(a, b) * b)
    // one period's slot positions per source, by exact integer virtual
    // time (the deficit-round-robin order)
    val pattern: Map[String, IndexedSeq[Long]] = slots.toSeq
      .flatMap { case (s, c) =>
        (1 to c).map(j => (j.toLong * (lcmAll / c), s, j - 1)) }
      .sortBy { case (vt, s, _) => (vt, s) }
      .zipWithIndex
      .groupBy { case ((_, s, _), _) => s }
      .view.mapValues(_.sortBy { case ((_, _, j), _) => j }
        .map { case (_, pos) => pos.toLong }.toIndexedSeq)
      .toMap
    val ranked = exportShardsPerGroup(
      df.filter(col(sourceCol).isin(slots.keys.toSeq: _*)),
      idCol, sourceCol, nShards = 1, salt, buckets).drop("shard")
    val globalPos = slots.keys.toSeq.sorted
      .foldLeft(lit(null).cast("long"): Column) { (els, s) =>
        val c = slots(s)
        val offs = array(pattern(s).map(lit(_)): _*)
        when(col(sourceCol) === lit(s),
          expr(s"shuffle_pos div ${c}L") * lit(period) +
            element_at(offs, (col("shuffle_pos") % lit(c.toLong)).cast("int") + lit(1)))
          .otherwise(els)
      }
    ranked.withColumn("global_pos", globalPos)
  }

  /** Mixture weighting: keep each row with its stratum's rate (strata
    * absent from `rates` fall back to `defaultRate`). Below
    * `branchCutoff` rates the map folds into a literal when-chain —
    * per-row cost is one string compare chain plus one integer compare,
    * no join, no shuffle; above it the rates broadcast-join as a
    * (stratum, threshold) lookup (same rows kept — see
    * [[groupThreshold]]). */
  def mixture(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "graft-mix", keepCol: String = "",
      branchCutoff: Int = BranchCutoff): DataFrame = {
    val c = coord(col(idCol), salt)
    val entries = rates.toSeq.map { case (s, r) => (s: Any, threshold(r)) }
    val (withThr, thr, tmpCols) = groupThreshold(df, strataCol, entries,
      threshold(defaultRate), org.apache.spark.sql.types.StringType, branchCutoff)
    val out =
      if (keepCol.isEmpty) withThr.filter(c < thr)
      else withThr.withColumn(keepCol, (c < thr).cast("int"))
    out.drop(tmpCols: _*)
  }

  /** Exact top-`n` rows per group by an arbitrary SCORE column (desc,
    * ties by `idCol` asc) — the "keep the best N documents per domain"
    * curation primitive — selected without sorting any group in a
    * single task. [[stratified]]'s oversample-verify-escalate shape,
    * generalized from uniform coordinates to arbitrary scores:
    *   1. ONE aggregate computes per-group counts AND a GK percentile
    *      sketch over a fixed grid (step 1/1000, the q79 operator);
    *   2. per group, a driver-side pick of a grid threshold safely
    *      below the n-th score (margin grid steps under 1 − n/cnt)
    *      turns the selection into a pure `score >= thr` filter —
    *      candidates are a small multiple of n, never the group;
    *   3. only candidates are ranked (window over O(n)-ish rows per
    *      group, bounded by the grid resolution, not the corpus);
    *   4. verify: a group with cnt rows must yield min(cnt, n) —
    *      candidates ⊇ the true top-n iff thr ≤ the n-th score, which
    *      the count check detects exactly; on failure the margin
    *      doubles, saturating at thr = −∞ (the filter becomes the
    *      identity and the ranked selection IS the naive window, so
    *      termination is provable).
    * Selection equals the naive `row_number() over (partition by group
    * order by score desc, id)` row-for-row — the sketch only chooses
    * how few rows get ranked — so an oracle replays the plain window.
    * Rows with a NULL score or NULL group are dropped (null never
    * ranks).
    *
    * Group-cardinality domain: the per-group sketches collect to the
    * driver (~8 KB each) and the thresholds become a literal when-chain
    * (≤ `branchCutoff` groups) or a broadcast-joined lookup above it,
    * so this operator is for METADATA-SCALE group counts (languages,
    * sources, shards — up to tens of thousands; `maxGroups` fails fast
    * past that instead of melting the driver). For per-group
    * caps over millions of groups (web domains), use [[stratified]]
    * (uniform coordinates need no sketch) or pre-aggregate the domain
    * key to a coarser group. */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, n: Int, margin: Int = 2,
      maxGroups: Int = 65536, branchCutoff: Int = BranchCutoff): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(margin >= 1, s"margin must be >= 1, got $margin")
    import org.apache.spark.sql.expressions.Window
    val rows = df.filter(col(groupCol).isNotNull && col(scoreCol).isNotNull)
    val grid = (0 to 1000).map(_ / 1000.0)
    val gridSql = grid.map(q => s"${q}D").mkString("array(", ", ", ")")
    // bounded fetch (maxGroups+1 rows, ~8 KB sketch each) so the guard
    // protects the driver instead of firing after the unbounded collect
    val stats = rows.groupBy(col(groupCol)).agg(
        count(lit(1)).as("__cnt"),
        expr(s"approx_percentile(`$scoreCol`, $gridSql, 10000)").as("__qs"))
      .head(maxGroups + 1)
      .map(r => r.get(0) -> (r.getLong(1), r.getSeq[Any](2)))
    if (stats.isEmpty) return rows.limit(0)
    require(stats.length <= maxGroups,
      s"topKPerGroup saw more than maxGroups=$maxGroups groups — " +
        "this operator is for metadata-scale group counts; see scaladoc")
    var m = margin
    var result: DataFrame = null
    var done = false
    while (!done) {
      // per-group threshold: grid point `m` steps below 1 - n/cnt;
      // idx < 0 ⇒ no filter for that group (saturated)
      val thrs = stats.map { case (g, (cnt, qs)) =>
        val idx = math.floor((1.0 - n.toDouble / cnt) * 1000).toInt - m
        (g, cnt, if (cnt <= n || idx < 0) None else Some(qs(idx)))
      }
      val saturated = thrs.forall(_._3.isEmpty)
      // every non-null group appears in `stats` (it came from a groupBy
      // over `rows`), so the chain's fall-through-to-false and the inner
      // join keep exactly the same rows; a null threshold means the
      // group is saturated (keep all its rows)
      val candidates =
        if (thrs.length <= branchCutoff) {
          val keep = thrs.sortBy(_._1.toString)
            .foldLeft(lit(false)) { case (els, (g, _, thr)) =>
              val cond = thr match {
                case Some(t) => col(groupCol) === lit(g) &&
                  col(scoreCol) >= lit(t)
                case None => col(groupCol) === lit(g)
              }
              when(cond, lit(true)).otherwise(els)
            }
          rows.filter(keep)
        } else {
          import scala.jdk.CollectionConverters._
          import org.apache.spark.sql.types.{StructField, StructType}
          import org.apache.spark.sql.Row
          val lookup = rows.sparkSession.createDataFrame(
            thrs.toSeq.map { case (g, _, t) => Row(g, t.orNull) }.asJava,
            StructType(Seq(
              StructField("__g", df.schema(groupCol).dataType),
              StructField("__thr", df.schema(scoreCol).dataType))))
          rows.join(broadcast(lookup), col(groupCol) === col("__g"))
            .filter(col("__thr").isNull || col(scoreCol) >= col("__thr"))
            .drop("__g", "__thr")
        }
      val ranked = candidates.withColumn("__rk",
        row_number().over(Window.partitionBy(col(groupCol))
          .orderBy(col(scoreCol).desc, col(idCol).asc)))
      result = ranked.filter(col("__rk") <= n).drop("__rk")
      val got = result.groupBy(col(groupCol)).agg(count(lit(1)).as("__got"))
        .collect().map(r => r.get(0) -> r.getLong(1)).toMap
      done = saturated || thrs.forall { case (g, cnt, _) =>
        got.getOrElse(g, 0L) >= math.min(cnt, n.toLong) }
      if (!done) m = m * 2
    }
    result
  }

  /** Temperature-reweighted mixture: per-group sampling rates derived
    * FROM THE DATA as `min(1, baseRate · (n_g / n_max)^(α−1))` — the
    * multinomial temperature reweighting pretraining mixtures use
    * (α < 1 flattens the source distribution: rare sources keep up to
    * everything, the largest source keeps `baseRate`; α = 1 is uniform
    * Bernoulli at `baseRate`). Unlike [[mixture]], no hand-written rate
    * map: one metadata aggregate (one row per group) computes the
    * counts, rates are rounded half-up-6 (pow differs in the last ulp
    * across libm implementations; the rounding makes thresholds
    * engine-exact) and become literal integer thresholds in the plan —
    * the per-row test stays a single compare, shuffle-free.
    *
    * Rows with a NULL group are marked `kept = 0` (null is not a
    * source; coalesce to a sentinel first to sample them). */
  def temperature(df: DataFrame, idCol: String, groupCol: String,
      alpha: Double, baseRate: Double,
      salt: String = "graft-temp", keepCol: String = "kept",
      branchCutoff: Int = BranchCutoff,
      maxGroups: Int = 1 << 20): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(baseRate > 0.0 && baseRate <= 1.0,
      s"baseRate must be in (0,1], got $baseRate")
    require(keepCol.nonEmpty, "keepCol required")
    // loud guard (the topKPerGroup pattern), and a PROTECTIVE one: the
    // fetch is bounded to maxGroups+1 rows, so a document-key group
    // column fails fast instead of melting the driver with the very
    // collect the guard exists to prevent (head(n) returns all rows
    // when there are fewer, so the passing path is unchanged)
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
      .head(maxGroups + 1).map(r => r.get(0) -> r.getLong(1))
    require(counts.length <= maxGroups,
      s"temperature saw more than maxGroups=$maxGroups groups — " +
        "group must be metadata-scale (source/language), not a document key")
    val c = coord(col(idCol), salt)
    if (counts.isEmpty) return df.withColumn(keepCol, lit(0))
    val nMax = counts.map(_._2).max.toDouble
    val round6: Double => Double = x => math.floor(x * 1e6 + 0.5) / 1e6
    val entries = counts.toSeq.map { case (g, n) =>
      g -> threshold(round6(math.min(1.0, baseRate * math.pow(n / nMax, alpha - 1.0)))) }
    val (withThr, thr, tmpCols) = groupThreshold(df, groupCol, entries,
      0L, df.schema(groupCol).dataType, branchCutoff)
    withThr.withColumn(keepCol, (c < thr).cast("int")).drop(tmpCols: _*)
  }

  /** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): split a token budget
    * `budgetFrac · Σweight` across groups (languages) by serving groups
    * in ASCENDING-weight order, each getting
    * min(weight·epochCap, remaining / groupsLeft). Low-resource groups
    * are served up to their epoch cap; the surplus is shared uniformly
    * by the bigger ones — unlike [[temperature]], no group is ever
    * oversampled past its cap and no tiny group's rate depends on a
    * power-law fit. The allocation then becomes per-group keep rates
    * (round6(min(1, alloc/weight))) applied with the engine's
    * integer-threshold convention, so selection is deterministic and
    * oracle-replayable (the allocation loop replays as a recursive CTE;
    * every float op — budget multiply, share divide, min, subtract —
    * runs in the same IEEE order on both sides).
    *
    * `weightCol` must be integral (token counts). Returns df + `keepCol`
    * (1/0); rows in null groups or zero-weight groups keep 0.
    *
    * Scale shape: ONE mergeable sum aggregate down to G driver rows
    * (loud `maxGroups` guard, the [[temperature]] posture), a driver
    * loop over G, and a per-row flag via constant-folded when-chain or
    * broadcast lookup past `branchCutoff`. No window, no data-sized
    * driver state. */
  def unimax(df: DataFrame, idCol: String, groupCol: String,
      weightCol: String, budgetFrac: Double, epochCap: Double = 1.0,
      salt: String = "graft-unimax", keepCol: String = "kept",
      branchCutoff: Int = BranchCutoff,
      maxGroups: Int = 1 << 20): DataFrame = {
    require(budgetFrac > 0.0 && budgetFrac <= 1.0,
      s"budgetFrac must be in (0,1], got $budgetFrac")
    require(epochCap >= 1.0, s"epochCap must be >= 1, got $epochCap")
    require(keepCol.nonEmpty, "keepCol required")
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(sum(col(weightCol)).cast("long").as("w"))
      .head(maxGroups + 1).map(r => r.get(0) -> r.getLong(1))
    require(counts.length <= maxGroups,
      s"unimax saw more than maxGroups=$maxGroups groups — " +
        "group must be metadata-scale (language/source), not a document key")
    if (counts.isEmpty) return df.withColumn(keepCol, lit(0))
    // ascending-weight serve order, ties by the group's string form (the
    // oracle orders the same way)
    val sorted = counts.sortBy { case (g, w) => (w, String.valueOf(g)) }
    val total = sorted.map(_._2).sum.toDouble
    var rem = budgetFrac * total
    val round6: Double => Double = x => math.floor(x * 1e6 + 0.5) / 1e6
    val entries = sorted.zipWithIndex.map { case ((g, w), i) =>
      val share = rem / (sorted.length - i)
      val alloc = math.min(w * epochCap, share)
      rem -= alloc
      val rate = if (w == 0L) 0.0 else round6(math.min(1.0, alloc / w))
      g -> threshold(rate)
    }
    val (withThr, thr, tmpCols) = groupThreshold(df, groupCol, entries,
      0L, df.schema(groupCol).dataType, branchCutoff)
    withThr.withColumn(keepCol,
      (coord(col(idCol), salt) < thr).cast("int")).drop(tmpCols: _*)
  }
}
