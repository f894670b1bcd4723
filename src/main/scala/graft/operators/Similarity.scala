package graft.operators

import graft.functions.VectorExpressions
import graft.functions.VectorExpressions.dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Two tiers, mirroring how a 100 TB pipeline actually runs ANN:
  *  - brute-force cosine top-k: the exact baseline. Query set is broadcast
  *    (it's small); the corpus side streams — one pass, no corpus shuffle,
  *    cost O(|Q|·N·d).
  *  - sign-LSH bucketed top-k: random-hyperplane signatures partition the
  *    corpus; each query probes only its bucket. Hyperplane weights derive
  *    from md5(plane:dim) so the index is deterministic and reproducible,
  *    not RNG-dependent. This is the IVF-style scale path: bucket key =
  *    shuffle/partition key.
  *
  * Hot path: vectors are unit-normalized ONCE per row, so the per-pair
  * work is a single [[graft.functions.DotProduct]] — a custom Catalyst
  * expression with a codegen'd primitive loop (the built-in
  * aggregate/zip_with formulation was ~30× slower on the all-pairs
  * workload).
  */
object Similarity {

  /** Cosine similarity of two double-array columns. Requires
    * VectorExpressions.register on the session (all entry points here
    * do it). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** Project (id, vec) with the vector unit-normalized (norm computed once
    * via a temp column, not per element). */
  /** Unit-normalize with nested evaluate-once binding: without it,
    * CollapseProject inlines the norm (a full dot product) into the
    * division of every element. */
  private[operators] def unitNormalize(vecCol: Column): Column = {
    import graft.functions.TextFunctions.once
    once(asDouble(vecCol)) { v =>
      once(sqrt(dot(v, v))) { n => transform(v, x => x / n) }
    }
  }

  private def normalized(df: DataFrame, idCol: String, vecCol: String,
      idAs: String, vecAs: String): DataFrame = {
    VectorExpressions.register(df.sparkSession)
    df.select(col(idCol).as(idAs), unitNormalize(col(vecCol)).as(vecAs))
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (desc), tie-broken by corpus id asc. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Per-dimension standardization (z-scoring) of an embedding column —
    * the feature-prep step before distance-based work when dimensions
    * carry different scales (also the whitening-lite that keeps one
    * dominant dimension from owning every cosine). Corpus statistics
    * come from ONE mergeable [[graft.functions.VecMean]] aggregate pass
    * (per-dim mean and mean-of-squares — 2·d driver doubles, the
    * codebook class), rounded half-up-6 so distributed float summation
    * order can't flip a value, with σ = round6(√max(0, E[x²]−E[x]²));
    * the projection is then SHUFFLE-FREE with μ/σ baked as literals.
    * Zero-variance dimensions map to 0. Returns one row per (vector,
    * dimension): (corpus_id, i [1-based], z) — melted, so the oracle
    * replays every coordinate. */
  def standardize(df: DataFrame, idCol: String, vecCol: String,
      dims: Int): DataFrame = {
    require(dims >= 1, s"dims must be >= 1, got $dims")
    VectorExpressions.register(df.sparkSession)
    val vm = org.apache.spark.sql.functions.udaf(graft.functions.VecMean(dims))
    val v = df.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("v"))
    val stats = v.agg(vm(col("v")).as("mu"),
      vm(transform(col("v"), x => x * x)).as("m2")).head()
    val mu = stats.getSeq[Double](0).map(round6)
    val m2 = stats.getSeq[Double](1).map(round6)
    val sig = mu.indices.map(i => round6(math.sqrt(math.max(0.0, m2(i) - mu(i) * mu(i)))))
    val zExprs = (0 until dims).map { i =>
      if (sig(i) == 0.0) lit(0.0)
      else (element_at(col("v"), i + 1) - lit(mu(i))) / lit(sig(i))
    }
    v.select(col("corpus_id"), posexplode(array(zExprs: _*)))
      .select(col("corpus_id"), (col("pos") + lit(1)).as("i"), col("col").as("z"))
  }

  /** Hard-negative mining for contrastive / metric training: for each
    * query, the k nearest corpus vectors with a DIFFERENT label — the
    * near-but-wrong examples a triplet/InfoNCE loss learns most from
    * (the batch-mining recipe, run corpus-wide as a join). Ranking and
    * tie-breaking follow [[bruteForceTopK]]; the label predicate runs
    * INSIDE the scan join, so same-label neighbors never occupy
    * shortlist slots.
    *
    * Scale shape: the query side broadcasts (the q50 contract — mine
    * for a bounded query/anchor set per pass); at corpus scale compose
    * with the IVF cells ([[ivfAssignWith]]) to prune the scan the
    * q52/q119 way. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    VectorExpressions.register(queries.sparkSession)
    // labels ride the SAME projection as the normalized vector — a
    // join-back to re-attach a column the input row already has would
    // scan the corpus twice and pay an id-keyed exchange for nothing
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("q_label"), unitNormalize(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"),
      col(labelCol).as("n_label"), unitNormalize(col(vecCol)).as("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id") &&
        col("n_label") =!= col("q_label"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("q_label"), col("rank"),
        col("corpus_id"), col("n_label"), col("cosine"))
  }

  /** Johnson–Lindenstrauss random projection: reduce each unit-normalized
    * vector to `outDims` coordinates, coordinate j = nv · w_j over the
    * deterministic md5 hyperplane family ([[planeWeights]] — the same
    * family the q51 sign-LSH buckets use, so the projection is
    * reproducible and oracle-replayable). JL guarantees pairwise angles
    * survive the reduction to within ε for outDims = O(ln N / ε²) —
    * the standard way to make a wide embedding column cheap enough to
    * scan before an exact rerank.
    *
    * A pure per-row projection: outDims dot products against literal
    * arrays, no shuffle, no state. Returns (idCol, rv). */
  def jlProject(df: DataFrame, idCol: String, vecCol: String,
      outDims: Int, dims: Int): DataFrame = {
    require(outDims >= 1, s"outDims must be >= 1, got $outDims")
    normalized(df, idCol, vecCol, idCol, "__nv")
      .select(col(idCol), array((0 until outDims).map { j =>
        dot(col("__nv"), array(planeWeights(j, dims).toIndexedSeq.map(lit(_)): _*))
      }: _*).as("rv"))
  }

  /** JL serving recipe: [[bruteForceTopK]] over the `outDims`-wide
    * projections over-fetches `k * overscan` candidates (outDims/dims of
    * the full scan cost per pair), then ONLY the shortlist pays exact
    * cosine against the full vectors — the [[pqTopKReranked]] over-fetch
    * pattern with a projection instead of a codebook as the compressed
    * domain. Reduced-space scan is the intentional q50 broadcast shape;
    * the exact side never shuffles (broadcast shortlist + queries). */
  def jlTopKReranked(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, outDims: Int = 16,
      overscan: Int = 4, dims: Int = 0): DataFrame = {
    require(overscan >= 1, s"overscan must be >= 1, got $overscan")
    val d = if (dims > 0) dims else corpus.select(size(col(vecCol))).first().getInt(0)
    val shortlist = bruteForceTopK(
        jlProject(queries, idCol, vecCol, outDims, d),
        jlProject(corpus, idCol, vecCol, outDims, d),
        idCol, "rv", k * overscan)
      .select(col("query_id"), col("corpus_id"))
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    c.join(broadcast(shortlist), Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Deterministic hyperplane weights, computed once on the driver (same
    * md5-derived family as TextFunctions.h60, so the index is stable). */
  private[operators] def planeWeights(plane: Int, dims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dims) { d =>
      val hex = md.digest(s"$plane:$d".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      (java.lang.Long.parseLong(hex, 16) % 2001 - 1000).toDouble
    }
  }

  /** Sign-LSH bucket id in [0, 2^planes): bit p = sign(v · w_p). Weights
    * are literal arrays baked into the plan — zero per-row hashing. */
  def lshSignBits(vecCol: Column, planes: Int, dims: Int): Column = {
    val bits = (0 until planes).map { p =>
      val w = array(planeWeights(p, dims).toIndexedSeq.map(lit(_)): _*)
      when(dot(asDouble(vecCol), w) > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF-style ANN: a train-free deterministic codebook — the
    * `nCentroids` corpus vectors with the smallest md5-derived id hash
    * act as coarse centroids (a reproducible stand-in for k-means; swap
    * in trained centroids without changing the plan). Every corpus
    * vector is assigned to its nearest centroid (the inverted list);
    * each query probes its `nprobe` nearest lists and ranks exact cosine
    * inside them.
    *
    * Scale shape: the codebook is bounded driver-side metadata (K×d
    * doubles) baked into the plan as literals, so corpus assignment is a
    * SHUFFLE-FREE projection; the only exchange is the bucket-keyed
    * probe join. Deterministic end-to-end → DuckDB-replayable (q52). */
  /** The deterministic IVF codebook: the `nCentroids` corpus vectors
    * with the smallest md5-derived id hash (bounded driver-side
    * metadata, K×d doubles). */
  /** Symmetric int8 quantization of an embedding column — the 4×
    * compression step before an embedding corpus ships to an ANN index
    * or a GPU cache. Per vector: `scale = max|v| / 127`,
    * `q_i = floor(v_i/scale + 0.5)` clamped by construction to
    * [−127, 127] (the floor(+0.5) form rounds identically in any
    * engine; banker's-vs-away rounding of `round()` does not).
    *
    * Entirely per-row projection work — no shuffle, no UDF — so at
    * 100 TB quantization composes with the scan like any map pass.
    * Returns (id, dim, scale6, qhash, err6): the 6-decimal scale, an
    * md5 fingerprint of the exact quantized vector (verifiable without
    * shipping the array), and the reconstruction squared error folded
    * IN ARRAY ORDER (float addition doesn't commute; an unordered sum
    * would be last-bit nondeterministic).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import graft.functions.TextFunctions.once
    val halfUp6: Column => Column =
      c => floor(c * lit(1000000.0) + lit(0.5)) / lit(1000000.0)
    val qstruct = once(asDouble(col(vecCol))) { v =>
      once(array_max(transform(v, x => abs(x))) / lit(127.0)) { scale =>
        // bind q once; all-zero vectors (scale 0) quantize to zeros
        once(when(scale > lit(0.0),
            transform(v, x => floor(x / scale + lit(0.5)).cast("int")))
          .otherwise(transform(v, _ => lit(0)))) { q =>
          struct(
            size(v).as("dim"),
            halfUp6(scale).as("scale6"),
            md5(concat_ws(",", transform(q, qi => qi.cast("string")))).as("qhash"),
            halfUp6(aggregate(
              zip_with(v, q, (x, qi) => {
                val d = x - qi.cast("double") * scale
                d * d
              }),
              lit(0.0), (a, x) => a + x)).as("err6"))
        }
      }
    }
    df.withColumn("__q", qstruct).select(
      col(idCol), col("__q.dim").as("dim"), col("__q.scale6").as("scale6"),
      col("__q.qhash").as("qhash"), col("__q.err6").as("err6"))
  }

  private def codebook(normalizedCorpus: DataFrame,
      nCentroids: Int): Seq[(Long, Array[Double])] = {
    import graft.functions.TextFunctions.h60
    normalizedCorpus
      .withColumn("hh", h60(col("corpus_id")))
      .orderBy(col("hh"), col("corpus_id")).limit(nCentroids)
      .select(col("corpus_id"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
  }

  // per-row array of (dot, -cid) structs; asc sort then reverse gives
  // dot DESC with cid ASC on ties (the -cid flips the tie direction)
  private def scoredCentroids(cents: Seq[(Long, Array[Double])],
      v: Column): Column =
    array_sort(array(cents.map { case (cid, w) =>
      struct(dot(v, array(w.map(lit(_)): _*)).as("d"), lit(-cid).as("nc"))
    }: _*))

  /** Shuffle-free IVF cell assignment: every corpus vector mapped to its
    * nearest deterministic-codebook centroid as a pure projection
    * (codebook baked as plan literals). Returns (corpus_id, cv, bucket)
    * with `cv` unit-normalized — the inverted-list build step of
    * [[ivfTopK]], exposed for cell-level analytics (centroid summaries
    * q87, cluster balance checks). */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val cents = codebook(c, nCentroids)
    c.withColumn("bucket",
      -element_at(scoredCentroids(cents, col("cv")), -1).getField("nc"))
  }

  /** [[ivfAssign]] with a caller-supplied codebook (one trained offline
    * via [[trainCentroids]] on a reference sample, or loaded from a
    * previous run) — the SERVING posture for long-lived indexes and
    * streaming gates, where cell assignment must stay STABLE across
    * restarts and corpus growth (retraining per batch would silently
    * reshape cells and change which documents ever get compared).
    * Assignment is the same shuffle-free projection, codebook as plan
    * literals. Returns (corpus_id, cv, bucket). */
  def ivfAssignWith(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "codebook must be non-empty")
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    c.withColumn("bucket",
      -element_at(scoredCentroids(centroids, col("cv")), -1).getField("nc"))
  }

  /** PERSIST a trained codebook as a versioned [[TxLogTable]] artifact
    * — the ANN mirror of the tokenizer's `bpeSave`: an index's
    * centroids are trained ONCE (on a reference sample, an expensive
    * job) and then served by every assignment/search/gate job, and the
    * table versions retrains — time travel reads any historical
    * codebook, a serving job pins the exact codebook version its cell
    * assignments were built with (assignment stability across restarts
    * is the whole point of [[ivfAssignWith]]). Schema
    * `(cluster_id, centroid: array<double>)`; each save is one atomic
    * `overwrite` commit. Returns the committed version. */
  def ivfSave(spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[(Long, Array[Double])], path: String): Long = {
    require(centroids.nonEmpty, "cannot save an empty codebook")
    import spark.implicits._
    TxLogTable.overwrite(spark,
      centroids.map { case (id, v) => (id, v.toSeq) }
        .toDF("cluster_id", "centroid"),
      path)
  }

  /** LOAD an [[ivfSave]]d codebook (optionally a historical version).
    * The collect is bounded metadata by construction — a codebook is
    * K×d, the same class the training path already holds driver-side
    * as plan literals. */
  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String,
      versionAsOf: Option[Long] = None): Seq[(Long, Array[Double])] = {
    val df = versionAsOf
      .map(v => TxLogTable.readVersion(spark, path, v))
      .getOrElse(TxLogTable.read(spark, path))
    df.orderBy(col("cluster_id"))
      .select(col("cluster_id"), col("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toSeq
  }

  /** CLUSTER-QUALITY report over Lloyd-trained cells — the "is this
    * clustering any good?" gate a pipeline runs BEFORE trusting cells
    * for SemDeDup (q120) or cluster-balanced sampling (q111). Per
    * populated cell: population `n`, the mean SIMPLIFIED SILHOUETTE
    * `mean_sil6` (the centroid-based variant — a = cosine distance to
    * the own centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b); Hruschka et al.'s O(N·K) simplification of
    * Rousseeuw '87 — the only silhouette computable at corpus scale,
    * the exact pairwise form is O(N²)), the cosine scatter `scatter6`
    * (mean distance to the own centroid), and the DAVIES-BOULDIN term
    * `db6` = max over other populated cells of (S_i+S_j)/M_ij (Davies
    * & Bouldin '79; lower = tighter/better-separated; NULL when no
    * comparable cell exists).
    *
    * Scale shape: training + assignment are [[ivfAssignTrained]]'s
    * (centroids as plan literals, shuffle-free per-row scoring), the
    * per-cell stats are ONE mergeable hash aggregate, and the K-row
    * result collects driver-side where the K×K Davies-Bouldin matrix
    * is plain arithmetic over already-rounded values — no second
    * corpus pass, no window, nothing all-pairs over rows. All emitted
    * metrics round half-up-6 so a replaying engine lands on identical
    * doubles (the [[trainCentroids]] determinism contract extended to
    * the metrics). Zero-distance centroid pairs (duplicate centroids)
    * are excluded from the DB max rather than dividing by zero. */
  def clusterQuality(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 8, iters: Int = 2): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val cents = trainOnNormalized(c, nCentroids, iters)
    require(cents.size >= 2, "cluster quality needs at least 2 centroids")
    val scored = scoredCentroids(cents, col("cv"))
    val aD = lit(1.0) - element_at(col("__sc"), -1).getField("d")
    val bD = lit(1.0) - element_at(col("__sc"), -2).getField("d")
    val perCell = c.withColumn("__sc", scored)
      .select(
        (-element_at(col("__sc"), -1).getField("nc")).as("bucket"),
        aD.as("a_dist"), bD.as("b_dist"))
      .withColumn("sil",
        when(greatest(col("a_dist"), col("b_dist")) > 0.0,
          (col("b_dist") - col("a_dist")) /
            greatest(col("a_dist"), col("b_dist")))
          .otherwise(lit(0.0)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        (floor(avg(col("sil")) * 1e6 + 0.5) / 1e6).as("mean_sil6"),
        (floor(avg(col("a_dist")) * 1e6 + 0.5) / 1e6).as("scatter6"))
      .collect() // bounded: one row per populated cell, K rows max
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq.sortBy(_._1)
    val centMap = cents.toMap
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def dotArr(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val rows = perCell.map { case (b, n, ms, s) =>
      val dbTerms = perCell.filter(_._1 != b).flatMap { case (o, _, _, so) =>
        val m = r6(1.0 - dotArr(centMap(b), centMap(o)))
        if (m > 0.0) Some(r6((s + so) / m)) else None
      }
      (b, n, ms, s,
        if (dbTerms.isEmpty) None else Some(dbTerms.max))
    }
    rows.toDF("bucket", "n", "mean_sil6", "scatter6", "db6")
  }

  /** EMBEDDING-DISTRIBUTION DRIFT between two corpus versions, measured
    * against a PINNED codebook — the semantic-space counterpart of the
    * token-distribution JS drift (q138), and the reason
    * [[ivfSave]]/[[ivfLoad]] version the codebook at all: per-cell mass
    * is only comparable across corpus versions when BOTH versions
    * assign with the SAME centroids (retraining per version would
    * reshape the cells and report drift that is really just a new
    * clustering). Returns one row per codebook cell: raw counts, each
    * corpus' cell share (half-up 6), and the absolute share difference
    * `drift6` — `sum(drift6)/2` is the total-variation distance
    * downstream reads off. Cells empty in both corpora still appear
    * (share 0/0 — a cell going dark IS drift signal). Shape: two
    * mergeable per-cell counts + one broadcast join of the K-row cell
    * list + a 1-row totals frame cross-joined in; no window. Both
    * corpora must be non-empty (shares divide by the totals). */
  def embeddingDrift(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[(Long, Array[Double])]): DataFrame = {
    require(centroids.nonEmpty, "codebook must be non-empty")
    val spark = a.sparkSession
    import spark.implicits._
    def cellCounts(df: DataFrame, n: String) =
      ivfAssignWith(df, idCol, vecCol, centroids)
        .groupBy(col("bucket")).agg(count(lit(1)).as(n))
    val ca = cellCounts(a, "n_a")
    val cb = cellCounts(b, "n_b")
    val cells = centroids.map(_._1).toDF("bucket")
    val totals = ca.agg(sum(col("n_a")).cast("double").as("__ta"))
      .crossJoin(cb.agg(sum(col("n_b")).cast("double").as("__tb")))
    val shareA = col("n_a").cast("double") / col("__ta")
    val shareB = col("n_b").cast("double") / col("__tb")
    broadcast(cells)
      .join(ca, Seq("bucket"), "left")
      .join(cb, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_a", "n_b"))
      .crossJoin(broadcast(totals))
      // ENFORCE the documented non-empty contract in-plan: an empty
      // corpus leaves its total NULL (sum over zero rows) and every
      // share/drift column would silently go NULL — fail loudly
      // instead. assert_true(NULL) throws, so the null total itself
      // trips the check; the filter is true on success (assert_true
      // yields NULL) and costs K rows.
      .filter(isnull(assert_true(col("__ta") > 0.0 && col("__tb") > 0.0,
        lit("embeddingDrift: both corpora must be non-empty (a share " +
          "divides by each total)"))))
      .select(col("bucket"), col("n_a"), col("n_b"),
        graft.queries.Rnd.halfUp(shareA, 6).as("share_a6"),
        graft.queries.Rnd.halfUp(shareB, 6).as("share_b6"),
        graft.queries.Rnd.halfUp(abs(shareA - shareB), 6).as("drift6"))
  }

  /** [[ivfAssign]] against a Lloyd-trained codebook ([[trainCentroids]])
    * — cells follow the data's cluster structure, so the buckets are
    * SEMANTIC groups (topic-ish cells over document embeddings), usable
    * as the group key for cluster-balanced curation (q111: temperature
    * reweighting per semantic cell). Assignment itself stays a
    * shuffle-free projection with the trained codebook as plan
    * literals. */
  def ivfAssignTrained(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, iters: Int = 2): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val cents = trainOnNormalized(c, nCentroids, iters)
    c.withColumn("bucket",
      -element_at(scoredCentroids(cents, col("cv")), -1).getField("nc"))
  }

  private def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Lloyd-trained IVF codebook (spherical k-means over the
    * unit-normalized corpus): seeds are the train-free md5 codebook
    * reindexed to cluster ids 0..K-1, then `iters` rounds of
    *  - assign: nearest-centroid as a SHUFFLE-FREE projection (current
    *    centroids baked as plan literals, argmax dot, ties to lower id);
    *  - update: per-cell element-wise mean via the mergeable [[graft
    *    .functions.VecMean]] (map-side partials; the exchange carries
    *    K×d state, never vectors), collected driver-side (bounded
    *    metadata, exactly like the codebook), unit-renormalized, and
    *    rounded half-up-6 component-wise. The rounding makes every
    *    intermediate centroid ENGINE-EXACT: float sums differ across
    *    aggregation orders in the last ulps, and an unrounded centroid
    *    would make iteration-2 assignments unreplayable — with it, an
    *    oracle unrolls the same iterations and lands on identical
    *    doubles. Empty cells keep their previous centroid.
    *
    * Driver loop cost: `iters` jobs of one groupBy over narrow (bucket,
    * cv) rows — iteration count is a parameter, not data-dependent. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int = 16, iters: Int = 2): Seq[(Long, Array[Double])] = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    trainOnNormalized(c, nCentroids, iters)
  }

  private def trainOnNormalized(c: DataFrame, nCentroids: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // reindex the md5-ordered seeds to cluster ids 0..K-1 (stable ids a
    // replaying engine can reproduce with a row_number)
    var cents: Seq[(Long, Array[Double])] =
      codebook(c, nCentroids).zipWithIndex.map { case ((_, v), i) => (i.toLong, v) }
    // dims from the collected seeds — the former first() probe was a
    // whole extra Spark action per training call just to read the width.
    // Fail HERE on an empty corpus (the probe used to throw): dims=0
    // would silently yield an empty codebook and defer the failure to a
    // confusing downstream point (ADVICE r18)
    require(cents.nonEmpty, "cannot train centroids on an empty corpus")
    val dims = cents.head._2.length
    val vm = udaf(graft.functions.VecMean(dims))
    for (_ <- 0 until iters) {
      val means = c
        .withColumn("bucket",
          -element_at(scoredCentroids(cents, col("cv")), -1).getField("nc"))
        .groupBy(col("bucket")).agg(vm(col("cv")).as("m"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
      cents = cents.map { case (cid, old) =>
        means.get(cid).filter(_.nonEmpty) match {
          case Some(m) =>
            val r = m.map(round6)
            val n = math.sqrt(r.map(x => x * x).sum)
            (cid, if (n > 0.0) r.map(x => round6(x / n)) else old)
          case None => (cid, old)
        }
      }
    }
    cents
  }

  /** IVF ANN over a Lloyd-trained codebook — [[ivfTopK]] with
    * [[trainCentroids]] centroids instead of the train-free stand-in.
    * Same plan shape (literal codebook, shuffle-free assignment,
    * bucket-keyed probe join); recall improves because cells now follow
    * the data's cluster structure instead of arbitrary corpus vectors. */
  def ivfTopKTrained(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nprobe: Int = 2, iters: Int = 2): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    ivfTopKWith(trainOnNormalized(c, nCentroids, iters), c, queries,
      idCol, vecCol, k, nprobe)
  }

  def ivfTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nprobe: Int = 2): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    ivfTopKWith(codebook(c, nCentroids), c, queries, idCol, vecCol, k, nprobe)
  }

  /** Full IVF top-k SERVING from a CALLER-SUPPLIED codebook — the
    * public search half of the versioned index artifact
    * ([[ivfSave]]/[[ivfLoad]]): a serving job loads the exact codebook
    * version its index was built with and runs the complete
    * nprobe-cell search against it, never retraining (which would
    * silently reshape cells between the index build and the query
    * path). Identical plan to [[ivfTopKTrained]]: codebook as plan
    * literals, shuffle-free assignment, broadcast probe join. */
  def ivfTopKWith(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Seq[(Long, Array[Double])], nprobe: Int): DataFrame = {
    require(centroids.nonEmpty, "codebook must be non-empty")
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    ivfTopKWith(centroids, c, queries, idCol, vecCol, k, nprobe)
  }

  private def ivfTopKWith(cents: Seq[(Long, Array[Double])],
      c: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val assigned = c
      .withColumn("bucket",
        -element_at(scoredCentroids(cents, col("cv")), -1).getField("nc"))
    val probes = normalized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("probe",
        explode(slice(reverse(scoredCentroids(cents, col("qv"))), 1, nprobe)))
      .select(col("query_id"), col("qv"), (-col("probe.nc")).as("bucket"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    assigned.join(broadcast(probes), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  // ---- product quantization (Jégou/Douze/Schmid, TPAMI 2011) ----
  //
  // The memory scale path for 100 TB embedding corpora: a d-dim float
  // vector (d*4 bytes) compresses to m byte-ish codes — here 64 dims ×
  // 4 B = 256 B down to m=4 codes — and asymmetric distance computation
  // (ADC) scores query-vs-code with m table lookups + adds instead of d
  // multiplies. Composes with IVF (probe cells, then ADC inside them);
  // the codebooks are m*ksub*(d/m) doubles of driver-side metadata,
  // baked into plans as literals exactly like the IVF codebook.
  //
  // Same determinism discipline as [[trainCentroids]]: md5-ordered
  // seeds, per-iteration means rounded half-up-6 (NOT renormalized —
  // PQ centroids are subspace means, not directions), assignment
  // tie-broken to the lower code id. Every intermediate is
  // engine-exact, so the DuckDB oracle (q114) unrolls the training,
  // the encoding, and the ADC ranking and lands on identical doubles.

  /** One subspace of a vector column: dims [sub*dsub, (sub+1)*dsub). */
  private def subvec(v: Column, sub: Int, dsub: Int): Column =
    slice(v, sub * dsub + 1, dsub)

  /** Argmax over literal (cid, centroid) pairs of `x·c - |c|²/2` (the
    * L2-nearest centroid), ties to the LOWER cid — the [[scoredCentroids]]
    * trick with the half-norm folded in as a driver-computed literal. */
  private def nearestCode(v: Column, book: Seq[(Long, Array[Double])]): Column =
    -element_at(array_sort(array(book.map { case (cid, w) =>
      val halfNormSq = w.map(x => x * x).sum / 2.0
      struct((dot(v, array(w.map(lit(_)).toIndexedSeq: _*)) - lit(halfNormSq)).as("d"),
        lit(-cid).as("nc"))
    }: _*)), -1).getField("nc")

  /** Train the m per-subspace codebooks: plain L2 k-means (`iters`
    * rounds) over the subvectors of the unit-normalized corpus, ksub
    * centroids each. Seeds are the md5-ordered corpus rows' subvectors
    * (the [[trainCentroids]] seeding, sliced per subspace). Each
    * iteration runs ONE job: the m per-subspace assignments are
    * computed side by side in a single projection (current books as
    * plan literals), exploded to (sub, code, subvec) rows, and reduced
    * by the mergeable [[graft.functions.VecMean]] — the exchange
    * carries m*ksub*dsub partial state, never vectors. Returns
    * ((sub, cid) -> centroid), empty cells keep their seed. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 4, ksub: Int = 8, iters: Int = 2): Seq[(Int, Long, Array[Double])] = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    trainPqOnNormalized(c, m, ksub, iters)
  }

  private def trainPqOnNormalized(c: DataFrame, m: Int, ksub: Int,
      iters: Int): Seq[(Int, Long, Array[Double])] = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    // ONE seed collect shared by every subspace (this ran codebook() —
    // an identical orderBy-limit-collect action — once PER subspace,
    // m actions computing the same rows); dims read from the seeds
    // instead of a dedicated first() probe action
    val seeds = codebook(c, ksub)
    // empty corpus fails loudly here (dims=0 would pass the modulus
    // check trivially and produce a degenerate codebook — ADVICE r18)
    require(seeds.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dims = seeds.head._2.length
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val vm = udaf(graft.functions.VecMean(dsub))
    var books: Map[Int, Seq[(Long, Array[Double])]] =
      (0 until m).map { s =>
        s -> seeds.zipWithIndex.map { case ((_, v), i) =>
          (i.toLong, v.slice(s * dsub, (s + 1) * dsub))
        }
      }.toMap
    for (_ <- 0 until iters) {
      val assignedRows = c.select(explode(array((0 until m).map { s =>
        struct(lit(s).as("sub"),
          nearestCode(subvec(col("cv"), s, dsub), books(s)).as("cid"),
          subvec(col("cv"), s, dsub).as("sv"))
      }: _*)).as("a"))
        .select(col("a.sub"), col("a.cid"), col("a.sv"))
      val means = assignedRows.groupBy(col("sub"), col("cid"))
        .agg(vm(col("sv")).as("mv"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2).toArray)
        .toMap
      books = books.map { case (s, book) =>
        s -> book.map { case (cid, old) =>
          means.get((s, cid)).filter(_.nonEmpty) match {
            case Some(mv) => (cid, mv.map(round6))
            case None => (cid, old)
          }
        }
      }
    }
    (0 until m).flatMap(s => books(s).map { case (cid, w) => (s, cid, w) })
  }

  /** PQ-encode the corpus: (corpus_id, codes) with `codes(s)` the
    * L2-nearest subspace-`s` centroid id. Pure shuffle-free projection —
    * the codebooks are plan literals, so at scale this composes with
    * the scan like any map pass; the encoded table is the m-byte-per-row
    * representation an ANN serving tier actually holds in memory. */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      books: Seq[(Int, Long, Array[Double])]): DataFrame = {
    val m = books.map(_._1).max + 1
    val dsub = books.head._3.length
    val bySub = books.groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3))).toMap
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    c.select(col("corpus_id"), array((0 until m).map { s =>
      nearestCode(subvec(col("cv"), s, dsub), bySub(s))
    }: _*).as("codes"))
  }

  /** ADC top-k: approximate inner product of query q against an encoded
    * corpus row = Σ_s q_sub(s) · centroid(s, codes(s)) — m table
    * lookups per pair. Each (small, broadcast) query row carries its
    * m×ksub distance table as an array-of-arrays computed once per
    * query; the corpus side streams its codes. Folded in subspace
    * order (left fold from 0.0) so the score is engine-exact. Returns
    * (query_id, rank, corpus_id, score): rank by ADC score desc,
    * corpus id asc on ties. */
  def pqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      m: Int = 4, ksub: Int = 8, iters: Int = 2): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val books = trainPqOnNormalized(c, m, ksub, iters)
    val bySub = books.groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3))).toMap
    val dsub = books.head._3.length
    val encoded = c.select(col("corpus_id"), array((0 until m).map { s =>
      nearestCode(subvec(col("cv"), s, dsub), bySub(s))
    }: _*).as("codes"))
    // per-query ADC table: tbl(s)(cid) = q_sub(s) · centroid(s, cid)
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("tbl", array((0 until m).map { s =>
        array(bySub(s).sortBy(_._1).map { case (_, w) =>
          dot(subvec(col("qv"), s, dsub), array(w.map(lit(_)).toIndexedSeq: _*))
        }: _*)
      }: _*))
      .select(col("query_id"), col("tbl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    encoded.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", aggregate(
        zip_with(col("tbl"), col("codes"),
          (row, code) => element_at(row, code.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** The full PQ serving recipe: ADC candidate generation + exact
    * rerank. [[pqTopK]] over-fetches `k * overscan` candidates from the
    * compressed representation (cheap — table lookups), then ONLY the
    * shortlist pays for exact cosine against the full vectors, and the
    * final top-k ranks by the exact score. This is how PQ indexes are
    * actually served: compression recall gaps close because the true
    * neighbors almost always sit inside a modest overscan shortlist.
    *
    * Scale shape: the shortlist is |Q|·k·overscan rows — broadcast it
    * into the corpus join, so the full-vector side never shuffles and
    * only shortlisted vectors are ever scored exactly. */
  def pqTopKReranked(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, overscan: Int = 4,
      m: Int = 4, ksub: Int = 8, iters: Int = 2): DataFrame = {
    require(overscan >= 1, s"overscan must be >= 1, got $overscan")
    val shortlist = pqTopK(queries, corpus, idCol, vecCol, k * overscan,
      m, ksub, iters).select(col("query_id"), col("corpus_id"))
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    c.join(broadcast(shortlist), Seq("corpus_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** IVF-PQ: the two scale paths composed the way a 100 TB ANN index
    * actually runs — the Lloyd-trained coarse quantizer prunes the
    * corpus to `nprobe` cells (the IVF join key), ADC scores only the
    * probed cells' byte codes, and the exact rerank touches only the
    * overscan shortlist. Cost per query ≈ (corpus/nCentroids)·nprobe
    * table lookups + k·overscan exact dots, vs N·d multiplies for
    * brute force; all codebooks (coarse K×d + fine m×ksub×dsub) stay
    * driver-side metadata baked into plans as literals. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nCentroids: Int = 16, nprobe: Int = 2,
      m: Int = 4, ksub: Int = 8, iters: Int = 2,
      overscan: Int = 4): DataFrame = {
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val coarse = trainOnNormalized(c, nCentroids, iters)
    val books = trainPqOnNormalized(c, m, ksub, iters)
    val bySub = books.groupBy(_._1).view.mapValues(_.map(b => (b._2, b._3))).toMap
    val dsub = books.head._3.length
    val encoded = c.select(col("corpus_id"),
      (-element_at(scoredCentroids(coarse, col("cv")), -1).getField("nc")).as("bucket"),
      array((0 until m).map { s =>
        nearestCode(subvec(col("cv"), s, dsub), bySub(s))
      }: _*).as("codes"))
    // tbl BEFORE the probe explode: one m×ksub table per query, not
    // one per probed cell
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("tbl", array((0 until m).map { s =>
        array(bySub(s).sortBy(_._1).map { case (_, w) =>
          dot(subvec(col("qv"), s, dsub), array(w.map(lit(_)).toIndexedSeq: _*))
        }: _*)
      }: _*))
      .withColumn("probe",
        explode(slice(reverse(scoredCentroids(coarse, col("qv"))), 1, nprobe)))
      .select(col("query_id"), (-col("probe.nc")).as("bucket"), col("tbl"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    val shortlist = encoded.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("score", aggregate(
        zip_with(col("tbl"), col("codes"),
          (row, code) => element_at(row, code.cast("int") + 1)),
        lit(0.0), (acc, x) => acc + x))
      .withColumn("rank", row_number().over(wAdc))
      .filter(col("rank") <= k * overscan)
      .select(col("query_id"), col("corpus_id"))
    val qv = normalized(queries, idCol, vecCol, "query_id", "qv")
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    c.join(broadcast(shortlist), Seq("corpus_id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Bucketed ANN: queries probe only their own LSH bucket, then exact
    * cosine top-k within the bucket. Approximate (recall < 1) by design. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8,
      dims: Int = 0): DataFrame = {
    // callers know their embedding width; dims=0 infers it with one tiny
    // driver job (convenience only — pass dims to keep the plan pure)
    val d = if (dims > 0) dims
            else queries.select(size(col(vecCol))).first().getInt(0)
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
      .withColumn("bucket", lshSignBits(col("qv"), planes, d))
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
      .withColumn("bucket", lshSignBits(col("cv"), planes, d))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Margin-based bitext candidate mining (Artetxe & Schwenk, ACL 2019
    * — the CCMatrix/LASER recipe): for each vector in corpus A, its
    * best match in corpus B scored by the MARGIN
    * `cos(a,b) / ((avgTopK(a) + avgTopK(b)) / 2)` — raw cosine divided
    * by how similar each side is to its neighborhood in general, which
    * kills the hub vectors that are everyone's nearest neighbor and is
    * why margin beats absolute-threshold mining for parallel-corpus
    * extraction. Returns (a_id, b_id, cos, margin) for the best-margin
    * B match per A vector with margin ≥ `threshold` (ties: smaller
    * b_id).
    *
    * Determinism: each pairwise cosine additionally fixes to an integer
    * micro-cosine (`floor(cos·10⁶+0.5)` long), and the top-k
    * neighborhood means are exact integer sums of those — summation
    * order can't move them; the margin itself is then one double DAG on
    * (cos, two exact means). Best-match selection is a mergeable
    * struct-max, not a window.
    *
    * Scale shape: the all-pairs stage is [[bruteForceTopK]]'s
    * broadcast-A corpus scan (the q50 shape — intentionally
    * product-shaped, PlanSpec-allowlisted); both rank windows carry
    * WindowGroupLimit pushdown. At real bitext scale swap the all-pairs
    * stage for the LSH/IVF prefilter ([[lshTopK]]/[[ivfPqTopK]]) — the
    * margin math downstream is unchanged.
    */
  def marginMining(a: DataFrame, b: DataFrame, idCol: String,
      vecCol: String, k: Int = 4, threshold: Double = 1.0,
      index: IndexStore = IndexStore.default): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val an = normalized(a, idCol, vecCol, "a_id", "av")
    val bn = normalized(b, idCol, vecCol, "b_id", "bv")
    val pairs = IndexStore.persist(
      bn.crossJoin(broadcast(an))
        .withColumn("cos", dot(col("av"), col("bv")))
        .withColumn("c6", floor(col("cos") * lit(1.0e6) + lit(0.5)).cast("long"))
        .select(col("a_id"), col("b_id"), col("cos"), col("c6")),
      index)
    val wa = org.apache.spark.sql.expressions.Window
      .partitionBy(col("a_id")).orderBy(col("cos").desc, col("b_id").asc)
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("b_id")).orderBy(col("cos").desc, col("a_id").asc)
    val ra = pairs.withColumn("rka", row_number().over(wa))
      .filter(col("rka") <= k)
    val avgA = ra.groupBy(col("a_id"))
      .agg(sum(col("c6")).as("sa"), count(lit(1)).as("na"))
    val avgB = pairs.withColumn("rkb", row_number().over(wb))
      .filter(col("rkb") <= k)
      .groupBy(col("b_id"))
      .agg(sum(col("c6")).as("sb"), count(lit(1)).as("nb"))
    val scored = ra.join(avgA, Seq("a_id")).join(avgB, Seq("b_id"))
      .withColumn("margin", col("cos") /
        ((col("sa").cast("double") / (col("na").cast("double") * lit(1.0e6)) +
          col("sb").cast("double") / (col("nb").cast("double") * lit(1.0e6)))
          / lit(2.0)))
      .filter(col("margin") >= lit(threshold))
    // best-match tie-break is (margin DESC, b_id ASC) — matching the
    // oracle's QUALIFY ordering exactly. cos rides third as payload
    // only: (margin, b_id) is already unique within an a_id group, so
    // cos never participates in the comparison and the two engines
    // cannot diverge on an exact-margin tie with differing cos.
    scored.groupBy(col("a_id"))
      .agg(max(struct(col("margin"), (-col("b_id")).as("nb2"),
        col("cos").as("cos"))).as("__w"))
      .select(col("a_id"), (-col("__w.nb2")).as("b_id"),
        col("__w.cos").as("cos"), col("__w.margin").as("margin"))
  }

  /** Maximal-marginal-relevance diversified top-k (Carbonell & Goldstein
    * SIGIR'98): for each query, greedily select k of the `shortlist`
    * most-relevant corpus vectors, each step maximizing
    * `λ·cos(q,c) − (1−λ)·max_{s∈S} cos(c,s)` — relevance discounted by
    * similarity to what is already selected, so a serving layer returns
    * k DIFFERENT neighbors instead of k copies of the nearest cluster.
    *
    * Scale shape — the retrieval/rerank split every ANN serving path in
    * this engine uses: the expensive stage is the distributed exact
    * shortlist (same plan as [[bruteForceTopK]]: broadcast queries ride
    * the corpus scan, per-query top-`shortlist` by window rank); the
    * greedy loop then runs per-query on EXECUTORS (`flatMapGroups`
    * keyed by query id) — per-group state is bounded serving metadata
    * (≤ `shortlist × d` doubles, guarded ≤ 4096 per query), and the
    * query batch itself never collects: a 1M-query batch is 1M
    * independent group tasks, not a driver-side loop. The
    * O(k·shortlist²) pairwise step stays inside its group. Swap the
    * shortlist stage for [[ivfPqTopK]] when the corpus scan itself must
    * be pruned.
    *
    * Determinism contract: selection compares raw doubles, so the
    * cross-engine replay (q135) requires λ exactly representable in
    * binary (0.5, 0.25, 0.75 — NOT 0.7, whose 1−λ is 0.30000000000000004
    * on one side and a literal 0.3 on the other); pairwise sims are
    * in-order dot products of the SAME unit-normalized vectors the
    * shortlist stage computed. Ties break by corpus id ascending. The
    * max-sim over an empty selection is 0, so step 1 picks pure
    * relevance.
    *
    * Returns (query_id, sel_rank [1-based selection order], corpus_id,
    * rel [cosine to query]).
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, shortlist: Int,
      lambda: Double = 0.5): DataFrame = {
    require(k >= 1 && shortlist >= k,
      s"need shortlist ($shortlist) >= k ($k) >= 1")
    require(shortlist <= 4096,
      s"shortlist $shortlist is collected serving metadata; cap is 4096")
    require(lambda >= 0 && lambda <= 1, s"lambda $lambda out of [0,1]")
    val spark = queries.sparkSession
    val q = normalized(queries, idCol, vecCol, "query_id", "qv")
    val c = normalized(corpus, idCol, vecCol, "corpus_id", "cv")
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    val short = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= shortlist)
      .select(col("query_id").cast("long"), col("corpus_id").cast("long"),
        col("cosine"), col("cv"))
    // the greedy is embarrassingly parallel by query: run it per-group
    // on EXECUTORS (flatMapGroups), never collecting the shortlists to
    // the driver — per-group state is the same ≤ shortlist × d doubles,
    // but a 1M-query batch is now 1M independent tasks' worth of work
    // spread over the cluster instead of one single-threaded driver loop
    // holding the whole n_queries × shortlist × d block in driver heap.
    import spark.implicits._
    short.groupByKey(_.getLong(0))
      .flatMapGroups { (qid: Long, rows: Iterator[org.apache.spark.sql.Row]) =>
        // ascending id + strict > in the argmax = smallest id wins ties,
        // mirroring ORDER BY score DESC, corpus_id ASC
        val cand = rows.map(r => (r.getLong(1), r.getDouble(2),
          r.getSeq[Double](3).toArray)).toArray.sortBy(_._1)
        def dotArr(a: Array[Double], b: Array[Double]): Double = {
          var s = 0.0; var i = 0
          while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
          s
        }
        val picked = scala.collection.mutable.ArrayBuffer.empty[Int]
        val chosen = new Array[Boolean](cand.length)
        (0 until math.min(k, cand.length)).foreach { _ =>
          var bestIdx = -1
          var bestScore = Double.NegativeInfinity
          cand.indices.foreach { i =>
            if (!chosen(i)) {
              var maxSim = Double.NegativeInfinity
              picked.foreach { j =>
                val s = dotArr(cand(i)._3, cand(j)._3)
                if (s > maxSim) maxSim = s
              }
              val ms = if (picked.isEmpty) 0.0 else maxSim
              val score = lambda * cand(i)._2 - (1 - lambda) * ms
              if (score > bestScore) { bestScore = score; bestIdx = i }
            }
          }
          picked += bestIdx
          chosen(bestIdx) = true
        }
        picked.zipWithIndex.map { case (i, r) =>
          (qid, (r + 1).toLong, cand(i)._1, cand(i)._2) }
      }
      .toDF("query_id", "sel_rank", "corpus_id", "rel")
  }
}
