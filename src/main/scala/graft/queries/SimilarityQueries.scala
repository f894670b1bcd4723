package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.{Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Similarity-search extension operators: exact brute-force ANN baseline
  * and the LSH-bucketed scale path — both oracle-verified; the q51 oracle
  * replays the deterministic md5 hyperplane family, so bucket assignment
  * and within-bucket ranking are both checked. */
object SimilarityQueries extends QueryModule {

  /** Brute-force cosine top-5 for 10 query vectors over the corpus. */
  private val q50 = QueryDef(
    "q50_ann_bruteforce_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.query_id, e.vec_id AS corpus_id,
               list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM e CROSS JOIN q
        WHERE q.query_id <> e.vec_id),
      ranked AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** LSH-bucketed ANN (sign-random-projection, 6 planes): the scale path.
    * The oracle replays the identical md5-derived hyperplanes over the
    * unit-normalized vectors, verifying bucketing + in-bucket top-k. */
  private val q51 = QueryDef(
    "q51_ann_lsh_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.lshTopK(queries, emb, "vec_id", "embedding", k = 5, planes = 6,
          dims = Tables.embeddingDims)
        .select(col("query_id"), col("bucket"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      planes AS (
        SELECT p, list_transform(generate_series(0, 63), d ->
          CAST(('0x' || substr(md5(p::VARCHAR || ':' || d::VARCHAR), 1, 15))::UBIGINT::BIGINT
               % 2001 - 1000 AS DOUBLE)) AS w
        FROM (SELECT unnest(generate_series(0, 5)) AS p)),
      bkt AS (
        SELECT n.vec_id,
               CAST(sum(CASE WHEN list_dot_product(n.nv, p.w) > 0 THEN (1 << p.p) ELSE 0 END) AS BIGINT) AS bucket
        FROM n, planes p GROUP BY n.vec_id),
      nb AS (SELECT n.vec_id, n.nv, b.bucket FROM n JOIN bkt b ON n.vec_id = b.vec_id),
      scored AS (
        SELECT q.vec_id AS query_id, q.bucket, c.vec_id AS corpus_id,
               list_dot_product(q.nv, c.nv) AS cosine
        FROM nb q JOIN nb c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
        WHERE q.vec_id < 10),
      ranked AS (
        SELECT query_id, bucket, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, bucket, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** IVF-style ANN (train-free deterministic codebook, nprobe=2): the
    * inverted-list scale path. The oracle replays codebook selection
    * (smallest md5-hash ids), nearest-centroid assignment, probe choice,
    * and in-list ranking — the full index structure is verified. */
  private val q52 = QueryDef(
    "q52_ann_ivf_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.ivfTopK(queries, emb, "vec_id", "embedding", k = 5,
          nCentroids = 16, nprobe = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      cent AS (
        SELECT vec_id AS cid, nv AS cv
        FROM n
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
        LIMIT 16),
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, cent c) t WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, cent c WHERE n.vec_id < 10) t WHERE rn <= 2),
      scored AS (
        SELECT p.query_id, a.vec_id AS corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket
        JOIN n qn ON qn.vec_id = p.query_id
        JOIN n cn ON cn.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id),
      ranked AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Per-IVF-cell centroid summaries: cell population + element-wise
    * mean vector via the mergeable VecMean Aggregator (map-side partial
    * sums; the exchange carries K×d state, never vectors) over the
    * shuffle-free ivfAssign projection — the k-means-update /
    * cluster-summary kernel. Centroid elements are emitted as
    * half-up-6 scaled integers joined into a string, so cross-engine
    * comparison never depends on float formatting; DuckDB replays the
    * codebook, the assignment, and the element-wise means. */
  /** IVF over a Lloyd-TRAINED codebook (2 spherical-k-means iterations,
    * K=8): the trained upgrade of q52. The oracle unrolls the exact
    * training — md5-ordered seeds reindexed 0..K-1, per-iteration
    * nearest-centroid assignment, per-cell means rounded half-up-6,
    * unit-renormalization rounded again — then replays probe choice and
    * in-list ranking over the TRAINED centroids. Intermediate rounding
    * is what makes the centroids engine-exact (float sums differ in the
    * last ulps across aggregation orders); without it iteration 2 would
    * be unreplayable. */
  /** The q101/q111 shared oracle prefix: two unrolled Lloyd iterations
    * (K=8) ending at the trained centroid table `c2` — byte-identical
    * SQL in both, so the training replay is verified once and the two
    * queries diverge only in what they DO with the trained cells. */
  private val lloydK8I2Ctes = """e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      seed0 AS (
        SELECT vec_id, nv FROM n
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
        LIMIT 8),
      seed AS (
        SELECT row_number() OVER (
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
          ) - 1 AS cid, nv AS cv
        FROM seed0),
      a1 AS (
        SELECT vec_id, nv, cid FROM (
          SELECT n.vec_id, n.nv, s.cid,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, s.cv) DESC, s.cid ASC) AS rn
          FROM n, seed s) t WHERE rn = 1),
      m1 AS (
        SELECT cid, i, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS r
        FROM (SELECT cid, generate_subscripts(nv, 1) AS i, unnest(nv) AS x FROM a1)
        GROUP BY cid, i),
      l1 AS (SELECT cid, list(r ORDER BY i) AS rv FROM m1 GROUP BY cid),
      c1 AS (
        SELECT s.cid,
               CASE WHEN l.rv IS NULL THEN s.cv
                    ELSE list_transform(l.rv, x ->
                      floor(x / sqrt(list_dot_product(l.rv, l.rv)) * 1000000.0 + 0.5) / 1000000.0)
               END AS cv
        FROM seed s LEFT JOIN l1 l USING (cid)),
      a2 AS (
        SELECT vec_id, nv, cid FROM (
          SELECT n.vec_id, n.nv, c.cid,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c1 c) t WHERE rn = 1),
      m2 AS (
        SELECT cid, i, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS r
        FROM (SELECT cid, generate_subscripts(nv, 1) AS i, unnest(nv) AS x FROM a2)
        GROUP BY cid, i),
      l2 AS (SELECT cid, list(r ORDER BY i) AS rv FROM m2 GROUP BY cid),
      c2 AS (
        SELECT c.cid,
               CASE WHEN l.rv IS NULL THEN c.cv
                    ELSE list_transform(l.rv, x ->
                      floor(x / sqrt(list_dot_product(l.rv, l.rv)) * 1000000.0 + 0.5) / 1000000.0)
               END AS cv
        FROM c1 c LEFT JOIN l2 l USING (cid))"""

  private val q101 = QueryDef(
    "q101_ann_ivf_trained",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.ivfTopKTrained(queries, emb, "vec_id", "embedding", k = 5,
          nCentroids = 8, nprobe = 2, iters = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c WHERE n.vec_id < 10) t WHERE rn <= 2),
      scored AS (
        SELECT p.query_id, a.vec_id AS corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket
        JOIN n qn ON qn.vec_id = p.query_id
        JOIN n cn ON cn.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id),
      ranked AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Semantic cluster-balanced sampling — the embedding-space capstone
    * of the mixture family: assign every vector to its Lloyd-trained
    * cell ([[Similarity.ivfAssignTrained]] — cells are SEMANTIC groups,
    * not hand-labeled sources), then temperature-reweight per cell
    * (q103's operator with the cell as the group). Balances a corpus by
    * what documents ARE ABOUT rather than where they came from — the
    * cluster-balanced curation recipe pretraining mixtures use when
    * source labels are missing or too coarse. The oracle replays the
    * SAME trained centroids as q101 (shared CTE prefix), the
    * assignment, the count-derived half-up-6 rates, and the per-row
    * 60-bit coordinate compare. */
  private val q111 = QueryDef(
    "q111_cluster_balanced_sampling",
    (s, d) => {
      val assigned = Similarity.ivfAssignTrained(Tables.embeddings(s, d),
          "vec_id", "embedding", nCentroids = 8, iters = 2)
        .select(col("corpus_id").as("vec_id"), col("bucket"))
      Sampling.temperature(assigned, "vec_id", "bucket",
          alpha = 0.5, baseRate = 0.5)
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      cnt AS (SELECT bucket, count(*) AS n FROM assign GROUP BY bucket),
      mx AS (SELECT max(n) AS nmax FROM cnt),
      th AS (
        SELECT bucket,
               CAST(floor(
                 (floor(least(1.0, 0.5 * pow(n / nmax, -0.5)) * 1000000.0 + 0.5)
                   / 1000000.0) * 1152921504606846976.0) AS BIGINT) AS thr
        FROM cnt, mx)
      SELECT a.vec_id, a.bucket,
             CASE WHEN ('0x' || substr(md5('graft-temp|' || a.vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT < t.thr
                  THEN 1 ELSE 0 END AS kept
      FROM assign a JOIN th t USING (bucket)
      ORDER BY a.vec_id"""))

  private val q87 = QueryDef(
    "q87_ivf_cell_centroids",
    (s, d) => {
      val vm = udaf(graft.functions.VecMean(Tables.embeddingDims))
      Similarity.ivfAssign(Tables.embeddings(s, d), "vec_id", "embedding",
          nCentroids = 16)
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"), vm(col("cv")).as("c"))
        .select(col("bucket"), col("n"),
          concat_ws(",", transform(col("c"),
            x => floor(x * lit(1000000.0) + lit(0.5)).cast("long")))
            .as("centroid_fp"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      cent AS (
        SELECT vec_id AS cid, nv AS cv
        FROM n
        ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
        LIMIT 16),
      assign AS (
        SELECT vec_id, bucket, nv FROM (
          SELECT n.vec_id, c.cid AS bucket, n.nv,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, cent c) t WHERE rn = 1),
      ux AS (
        SELECT bucket, generate_subscripts(nv, 1) AS i, unnest(nv) AS x
        FROM assign),
      m AS (
        SELECT bucket, i,
               floor(sum(x) / count(*) * 1000000.0 + 0.5)::BIGINT AS e6
        FROM ux GROUP BY bucket, i),
      agg AS (
        SELECT bucket, array_to_string(list(e6 ORDER BY i), ',') AS centroid_fp
        FROM m GROUP BY bucket),
      cnt AS (SELECT bucket, count(*) AS n FROM assign GROUP BY bucket)
      SELECT c.bucket, c.n, a.centroid_fp
      FROM cnt c JOIN agg a USING (bucket)
      ORDER BY c.bucket"""))

  /** Int8 quantization of the whole embeddings table. The oracle
    * replays scale, every quantized component (via the md5 vector
    * fingerprint — exact int equality without shipping arrays), and
    * the reconstruction error folded in array order. */
  private val q94 = QueryDef(
    "q94_int8_quantization",
    (s, d) => {
      Similarity.quantizeInt8(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy(col("vec_id"))
    },
    Some("""
      WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
        FROM embeddings),
      sc AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        FROM e),
      q AS (
        SELECT vec_id, v, scale,
               CASE WHEN scale > 0.0
                 THEN list_transform(v, x -> floor(x / scale + 0.5)::INT)
                 ELSE list_transform(v, x -> 0) END AS qv
        FROM sc)
      SELECT vec_id, len(v) AS dim,
        floor(scale * 1000000.0 + 0.5) / 1000000.0 AS scale6,
        md5(array_to_string(qv, ',')) AS qhash,
        floor(list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(generate_series(1, len(v)),
              i -> (v[i] - qv[i]::DOUBLE * scale) * (v[i] - qv[i]::DOUBLE * scale))),
          (a, b) -> a + b) * 1000000.0 + 0.5) / 1000000.0 AS err6
      FROM q
      ORDER BY vec_id"""))

  /** Product-quantization ANN ([[Similarity.pqTopK]], Jégou TPAMI'11):
    * 4 subspaces × 16 dims, 8 codes each — the 64× compression + ADC
    * scale path for embedding corpora that outgrow exact scoring. The
    * oracle replays EVERYTHING: per-subspace seeding, two L2 k-means
    * iterations (half-up-6 means, ties to the lower code), corpus
    * encoding, the per-query ADC tables, and the subspace-ordered
    * left-fold score — every rank is integer-exact, every score
    * engine-exact to the rounded 4th decimal. */
  /** The q114/q115 shared oracle prefix: per-subspace PQ training (two
    * unrolled L2 k-means iterations over m=4 × 16-dim subspaces, ksub=8),
    * corpus encoding, and the per-pair ADC contribution list `sc`
    * (query_id, corpus_id, tt ordered by subspace) — byte-identical SQL
    * in both queries, so the compressed-domain pipeline is verified once
    * and the two diverge only in how they rank. */
  /** The PQ pipeline WITHOUT the e/n normalization head, with
    * iteration CTEs prefixed `p` — composable after [[lloydK8I2Ctes]]
    * (which supplies identical e/n and its own a1/m1/l1/a2/m2/l2) in
    * q119's IVF-PQ oracle. */
  private val pqM4K8I2CtesTail = """subs AS (SELECT unnest(generate_series(0, 3)) AS sub),
      sv AS (
        SELECT vec_id, sub, nv[sub * 16 + 1:(sub + 1) * 16] AS v
        FROM n CROSS JOIN subs),
      seedrows AS (
        SELECT row_number() OVER (
            ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
          ) - 1 AS cid, nv
        FROM (SELECT vec_id, nv FROM n
              ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::UBIGINT::BIGINT, vec_id
              LIMIT 8)),
      b0 AS (
        SELECT s.sub, r.cid, r.nv[s.sub * 16 + 1:(s.sub + 1) * 16] AS cv
        FROM seedrows r CROSS JOIN subs s),
      pa1 AS (
        SELECT vec_id, sub, v, cid FROM (
          SELECT sv.vec_id, sv.sub, sv.v, b.cid,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                   ORDER BY list_dot_product(sv.v, b.cv)
                            - list_dot_product(b.cv, b.cv) / 2.0 DESC,
                          b.cid ASC) AS rn
          FROM sv JOIN b0 b ON b.sub = sv.sub) t WHERE rn = 1),
      pm1 AS (
        SELECT sub, cid, i, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS r
        FROM (SELECT sub, cid, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM pa1)
        GROUP BY sub, cid, i),
      pl1 AS (SELECT sub, cid, list(r ORDER BY i) AS rv FROM pm1 GROUP BY sub, cid),
      b1 AS (
        SELECT b.sub, b.cid, COALESCE(l.rv, b.cv) AS cv
        FROM b0 b LEFT JOIN pl1 l ON l.sub = b.sub AND l.cid = b.cid),
      pa2 AS (
        SELECT vec_id, sub, v, cid FROM (
          SELECT sv.vec_id, sv.sub, sv.v, b.cid,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                   ORDER BY list_dot_product(sv.v, b.cv)
                            - list_dot_product(b.cv, b.cv) / 2.0 DESC,
                          b.cid ASC) AS rn
          FROM sv JOIN b1 b ON b.sub = sv.sub) t WHERE rn = 1),
      pm2 AS (
        SELECT sub, cid, i, floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS r
        FROM (SELECT sub, cid, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM pa2)
        GROUP BY sub, cid, i),
      pl2 AS (SELECT sub, cid, list(r ORDER BY i) AS rv FROM pm2 GROUP BY sub, cid),
      b2 AS (
        SELECT b.sub, b.cid, COALESCE(l.rv, b.cv) AS cv
        FROM b1 b LEFT JOIN pl2 l ON l.sub = b.sub AND l.cid = b.cid),
      codes AS (
        SELECT vec_id, sub, cid FROM (
          SELECT sv.vec_id, sv.sub, b.cid,
                 row_number() OVER (PARTITION BY sv.vec_id, sv.sub
                   ORDER BY list_dot_product(sv.v, b.cv)
                            - list_dot_product(b.cv, b.cv) / 2.0 DESC,
                          b.cid ASC) AS rn
          FROM sv JOIN b2 b ON b.sub = sv.sub) t WHERE rn = 1),
      parts AS (
        SELECT qs.vec_id AS query_id, cd.vec_id AS corpus_id, cd.sub,
               list_dot_product(qs.v, b.cv) AS t
        FROM codes cd
        JOIN b2 b ON b.sub = cd.sub AND b.cid = cd.cid
        JOIN sv qs ON qs.sub = cd.sub
        WHERE qs.vec_id < 10 AND cd.vec_id <> qs.vec_id),
      sc AS (
        SELECT query_id, corpus_id, list(t ORDER BY sub) AS tt
        FROM parts GROUP BY 1, 2)"""

  private val pqM4K8I2Ctes = s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      $pqM4K8I2CtesTail"""

  private val q114 = QueryDef(
    "q114_ann_pq_adc",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.pqTopK(queries, emb, "vec_id", "embedding", k = 5,
          m = 4, ksub = 8, iters = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("score"), 4).as("ip4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $pqM4K8I2Ctes,
      ranked AS (
        SELECT query_id, corpus_id,
               ((tt[1] + tt[2]) + tt[3]) + tt[4] AS ip,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY ((tt[1] + tt[2]) + tt[3]) + tt[4] DESC NULLS LAST,
                          corpus_id ASC) AS rank
        FROM sc)
      SELECT query_id, rank, corpus_id,
             floor(ip * 10000.0 + 0.5) / 10000.0 AS ip4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** ADC shortlist + exact rerank ([[Similarity.pqTopKReranked]]) —
    * how a PQ index is actually served: the compressed domain
    * over-fetches k×overscan candidates, only the shortlist pays for
    * full-vector cosine, and the final ranking is EXACT. The oracle
    * replays the whole q114 compressed pipeline (shared CTE prefix),
    * cuts the rank-20 shortlist, and reranks it with exact dots. */
  private val q115 = QueryDef(
    "q115_ann_pq_rerank",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.pqTopKReranked(queries, emb, "vec_id", "embedding",
          k = 5, overscan = 4, m = 4, ksub = 8, iters = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $pqM4K8I2Ctes,
      adcranked AS (
        SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY ((tt[1] + tt[2]) + tt[3]) + tt[4] DESC NULLS LAST,
                          corpus_id ASC) AS rn
        FROM sc),
      shortlist AS (SELECT query_id, corpus_id FROM adcranked WHERE rn <= 20),
      exact AS (
        SELECT sl.query_id, sl.corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM shortlist sl
        JOIN n qn ON qn.vec_id = sl.query_id
        JOIN n cn ON cn.vec_id = sl.corpus_id),
      rr AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM rr WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** IVF-PQ end to end ([[Similarity.ivfPqTopK]]) — the index structure
    * a 100 TB ANN deployment actually serves: the Lloyd-trained coarse
    * quantizer (q101's codebook, shared CTE prefix) prunes the corpus
    * to nprobe cells, ADC scores ONLY the probed cells' byte codes
    * (q114's compressed pipeline, shared tail), and the exact rerank
    * touches only the k×overscan shortlist (q115's serving pattern).
    * Both halves were verified separately; this verifies the
    * COMPOSITION — probe selection restricting the ADC candidate set,
    * the in-cell shortlist cut, and the exact final ranking. */
  private val q119 = QueryDef(
    "q119_ann_ivf_pq",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.ivfPqTopK(queries, emb, "vec_id", "embedding", k = 5,
          nCentroids = 8, nprobe = 2, m = 4, ksub = 8, iters = 2,
          overscan = 4)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      $pqM4K8I2CtesTail,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c WHERE n.vec_id < 10) t WHERE rn <= 2),
      pairs AS (
        SELECT p.query_id, a.vec_id AS corpus_id
        FROM probes p JOIN assign a ON a.bucket = p.bucket
        WHERE a.vec_id <> p.query_id),
      iparts AS (
        SELECT pr.query_id, pr.corpus_id, cd.sub,
               list_dot_product(qs.v, b.cv) AS t
        FROM pairs pr
        JOIN codes cd ON cd.vec_id = pr.corpus_id
        JOIN b2 b ON b.sub = cd.sub AND b.cid = cd.cid
        JOIN sv qs ON qs.vec_id = pr.query_id AND qs.sub = cd.sub),
      isc AS (
        SELECT query_id, corpus_id, list(t ORDER BY sub) AS tt
        FROM iparts GROUP BY 1, 2),
      adcranked AS (
        SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY ((tt[1] + tt[2]) + tt[3]) + tt[4] DESC NULLS LAST,
                          corpus_id ASC) AS rn
        FROM isc),
      shortlist AS (SELECT query_id, corpus_id FROM adcranked WHERE rn <= 20),
      exact AS (
        SELECT sl.query_id, sl.corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM shortlist sl
        JOIN n qn ON qn.vec_id = sl.query_id
        JOIN n cn ON cn.vec_id = sl.corpus_id),
      rr AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM rr WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** SemDeDup ([[graft.operators.Dedup.semDedup]], Abbas et al. 2023):
    * semantic dedup inside the q101/q111 Lloyd-trained cells — exhaustive
    * near-dup search within each cell, min-id representative survives.
    * Threshold 0.4 is this corpus's q45 operating point (the synthetic
    * embeddings top out near cosine 0.51 pairwise; the paper's web-scale
    * τ ≈ 0.95). The oracle replays training (shared CTE prefix with
    * q101/q111), assignment, the within-cell pairwise search, and the
    * min-id keep rule. */
  private val q120 = QueryDef(
    "q120_semantic_dedup",
    (s, d) => {
      import graft.operators.{Dedup, IndexStore}
      Dedup.semDedup(Tables.embeddings(s, d), "vec_id", "embedding",
          threshold = 0.4, nCentroids = 8, iters = 2,
          index = IndexStore.Memory())
        .select(col("corpus_id").as("vec_id"), col("bucket"), col("kept"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      an AS (SELECT a.vec_id, a.bucket, n.nv FROM assign a JOIN n USING (vec_id)),
      drops AS (
        SELECT DISTINCT a.vec_id
        FROM an a JOIN an b ON a.bucket = b.bucket AND b.vec_id < a.vec_id
        WHERE list_dot_product(a.nv, b.nv) >= 0.4)
      SELECT a.vec_id, a.bucket,
             CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
      FROM assign a LEFT JOIN drops d USING (vec_id)
      ORDER BY a.vec_id"""))

  /** JL-projection serving path ([[Similarity.jlTopKReranked]]): reduce
    * 64-dim embeddings to 16 JL coordinates (md5 hyperplane family —
    * q51's planes), over-fetch top-20 in the reduced space, exact-rerank
    * the shortlist to top-5. The oracle replays the projection, the
    * reduced-space ranking, and the rerank — the full serving recipe. */
  private val q122 = QueryDef(
    "q122_ann_jl_rerank",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.jlTopKReranked(queries, emb, "vec_id", "embedding",
          k = 5, outDims = 16, overscan = 4, dims = Tables.embeddingDims)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      planes AS (
        SELECT j, list_transform(generate_series(0, 63), d ->
          CAST(('0x' || substr(md5(j::VARCHAR || ':' || d::VARCHAR), 1, 15))::UBIGINT::BIGINT
               % 2001 - 1000 AS DOUBLE)) AS w
        FROM (SELECT unnest(generate_series(0, 15)) AS j)),
      r AS (
        SELECT n.vec_id, list(list_dot_product(n.nv, p.w) ORDER BY p.j) AS rv
        FROM n, planes p GROUP BY n.vec_id),
      rn AS (
        SELECT vec_id, list_transform(rv, x -> x / sqrt(list_dot_product(rv, rv))) AS rnv
        FROM r),
      sc AS (
        SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               list_dot_product(q.rnv, c.rnv) AS rcos
        FROM rn q JOIN rn c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < 10),
      sl AS (
        SELECT query_id, corpus_id FROM (
          SELECT query_id, corpus_id,
                 row_number() OVER (PARTITION BY query_id
                   ORDER BY rcos DESC NULLS LAST, corpus_id ASC) AS rr
          FROM sc) t WHERE rr <= 20),
      exact AS (
        SELECT sl.query_id, sl.corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM sl
        JOIN n qn ON qn.vec_id = sl.query_id
        JOIN n cn ON cn.vec_id = sl.corpus_id),
      rk AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM exact)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM rk WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for 10 anchor
    * vectors, the top-5 nearest corpus vectors with a DIFFERENT label —
    * the near-but-wrong shortlist contrastive training mines. The
    * oracle replays normalization, the label-exclusion predicate inside
    * the scan join, and the ranking. */
  private val q124 = QueryDef(
    "q124_hard_negatives",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.hardNegatives(queries, emb, "vec_id", "embedding",
          "label", k = 5)
        .select(col("query_id"), col("q_label"), col("rank"),
          col("corpus_id"), col("n_label"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, label,
               list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      scored AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS corpus_id, c.label AS n_label,
               list_dot_product(q.nv, c.nv) AS cosine
        FROM n q JOIN n c
          ON q.vec_id <> c.vec_id AND q.label <> c.label
        WHERE q.vec_id < 10),
      ranked AS (
        SELECT query_id, q_label, corpus_id, n_label, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, q_label, rank, corpus_id, n_label,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Semantic decontamination
    * ([[graft.operators.Contamination.semantic]]): training vectors
    * within cosine 0.4 of ANY eval vector (vec_id < 50) in the same
    * q101-trained Lloyd cell are flagged — the embedding-space sibling
    * of the q85/q109 n-gram decontamination, catching paraphrased
    * leakage that shares no fingerprint. The oracle replays training
    * (shared CTE prefix), both assignments, the within-cell train×eval
    * comparison, and the keep rule. */
  private val q125 = QueryDef(
    "q125_semantic_decontamination",
    (s, d) => {
      import graft.operators.{Contamination, IndexStore}
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2)
      Contamination.semantic(
          emb.filter(col("vec_id") >= 50), emb.filter(col("vec_id") < 50),
          "vec_id", "embedding", cents, threshold = 0.4,
          index = IndexStore.Memory())
        .select(col("corpus_id").as("vec_id"), col("bucket"), col("kept"))
        .orderBy(col("vec_id"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      an AS (SELECT a.vec_id, a.bucket, n.nv FROM assign a JOIN n USING (vec_id)),
      tr AS (SELECT * FROM an WHERE vec_id >= 50),
      ev AS (SELECT * FROM an WHERE vec_id < 50),
      drops AS (
        SELECT DISTINCT t.vec_id
        FROM tr t JOIN ev e ON t.bucket = e.bucket
        WHERE list_dot_product(t.nv, e.nv) >= 0.4)
      SELECT t.vec_id, t.bucket,
             CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS kept
      FROM tr t LEFT JOIN drops d USING (vec_id)
      ORDER BY t.vec_id"""))

  /** Per-dimension z-scoring ([[Similarity.standardize]]): corpus μ/σ
    * per dimension from one mergeable aggregate (rounded half-up-6, the
    * q87/q101 float-summation discipline), then a shuffle-free melted
    * projection. The oracle recomputes every coordinate. */
  private val q130 = QueryDef(
    "q130_embedding_standardize",
    (s, d) => {
      Similarity.standardize(Tables.embeddings(s, d), "vec_id", "embedding",
          dims = Tables.embeddingDims)
        .select(col("corpus_id").as("vec_id"), col("i"),
          Rnd.halfUp(col("z"), 4).as("z4"))
        .orderBy(col("vec_id"), col("i"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      u AS (
        SELECT vec_id, generate_subscripts(v, 1) AS i, unnest(v) AS x
        FROM e),
      st AS (
        SELECT i,
               floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS mu,
               floor(avg(x * x) * 1000000.0 + 0.5) / 1000000.0 AS m2
        FROM u GROUP BY i),
      sg AS (
        SELECT i, mu,
               floor(sqrt(greatest(m2 - mu * mu, 0.0)) * 1000000.0 + 0.5)
                 / 1000000.0 AS sig
        FROM st)
      SELECT u.vec_id, u.i,
             CASE WHEN sg.sig = 0.0 THEN 0.0
                  ELSE floor((u.x - sg.mu) / sg.sig * 10000.0 + 0.5) / 10000.0
             END AS z4
      FROM u JOIN sg USING (i)
      ORDER BY u.vec_id, u.i"""))

  /** MMR-diversified top-k serving ([[Similarity.mmrTopK]], Carbonell &
    * Goldstein SIGIR'98): exact cosine shortlist (the q50 plan), then
    * the greedy λ=0.5 relevance-vs-redundancy selection. The oracle
    * replays the ENTIRE loop as a recursive CTE — shortlist ranking,
    * per-step argmax over score = 0.5·rel − 0.5·max-sim-to-picked, id
    * tie-break — so the selection ORDER is verified, not just the set.
    * λ must be binary-exact for the raw-double argmax to agree across
    * engines (the operator's determinism contract). */
  private val q135 = QueryDef(
    "q135_mmr_diversified_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.mmrTopK(queries, emb, "vec_id", "embedding",
          k = 8, shortlist = 16, lambda = 0.5)
        .select(col("query_id"), col("sel_rank"), col("corpus_id"),
          Rnd.halfUp(col("rel"), 4).as("rel4"))
        .orderBy(col("query_id"), col("sel_rank"))
    },
    Some("""
      WITH RECURSIVE
      e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      q AS (SELECT vec_id AS query_id, nv AS qv FROM n WHERE vec_id < 10),
      scored AS (
        SELECT q.query_id, c.vec_id AS corpus_id,
               list_dot_product(q.qv, c.nv) AS rel, c.nv
        FROM n c CROSS JOIN q WHERE q.query_id <> c.vec_id),
      cand AS (
        SELECT query_id, corpus_id, rel, nv FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                      ORDER BY rel DESC, corpus_id ASC) AS rk
          FROM scored) WHERE rk <= 16),
      psim AS (
        SELECT a.query_id, a.corpus_id AS ci, b.corpus_id AS cj,
               list_dot_product(a.nv, b.nv) AS s
        FROM cand a JOIN cand b
          ON a.query_id = b.query_id AND a.corpus_id <> b.corpus_id),
      st AS (
        SELECT query_id, 0 AS step, CAST([] AS BIGINT[]) AS picked
        FROM (SELECT DISTINCT query_id FROM cand)
        UNION ALL
        SELECT query_id, step + 1, list_append(picked, corpus_id) FROM (
          SELECT s.query_id, s.step, s.picked, c.corpus_id,
                 0.5 * any_value(c.rel)
                   - 0.5 * coalesce(max(CASE WHEN list_contains(s.picked, p.cj)
                                             THEN p.s END), 0.0) AS score
          FROM st s
          JOIN cand c ON c.query_id = s.query_id
                     AND NOT list_contains(s.picked, c.corpus_id)
          LEFT JOIN psim p ON p.query_id = s.query_id AND p.ci = c.corpus_id
          WHERE s.step < 8
          GROUP BY s.query_id, s.step, s.picked, c.corpus_id
          QUALIFY row_number() OVER (PARTITION BY s.query_id, s.step
                    ORDER BY score DESC, c.corpus_id ASC) = 1)),
      fin AS (
        SELECT query_id, picked FROM st
        QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY step DESC) = 1),
      sel AS (
        SELECT query_id, unnest(picked) AS corpus_id,
               unnest(generate_series(1, len(picked))) AS sel_rank
        FROM fin)
      SELECT s.query_id, s.sel_rank, s.corpus_id,
             floor(c.rel * 10000.0 + 0.5) / 10000.0 AS rel4
      FROM sel s JOIN cand c
        ON c.query_id = s.query_id AND c.corpus_id = s.corpus_id
      ORDER BY s.query_id, s.sel_rank"""))

  /** Cluster labeling by class-based TF-IDF
    * ([[graft.operators.TextAnalysis.classTfidf]], the c-TF-IDF of
    * BERTopic): Lloyd-trained semantic cells over the embeddings (the
    * q101/q111 shared training replay, byte-identical CTE prefix),
    * documents joined to their cell, and each cell labeled by its top-5
    * distinguishing terms — tf·ln(1 + A/f_t), exact-integer counts, one
    * scalar A. The oracle replays training, assignment, tokenization,
    * both count tables, and the ranked weights. */
  private val q136 = QueryDef(
    "q136_cluster_labels_ctfidf",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val assigned = Similarity.ivfAssignTrained(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val joined = assigned.select(col("corpus_id"), col("bucket"))
        .join(docs, col("corpus_id") === col("doc_id"))
      graft.operators.TextAnalysis.classTfidf(joined, "bucket", "text",
          topN = 5)
        .select(col("cluster"), col("rank"), col("term"), col("tf"),
          Rnd.halfUp(col("weight"), 6).as("w6"))
        .orderBy(col("cluster"), col("rank"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      dt AS (
        SELECT a.bucket AS cluster, t.term
        FROM assign a JOIN (
          SELECT doc_id,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS term
          FROM documents) t ON t.doc_id = a.vec_id),
      ctf AS (
        SELECT cluster, term, count(*) AS tf FROM dt GROUP BY cluster, term),
      tot AS (
        SELECT CAST(sum(tf) AS DOUBLE) / CAST(count(DISTINCT cluster) AS DOUBLE) AS a
        FROM ctf),
      ft AS (SELECT term, CAST(sum(tf) AS BIGINT) AS ft FROM ctf GROUP BY term),
      wtd AS (
        SELECT c.cluster, c.term, c.tf,
               CAST(c.tf AS DOUBLE) *
                 ln(1.0 + (SELECT a FROM tot) / CAST(f.ft AS DOUBLE)) AS weight
        FROM ctf c JOIN ft f USING (term)),
      ranked AS (
        SELECT cluster, term, tf, weight,
               row_number() OVER (PARTITION BY cluster
                 ORDER BY weight DESC, term ASC) AS rank
        FROM wtd)
      SELECT cluster, rank, term, tf,
             floor(weight * 1000000.0 + 0.5) / 1000000.0 AS w6
      FROM ranked WHERE rank <= 5
      ORDER BY cluster, rank"""))

  /** Margin-based bitext mining ([[Similarity.marginMining]], Artetxe &
    * Schwenk ACL'19): best es-match per en-doc by margin — cosine over
    * the mean of each side's top-4 neighborhood, the hub-suppressing
    * score CCMatrix mines with. Neighborhood means are exact integer
    * micro-cosine sums, so only the final margin DAG is float; the
    * oracle replays pairs, both rank directions, the means, and the
    * best-match argmax. */
  private val q145 = QueryDef(
    "q145_bitext_margin_mining",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val langs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val withLang = emb.join(langs, emb("vec_id") === langs("doc_id"))
      val en = withLang.filter(col("lang") === "en").select(col("vec_id"), col("embedding"))
      val es = withLang.filter(col("lang") === "es").select(col("vec_id"), col("embedding"))
      Similarity.marginMining(en, es, "vec_id", "embedding",
          k = 4, threshold = 1.0)
        .select(col("a_id").as("en_id"), col("b_id").as("es_id"),
          Rnd.halfUp(col("cos"), 4).as("cos4"),
          Rnd.halfUp(col("margin"), 6).as("margin6"))
        .orderBy(col("en_id"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      n AS (
        SELECT vec_id, list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS nv
        FROM e),
      dl AS (SELECT doc_id, lang FROM documents),
      av AS (
        SELECT n.vec_id AS a_id, n.nv AS v
        FROM n JOIN dl ON dl.doc_id = n.vec_id WHERE dl.lang = 'en'),
      bv AS (
        SELECT n.vec_id AS b_id, n.nv AS v
        FROM n JOIN dl ON dl.doc_id = n.vec_id WHERE dl.lang = 'es'),
      p AS (
        SELECT a.a_id, b.b_id, list_dot_product(a.v, b.v) AS cos,
               CAST(floor(list_dot_product(a.v, b.v) * 1000000.0 + 0.5) AS BIGINT) AS c6
        FROM av a CROSS JOIN bv b),
      ra AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY a_id
            ORDER BY cos DESC, b_id ASC) AS rka FROM p) WHERE rka <= 4),
      rb AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY b_id
            ORDER BY cos DESC, a_id ASC) AS rkb FROM p) WHERE rkb <= 4),
      aa AS (SELECT a_id, CAST(sum(c6) AS BIGINT) AS sa, count(*) AS na
             FROM ra GROUP BY a_id),
      bb AS (SELECT b_id, CAST(sum(c6) AS BIGINT) AS sb, count(*) AS nb
             FROM rb GROUP BY b_id),
      m AS (
        SELECT r.a_id, r.b_id, r.cos,
               r.cos / ((CAST(aa.sa AS DOUBLE) / (CAST(aa.na AS DOUBLE) * 1000000.0)
                       + CAST(bb.sb AS DOUBLE) / (CAST(bb.nb AS DOUBLE) * 1000000.0))
                       / 2.0) AS margin
        FROM ra r JOIN aa USING (a_id) JOIN bb USING (b_id)),
      f AS (SELECT * FROM m WHERE margin >= 1.0)
      SELECT a_id AS en_id, b_id AS es_id,
             floor(cos * 10000.0 + 0.5) / 10000.0 AS cos4,
             floor(margin * 1000000.0 + 0.5) / 1000000.0 AS margin6
      FROM f
      QUALIFY row_number() OVER (PARTITION BY a_id
        ORDER BY margin DESC, b_id ASC) = 1
      ORDER BY en_id"""))

  /** ANN INDEX AS A VERSIONED TABLE ARTIFACT
    * ([[Similarity.ivfSave]]/[[Similarity.ivfLoad]] — the similarity
    * family's `bpeSave`): the Lloyd-trained codebook is persisted as
    * one atomic commit on an ACID table, loaded back by version, and
    * SERVING assigns every corpus vector with the LOADED codebook
    * ([[Similarity.ivfAssignWith]], plan-literal centroids) — training
    * and serving decoupled into separate jobs with a time-travelable
    * index. The in-query REQUIRE pins the artifact guarantee (loaded ≡
    * trained, ordered, element-exact); the oracle replays the q101
    * Lloyd training (shared CTE prefix) and the assignment — any
    * save→load corruption (ordering, truncation, element drift) breaks
    * the hash. */
  private val q182 = QueryDef(
    "q182_ann_index_artifact",
    (s, d) => {
      val path = s"/tmp/graft_ivf_index_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2)
      val v = Similarity.ivfSave(s, cents, path)
      val loaded = Similarity.ivfLoad(s, path, Some(v))
      require(loaded.size == cents.size &&
        loaded.zip(cents).forall { case ((li, lv), (ti, tv)) =>
          li == ti && lv.sameElements(tv) },
        "the loaded codebook must be the trained codebook, ordered and " +
          "element-exact")
      Similarity.ivfAssignWith(emb, "vec_id", "embedding", loaded)
        .select(col("corpus_id").as("vec_id"), col("bucket"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1)
      SELECT vec_id, bucket FROM assign ORDER BY vec_id"""))

  /** EMBEDDING-DISTRIBUTION DRIFT between two corpus versions against a
    * PINNED codebook ([[Similarity.embeddingDrift]] — the semantic-space
    * counterpart of q138's token JS drift, and the payoff of the q182
    * artifact: per-cell mass is only comparable across versions when
    * both assign with the SAME centroids). Corpus B is a deterministic
    * re-curation of A (every third vector dropped); the result is one
    * row per codebook cell with raw counts, half-up-6 shares, and the
    * absolute share drift whose half-sum is the total-variation
    * distance. The oracle replays the q101 Lloyd CTEs, both
    * assignments (B's as the subset restriction — same codebook, so
    * the subset's assignment IS the restricted assignment), and the
    * share arithmetic verbatim. */
  private val q183 = QueryDef(
    "q183_embedding_drift",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2)
      val curated = emb.filter(col("vec_id") % 3 =!= 0)
      Similarity.embeddingDrift(emb, curated, "vec_id", "embedding", cents)
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign_a AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      assign_b AS (SELECT vec_id, bucket FROM assign_a WHERE vec_id % 3 <> 0),
      ca AS (SELECT bucket, count(*) AS n_a FROM assign_a GROUP BY 1),
      cb AS (SELECT bucket, count(*) AS n_b FROM assign_b GROUP BY 1),
      tot AS (SELECT (SELECT count(*) FROM assign_a)::DOUBLE AS ta,
                     (SELECT count(*) FROM assign_b)::DOUBLE AS tb),
      cells AS (SELECT cid AS bucket FROM c2)
      SELECT cells.bucket,
             coalesce(ca.n_a, 0) AS n_a,
             coalesce(cb.n_b, 0) AS n_b,
             floor(coalesce(ca.n_a, 0)::DOUBLE / ta * 1000000.0 + 0.5)
               / 1000000.0 AS share_a6,
             floor(coalesce(cb.n_b, 0)::DOUBLE / tb * 1000000.0 + 0.5)
               / 1000000.0 AS share_b6,
             floor(abs(coalesce(ca.n_a, 0)::DOUBLE / ta
                       - coalesce(cb.n_b, 0)::DOUBLE / tb) * 1000000.0 + 0.5)
               / 1000000.0 AS drift6
      FROM cells LEFT JOIN ca USING (bucket) LEFT JOIN cb USING (bucket)
      CROSS JOIN tot
      ORDER BY bucket"""))

  /** ANN SERVING from the LOADED index artifact
    * ([[Similarity.ivfTopKWith]] public overload — the search half of
    * the q182 round-trip, closing its assignment-only gap): train,
    * [[Similarity.ivfSave]], [[Similarity.ivfLoad]] the exact version,
    * then run the FULL nprobe top-k search against the loaded codebook.
    * The query REQUIREs — in-query — that the loaded-artifact search is
    * row-identical to a fresh in-memory-trained search (training is
    * deterministic, so any drift means the artifact round-trip lost
    * precision); the oracle is q101's replay (Lloyd CTEs + assignment +
    * probe + ranking) — the SAME final ranking, reached through the
    * persisted codebook. */
  private val q185 = QueryDef(
    "q185_ann_index_serving",
    (s, d) => {
      val path = s"/tmp/graft_ivf_serve_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        nCentroids = 8, iters = 2)
      val v = Similarity.ivfSave(s, cents, path)
      val loaded = Similarity.ivfLoad(s, path, Some(v))
      val served = Similarity.ivfTopKWith(queries, emb, "vec_id",
          "embedding", k = 5, loaded, nprobe = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
      val retrained = Similarity.ivfTopKTrained(queries, emb, "vec_id",
          "embedding", k = 5, nCentroids = 8, nprobe = 2, iters = 2)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
      require(served.except(retrained).isEmpty &&
        retrained.except(served).isEmpty,
        "the loaded-artifact search must be row-identical to the " +
          "in-memory-trained search")
      served.orderBy(col("query_id"), col("rank"))
    },
    Some(s"""
      WITH $lloydK8I2Ctes,
      assign AS (
        SELECT vec_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c) t WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, bucket FROM (
          SELECT n.vec_id, c.cid AS bucket,
                 row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
          FROM n, c2 c WHERE n.vec_id < 10) t WHERE rn <= 2),
      scored AS (
        SELECT p.query_id, a.vec_id AS corpus_id,
               list_dot_product(qn.nv, cn.nv) AS cosine
        FROM probes p
        JOIN assign a ON a.bucket = p.bucket
        JOIN n qn ON qn.vec_id = p.query_id
        JOIN n cn ON cn.vec_id = a.vec_id
        WHERE a.vec_id <> p.query_id),
      ranked AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** Cluster-quality gate over the SAME Lloyd-trained cells as
    * q101/q111 (shared oracle prefix): per populated cell the
    * simplified-silhouette mean, cosine scatter, and Davies-Bouldin
    * term — the "is this clustering good enough to curate with?" check
    * that runs before SemDeDup or cluster-balanced sampling trusts the
    * cells. The oracle replays training, both distance ranks (own +
    * nearest-other centroid), the per-cell means, and the K×K DB max
    * over the rounded values. */
  private val q190 = QueryDef(
    "q190_cluster_quality",
    (s, d) => Similarity.clusterQuality(Tables.embeddings(s, d),
        "vec_id", "embedding", nCentroids = 8, iters = 2)
      .orderBy(col("bucket")),
    Some(s"""
      WITH $lloydK8I2Ctes,
      scored AS (
        SELECT n.vec_id, c.cid, list_dot_product(n.nv, c.cv) AS d,
               row_number() OVER (PARTITION BY n.vec_id
                 ORDER BY list_dot_product(n.nv, c.cv) DESC, c.cid ASC) AS rn
        FROM n, c2 c),
      own AS (SELECT vec_id, cid AS bucket, 1.0 - d AS a_dist
              FROM scored WHERE rn = 1),
      nxt AS (SELECT vec_id, 1.0 - d AS b_dist FROM scored WHERE rn = 2),
      pt AS (
        SELECT o.vec_id, o.bucket, o.a_dist, x.b_dist,
               CASE WHEN greatest(o.a_dist, x.b_dist) > 0.0
                    THEN (x.b_dist - o.a_dist) / greatest(o.a_dist, x.b_dist)
                    ELSE 0.0 END AS sil
        FROM own o JOIN nxt x USING (vec_id)),
      cell AS (
        SELECT bucket, count(*) AS n,
               floor(avg(sil) * 1000000.0 + 0.5) / 1000000.0 AS mean_sil6,
               floor(avg(a_dist) * 1000000.0 + 0.5) / 1000000.0 AS scatter6
        FROM pt GROUP BY bucket),
      cdist AS (
        SELECT a.cid AS bucket, b.cid AS other,
               floor((1.0 - list_dot_product(a.cv, b.cv)) * 1000000.0 + 0.5)
                 / 1000000.0 AS m6
        FROM c2 a, c2 b WHERE a.cid <> b.cid),
      db AS (
        SELECT i.bucket,
               max(floor((i.scatter6 + j.scatter6) / d.m6 * 1000000.0 + 0.5)
                 / 1000000.0) AS db6
        FROM cell i
        JOIN cdist d ON d.bucket = i.bucket
        JOIN cell j ON j.bucket = d.other
        WHERE d.m6 > 0.0
        GROUP BY i.bucket)
      SELECT c.bucket, c.n, c.mean_sil6, c.scatter6, db.db6
      FROM cell c LEFT JOIN db USING (bucket)
      ORDER BY c.bucket"""))

  override val entries: Seq[QueryDef] =
    Seq(q50, q51, q52, q87, q94, q101, q111, q114, q115, q119, q120, q122,
      q124, q125, q130, q135, q136, q145, q182, q183, q185, q190)
}
