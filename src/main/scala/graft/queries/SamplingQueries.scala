package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Sampling
import graft.queries.Handoff.HandoffOps
import org.apache.spark.sql.functions._

/** Deterministic sampling / split / mixture-weighting surface (see
  * operators/Sampling.scala). Membership is a pure function of
  * (salt, id) via the md5-derived 60-bit coordinate, so the oracle
  * replays EXACT per-row membership — both engines agree on every kept
  * and dropped row, not just on aggregate rates. Thresholds are long
  * literals computed driver-side with the same IEEE accumulation order
  * spelled out in the SQL. */
object SamplingQueries extends QueryModule {

  /** Train/val/test split (0.8/0.1/0.1) + per-language mixture rates
    * over the full documents table: the two decisions use independent
    * salts so split and keep don't correlate. Shuffle-free: one scan,
    * filter/projection only (the final orderBy is presentation). */
  private val q83 = QueryDef(
    "q83_sample_split_mixture",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val withSplit = Sampling.split(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Sampling.mixture(withSplit, "doc_id", "lang",
          Map("en" -> 0.5, "es" -> 0.25, "fr" -> 0.75, "zh" -> 1.0),
          defaultRate = 0.1, keepCol = "kept")
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id, lang,
          ('0x' || substr(md5('graft|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h,
          ('0x' || substr(md5('graft-mix|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS hm
        FROM documents)
      SELECT doc_id, lang,
        CASE WHEN h < 922337203685477632 THEN 'train'
             WHEN h < 1037629354146162304 THEN 'val'
             ELSE 'test' END AS split,
        CASE WHEN hm < (CASE lang
              WHEN 'en' THEN 576460752303423488
              WHEN 'es' THEN 288230376151711744
              WHEN 'fr' THEN 864691128455135232
              WHEN 'zh' THEN 1152921504606846976
              ELSE 115292150460684704 END)
             THEN 1 ELSE 0 END AS kept
      FROM c
      ORDER BY doc_id"""))

  /** Decontamination: test-split documents sharing ≥2 winnowing
    * fingerprints with train-split documents, per-test-doc rollup.
    * Composes the deterministic split (q83's thresholds) with passage
    * fingerprints (q63's winnowing) — both replayed identically in the
    * oracle, so the contamination REPORT itself is verified: every
    * (test doc, #train contacts, max/sum shared) row hash-matches. */
  private val q85 = QueryDef(
    "q85_contamination",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val withSplit = Sampling.split(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      // NoStore + rollingHash: once WinnowRolling made the fingerprint
      // pass a tight O(n) loop, recomputing it per consumer beats any
      // materialization — measured at sf1-equivalent: 11.8 s (md5 HOF +
      // Memory persist) → 3.06 s (native winnow + Memory) → 1.84 s
      // (native winnow recomputed, nothing persisted). The detection
      // semantics are unchanged and the oracle replays the polynomial
      // exactly (the q64/q65 contract). Memory/Path remain the right
      // stores when the index feeds MANY queries, not three subtrees.
      graft.operators.Contamination
        .detect(withSplit, "doc_id", "text", "split",
          minShared = 2, maxDf = 50, k = 8, w = 4,
          index = graft.operators.IndexStore.NoStore,
          minParallelism = s.sparkContext.defaultParallelism,
          rollingHash = true)
        .orderBy(col("test_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7), i ->
                 CAST(list_sum(list_transform(generate_series(0, 7), j ->
                   unicode(substr(text, i + j, 1)) * CAST(31 ** (7 - j) AS BIGINT)))
                   % 1000000007 AS BIGINT)) AS grams
        FROM documents),
      wnd AS (
        SELECT doc_id,
               list_sort(list_distinct(CASE WHEN len(grams) >= 4
                 THEN list_transform(generate_series(1, len(grams) - 3),
                      j -> list_min(grams[j:j+3]))
                 ELSE [list_min(grams)] END)) AS wn
        FROM g WHERE len(grams) > 0),
      fp AS (SELECT doc_id, unnest(wn) AS f FROM wnd),
      sp AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('graft|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
                         < 922337203685477632 THEN 'train'
                    WHEN ('0x' || substr(md5('graft|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
                         < 1037629354146162304 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
      pruned AS (SELECT f FROM fp GROUP BY f HAVING count(*) <= 50),
      fps AS (
        SELECT fp.doc_id, fp.f, sp.split
        FROM fp JOIN sp USING (doc_id) JOIN pruned USING (f)),
      pairs AS (
        SELECT te.doc_id AS test_id, tr.doc_id AS train_id, count(*) AS shared
        FROM fps te JOIN fps tr ON te.f = tr.f
        WHERE te.split = 'test' AND tr.split = 'train'
        GROUP BY te.doc_id, tr.doc_id
        HAVING count(*) >= 2)
      SELECT test_id, count(*) AS n_train_docs,
             max(shared) AS max_shared, sum(shared)::BIGINT AS sum_shared
      FROM pairs GROUP BY test_id
      ORDER BY test_id"""))

  /** Exact-n stratified sample: 50 documents per language, smallest
    * hash coordinates first. The Spark side never sorts a stratum in a
    * single task (oversample-filter, then rank only the O(n) candidates);
    * the oracle replays the NAIVE full-stratum window — selection must
    * be row-identical, which proves the candidate filter only dropped
    * rows that could never rank ≤ n. */
  private val q92 = QueryDef(
    "q92_stratified_sample",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      Sampling.stratified(docs, "doc_id", "lang", n = 50)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id, lang,
          ('0x' || substr(md5('graft-strat|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM documents),
      r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
        FROM c)
      SELECT doc_id, lang FROM r WHERE rk <= 50
      ORDER BY doc_id"""))

  /** Deterministic global shuffle order over the documents table. The
    * Spark side never runs a single-partition rank (coordinate-bucketed
    * two-phase rank); the oracle replays the naive global window —
    * positions must be identical, a bijection onto [0, N). */
  private val q95 = QueryDef(
    "q95_shuffle_order",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      Sampling.shuffleOrder(docs, "doc_id")
        .select(col("doc_id"), col("shuffle_pos"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id,
          ('0x' || substr(md5('graft-shuf|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM documents)
      SELECT doc_id,
             row_number() OVER (ORDER BY h, doc_id) - 1 AS shuffle_pos
      FROM c
      ORDER BY doc_id"""))

  /** Leakage-safe entity-level split: customers are split by their OWN
    * key, orders inherit the split through the join — every row of an
    * entity lands in the same split by construction (the "split the
    * users, not the events" rule; splitting orders directly would leak
    * a customer's behavior across train and test). Money sums in exact
    * integer cents, so the rollup is hash-stable. */
  private val q97 = QueryDef(
    "q97_group_split",
    (s, d) => {
      val cust = Sampling.split(
        Tables.customer(s, d).select(col("c_custkey")), "c_custkey",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val orders = Tables.orders(s, d).select(col("o_custkey"), col("o_totalprice"))
      cust.join(orders, col("c_custkey") === col("o_custkey"))
        .groupBy(col("split"))
        .agg(count_distinct(col("c_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          sum(floor(col("o_totalprice") * lit(100.0) + lit(0.5)).cast("long"))
            .as("revenue_cents"))
        .orderBy(col("split"))
    },
    Some("""
      WITH c AS (
        SELECT c_custkey,
          CASE WHEN h < 922337203685477632 THEN 'train'
               WHEN h < 1037629354146162304 THEN 'val'
               ELSE 'test' END AS split
        FROM (SELECT c_custkey,
                ('0x' || substr(md5('graft|' || c_custkey::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
              FROM customer))
      SELECT split, count(DISTINCT c_custkey) AS n_customers,
             count(*) AS n_orders,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))::BIGINT AS revenue_cents
      FROM c JOIN orders ON c_custkey = o_custkey
      GROUP BY split
      ORDER BY split"""))

  /** Export sharding: the documents table in deterministic shuffle
    * order, cut into 16 balanced shards; per-shard rollup (sizes differ
    * by ≤1, positions contiguous). Integer-only output. */
  private val q98 = QueryDef(
    "q98_export_shards",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"))
      Sampling.exportShards(docs, "doc_id", nShards = 16)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("shuffle_pos")).as("min_pos"),
          max(col("shuffle_pos")).as("max_pos"))
        .orderBy(col("shard"))
    },
    Some("""
      WITH c AS (
        SELECT doc_id,
          ('0x' || substr(md5('graft-shuf|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM documents),
      p AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY h, doc_id) - 1 AS pos,
               count(*) OVER () AS n
        FROM c)
      SELECT CAST(pos * 16 // n AS INT) AS shard,
             count(*) AS n_rows,
             min(pos) AS min_pos,
             max(pos) AS max_pos
      FROM p
      GROUP BY 1
      ORDER BY shard"""))

  /** Temperature-reweighted source mixture (α = 0.5, base 0.5): rates
    * are derived from per-source counts — min(1, 0.5·(n/n_max)^-0.5),
    * rounded half-up-6 so libm pow ulps can't flip a threshold — and
    * the oracle recomputes counts, rates, and the integer thresholds
    * itself (floor(), matching Scala's toLong truncation), then replays
    * per-row membership. The DATA-DERIVED rate path is verified, not a
    * hand-copied rate map. */
  private val q103 = QueryDef(
    "q103_temperature_mixture",
    (s, d) => {
      Sampling.temperature(Tables.documents(s, d).select(col("doc_id"), col("source")),
          "doc_id", "source", alpha = 0.5, baseRate = 0.5)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH cnt AS (
        SELECT source, count(*) AS n FROM documents
        WHERE source IS NOT NULL GROUP BY source),
      mx AS (SELECT max(n) AS nmax FROM cnt),
      th AS (
        SELECT source,
               CAST(floor(
                 (floor(least(1.0, 0.5 * pow(n / nmax, -0.5)) * 1000000.0 + 0.5)
                   / 1000000.0) * 1152921504606846976.0) AS BIGINT) AS thr
        FROM cnt, mx)
      SELECT d.doc_id, d.source,
             CASE WHEN t.thr IS NOT NULL AND
                  ('0x' || substr(md5('graft-temp|' || d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT < t.thr
                  THEN 1 ELSE 0 END AS kept
      FROM documents d LEFT JOIN th t USING (source)
      ORDER BY d.doc_id"""))

  /** Score-ranked per-group cap ("best N per domain"): top-10 orders
    * per order priority by total price, selected by the GK-threshold
    * oversample-verify-escalate — never a full-group single-task sort.
    * Selection is provably identical to the naive window, which is what
    * the oracle replays. */
  private val q106 = QueryDef(
    "q106_topk_per_group_score",
    (s, d) => {
      Sampling.topKPerGroup(Tables.orders(s, d)
            .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
          "o_orderpriority", "o_totalprice", "o_orderkey", n = 10)
        .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        FROM orders) t
      WHERE rk <= 10
      ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey"""))

  /** Mixture-curation capstone: temperature-reweighted source keep
    * (q103) → best-30 per source by length (q106's primitive, n_chars
    * as the score) → sequence packing of the survivors (q90) — three
    * data-derived stages whose HANDOFFS are verified in one DuckDB
    * chain, the q100 pattern for the sampling surface. */
  private val q107 = QueryDef(
    "q107_mixture_curation",
    (s, d) => {
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      val kept = Sampling.temperature(docs, "doc_id", "source",
        alpha = 0.5, baseRate = 0.8).filter(col("kept") === 1)
      val best = Sampling.topKPerGroup(kept, "source", "n_chars", "doc_id", n = 30)
      val toks = best.select(col("doc_id"), col("source"),
        size(TextFunctions.tokens(col("text"))).cast("long").as("n_toks"))
      graft.operators.Packing.assign(toks, "doc_id", "n_toks", capacity = 512L)
        .join(toks.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("tok_offset"), col("seq_id"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH cnt AS (
        SELECT source, count(*) AS n FROM documents
        WHERE source IS NOT NULL GROUP BY source),
      mx AS (SELECT max(n) AS nmax FROM cnt),
      th AS (
        SELECT source,
               CAST(floor(
                 (floor(least(1.0, 0.8 * pow(n / nmax, -0.5)) * 1000000.0 + 0.5)
                   / 1000000.0) * 1152921504606846976.0) AS BIGINT) AS thr
        FROM cnt, mx),
      kept AS (
        SELECT d.doc_id, d.source, d.text, d.n_chars
        FROM documents d JOIN th t USING (source)
        WHERE ('0x' || substr(md5('graft-temp|' || d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT < t.thr),
      best AS (
        SELECT doc_id, source, text FROM (
          SELECT doc_id, source, text,
                 row_number() OVER (PARTITION BY source
                   ORDER BY n_chars DESC, doc_id ASC) AS rk
          FROM kept) t WHERE rk <= 30),
      tok AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\s+'),
                   x -> length(x) > 0))::BIGINT AS n_tokens
        FROM best),
      c AS (
        SELECT doc_id, source, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                 AS tok_offset
        FROM tok)
      SELECT doc_id, source, n_tokens, tok_offset,
             tok_offset // 512 AS seq_id
      FROM c
      ORDER BY doc_id"""))

  /** The decontamination ACTION (q85 reports, this one removes): split →
    * contaminated (test, train) pairs → the offending train docs are
    * ACTUALLY DROPPED → per-language rollup of the training set that
    * would ship. Every stage — the split thresholds, the rolling-hash
    * winnowing, the pair join, the anti-join, the rollup — replays in
    * one DuckDB chain. */
  private val q109 = QueryDef(
    "q109_decontaminated_train_set",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      val withSplit = Sampling.split(docs, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      val bad = graft.operators.Contamination
        .pairs(withSplit, "doc_id", "text", "split",
          // this synthetic corpus is heavily self-similar: at minShared=2
          // EVERY train doc contaminates (q85 flags ~all test docs too);
          // 20 shared fingerprints marks the heavy overlaps (50/406)
          minShared = 20, maxDf = 50, k = 8, w = 4,
          index = graft.operators.IndexStore.NoStore,
          minParallelism = s.sparkContext.defaultParallelism,
          rollingHash = true)
        .select(col("train_id")).distinct()
      withSplit.filter(col("split") === "train")
        .join(bad, col("doc_id") === col("train_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7), i ->
                 CAST(list_sum(list_transform(generate_series(0, 7), j ->
                   unicode(substr(text, i + j, 1)) * CAST(31 ** (7 - j) AS BIGINT)))
                   % 1000000007 AS BIGINT)) AS grams
        FROM documents),
      wnd AS (
        SELECT doc_id,
               list_sort(list_distinct(CASE WHEN len(grams) >= 4
                 THEN list_transform(generate_series(1, len(grams) - 3),
                      j -> list_min(grams[j:j+3]))
                 ELSE [list_min(grams)] END)) AS wn
        FROM g WHERE len(grams) > 0),
      fp AS (SELECT doc_id, unnest(wn) AS f FROM wnd),
      sp AS (
        SELECT doc_id,
               CASE WHEN ('0x' || substr(md5('graft|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
                         < 922337203685477632 THEN 'train'
                    WHEN ('0x' || substr(md5('graft|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT
                         < 1037629354146162304 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents),
      pruned AS (SELECT f FROM fp GROUP BY f HAVING count(*) <= 50),
      fps AS (
        SELECT fp.doc_id, fp.f, sp.split
        FROM fp JOIN sp USING (doc_id) JOIN pruned USING (f)),
      bad AS (
        SELECT DISTINCT tr.doc_id AS train_id
        FROM fps te JOIN fps tr ON te.f = tr.f
        WHERE te.split = 'test' AND tr.split = 'train'
        GROUP BY te.doc_id, tr.doc_id
        HAVING count(*) >= 20)
      SELECT d.lang, count(*) AS n_docs, sum(d.n_chars)::BIGINT AS sum_chars
      FROM documents d
      JOIN sp ON sp.doc_id = d.doc_id
      LEFT JOIN bad b ON b.train_id = d.doc_id
      WHERE sp.split = 'train' AND b.train_id IS NULL
      GROUP BY d.lang
      ORDER BY d.lang"""))

  /** UniMax language-balanced budget allocation
    * ([[graft.operators.Sampling.unimax]], Chung et al. ICLR 2023):
    * serve languages in ascending token-count order, each getting
    * min(its tokens · epoch cap, remaining budget / languages left) of a
    * 70% token budget — at sf0.01 the two smallest languages are fully
    * served (rate 1.0, the cap branch) while en is rationed to ~0.33
    * (the shared-surplus branch). The oracle replays token counting,
    * the allocation loop as a RECURSIVE CTE (every float op in the same
    * IEEE order), the half-up-6 rates, and per-row 60-bit membership. */
  private val q123 = QueryDef(
    "q123_unimax_sampling",
    (s, d) => {
      Sampling.unimax(Tables.documents(s, d)
            .select(col("doc_id"), col("lang"),
              size(graft.functions.TextFunctions.tokens(col("text"))).as("w")),
          "doc_id", "lang", "w", budgetFrac = 0.7)
        .select(col("doc_id"), col("lang"), col("kept"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH RECURSIVE
      d AS (
        SELECT doc_id, lang,
               length(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents),
      cnt AS (
        SELECT lang, CAST(sum(w) AS BIGINT) AS w FROM d
        WHERE lang IS NOT NULL GROUP BY lang),
      ord AS (
        SELECT lang, w, row_number() OVER (ORDER BY w ASC, lang ASC) AS rn,
               (SELECT count(*) FROM cnt) AS ng
        FROM cnt),
      alloc AS (
        SELECT 0 AS rn, CAST(NULL AS VARCHAR) AS lang, CAST(0 AS BIGINT) AS w,
               CAST(0.0 AS DOUBLE) AS a,
               (SELECT CAST(0.7 AS DOUBLE) * sum(w) FROM cnt) AS rem
        UNION ALL
        SELECT o.rn, o.lang, o.w,
               least(CAST(o.w AS DOUBLE), al.rem / (o.ng - o.rn + 1)),
               al.rem - least(CAST(o.w AS DOUBLE), al.rem / (o.ng - o.rn + 1))
        FROM alloc al JOIN ord o ON o.rn = al.rn + 1),
      th AS (
        SELECT lang, CAST(floor(
                 (floor(least(1.0, CASE WHEN w = 0 THEN 0.0 ELSE a / w END)
                    * 1000000.0 + 0.5) / 1000000.0)
                 * 1152921504606846976.0) AS BIGINT) AS thr
        FROM alloc WHERE rn > 0)
      SELECT d.doc_id, d.lang,
             CASE WHEN t.thr IS NOT NULL AND
                  ('0x' || substr(md5('graft-unimax|' || d.doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT < t.thr
                  THEN 1 ELSE 0 END AS kept
      FROM d LEFT JOIN th t USING (lang)
      ORDER BY d.doc_id"""))

  /** Deterministic weighted interleave ([[Sampling.interleave]]): the
    * blended-dataset read order for a 4:2:2:1:1 language mixture —
    * every 10 consecutive schedule slots hold 4 en, 2 zh, 2 es, 1 de,
    * 1 fr until a source exhausts. The oracle derives the SAME period
    * pattern from integer virtual time (slot j of source s at
    * j·(lcm/c_s), rank with source tie-break), replays each source's
    * md5 shuffle order, and recomputes every global position. */
  private val q128 = QueryDef(
    "q128_mixture_interleave",
    (s, d) => {
      Sampling.interleave(Tables.documents(s, d).select(col("doc_id"), col("lang")),
          "doc_id", "lang",
          Map("en" -> 4, "zh" -> 2, "es" -> 2, "de" -> 1, "fr" -> 1))
        .select(col("doc_id"), col("lang"),
          col("shuffle_pos").as("k"), col("global_pos"))
        .orderBy(col("global_pos"))
    },
    Some("""
      WITH slots AS (
        SELECT s, c FROM (VALUES ('en', 4), ('zh', 2), ('es', 2),
                                 ('de', 1), ('fr', 1)) t(s, c)),
      patt AS (
        SELECT s, j - 1 AS j,
               row_number() OVER (ORDER BY j * (4 // c), s) - 1 AS pos
        FROM (SELECT s, c, unnest(generate_series(1, c)) AS j FROM slots) t2),
      r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY
                 ('0x' || substr(md5('graft-shuf|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT,
                 doc_id) - 1 AS k
        FROM documents
        WHERE lang IN (SELECT s FROM slots)),
      g AS (
        SELECT r.doc_id, r.lang, r.k,
               (r.k // sl.c) * 10 + p.pos AS global_pos
        FROM r
        JOIN slots sl ON sl.s = r.lang
        JOIN patt p ON p.s = r.lang AND p.j = r.k % sl.c)
      SELECT doc_id, lang, k, global_pos
      FROM g
      ORDER BY global_pos"""))

  /** Schedule-ordered packed export: the q128 interleave composed with
    * q90's sequence packing, keyed on the GLOBAL SCHEDULE POSITION
    * instead of the document id — tokens stream into fixed-capacity
    * training sequences in exactly the blended read order, so every
    * training window carries the mixture's proportions. The oracle
    * composes the q128 schedule fragment with the prefix-sum packing
    * fragment over global_pos order. */
  private val q129 = QueryDef(
    "q129_schedule_packed_export",
    (s, d) => {
      import graft.operators.Packing
      val sched = Sampling.interleave(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang",
        Map("en" -> 4, "zh" -> 2, "es" -> 2, "de" -> 1, "fr" -> 1))
      val sized = sched.select(col("doc_id").as("orig_id"), col("lang"),
          col("global_pos"),
          size(graft.functions.TextFunctions.tokens(col("text"))).as("n_toks"))
        .handoff // feeds packing AND the id join-back (the q112 lesson)
      val packed = Packing.assign(
        sized.select(col("global_pos"), col("n_toks")),
        "global_pos", "n_toks", capacity = 512L, bucketWidth = 64L)
      packed.join(sized, packed("doc_id") === sized("global_pos"))
        .select(col("orig_id").as("doc_id"), col("lang"), col("global_pos"),
          col("n_tokens"), col("tok_offset"), col("seq_id"), col("seq_offset"))
        .orderBy(col("global_pos"))
    },
    Some("""
      WITH slots AS (
        SELECT s, c FROM (VALUES ('en', 4), ('zh', 2), ('es', 2),
                                 ('de', 1), ('fr', 1)) t(s, c)),
      patt AS (
        SELECT s, j - 1 AS j,
               row_number() OVER (ORDER BY j * (4 // c), s) - 1 AS pos
        FROM (SELECT s, c, unnest(generate_series(1, c)) AS j FROM slots) t2),
      r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang ORDER BY
                 ('0x' || substr(md5('graft-shuf|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT,
                 doc_id) - 1 AS k
        FROM documents
        WHERE lang IN (SELECT s FROM slots)),
      g AS (
        SELECT r.doc_id, r.lang, r.k,
               (r.k // sl.c) * 10 + p.pos AS global_pos
        FROM r
        JOIN slots sl ON sl.s = r.lang
        JOIN patt p ON p.s = r.lang AND p.j = r.k % sl.c),
      t AS (
        SELECT g.doc_id, g.lang, g.global_pos,
               len(list_filter(string_split_regex(d.text, '\s+'),
                   x -> length(x) > 0))::BIGINT AS n_toks
        FROM g JOIN documents d USING (doc_id)),
      c AS (
        SELECT doc_id, lang, global_pos, n_toks,
               COALESCE(SUM(n_toks) OVER (ORDER BY global_pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                 AS tok_offset
        FROM t)
      SELECT doc_id, lang, global_pos, n_toks AS n_tokens, tok_offset,
             tok_offset // 512 AS seq_id,
             tok_offset % 512 AS seq_offset
      FROM c
      ORDER BY global_pos"""))

  /** Weighted sampling without replacement ([[Sampling.weightedSample]],
    * Efraimidis–Spirakis A-ES): exactly 100 documents drawn with
    * probability ∝ token count. The oracle replays the md5-uniform
    * coordinates, the exponential-race keys, the half-up-6 rounding,
    * and the (key, id) ordering. */
  private val q131 = QueryDef(
    "q131_weighted_sample",
    (s, d) => {
      Sampling.weightedSample(Tables.documents(s, d)
            .select(col("doc_id"),
              size(graft.functions.TextFunctions.tokens(col("text"))).as("w")),
          "doc_id", "w", k = 100)
        .select(col("doc_id"), col("w"), col("key6"))
        .orderBy(col("key6"), col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               length(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents),
      kd AS (
        SELECT doc_id, w,
               floor(-ln((('0x' || substr(md5('graft-wrs|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT + 1)
                         / 1152921504606846976.0)
                     / CAST(w AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS key6
        FROM d WHERE w IS NOT NULL AND w > 0)
      SELECT doc_id, w, key6 FROM kd
      ORDER BY key6 ASC, doc_id ASC
      LIMIT 100"""))

  /** Per-group weighted sampling without replacement: the q131 A-ES
    * race key ranked INSIDE each language by the q106 GK-threshold
    * top-k machinery (negated key: smallest race key = highest score) —
    * exactly 10 docs per language, each drawn ∝ token count, no group
    * ever sorted in one task. The oracle replays keys and the plain
    * per-group window the scale path is provably identical to. */
  private val q132 = QueryDef(
    "q132_weighted_sample_per_group",
    (s, d) => {
      val keyed = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .filter(col("w") > 0)
        .withColumn("key6", Sampling.wrsKey(col("doc_id"), col("w")))
        .withColumn("negkey", -col("key6"))
      Sampling.topKPerGroup(keyed, "lang", "negkey", "doc_id", n = 10)
        .select(col("doc_id"), col("lang"), col("w"), col("key6"))
        .orderBy(col("lang"), col("key6"), col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               length(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents),
      kd AS (
        SELECT doc_id, lang, w,
               floor(-ln((('0x' || substr(md5('graft-wrs|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT + 1)
                         / 1152921504606846976.0)
                     / CAST(w AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS key6
        FROM d WHERE w > 0),
      r AS (
        SELECT doc_id, lang, w, key6,
               row_number() OVER (PARTITION BY lang
                 ORDER BY key6 ASC, doc_id ASC) AS rn
        FROM kd)
      SELECT doc_id, lang, w, key6 FROM r WHERE rn <= 10
      ORDER BY lang, key6, doc_id"""))

  /** Bloom-prefiltered decontamination
    * ([[graft.operators.Contamination.bloomPrefiltered]]): the training
    * corpus (18 sources) is checked against a benchmark-sized eval set
    * (src0/src1) with the eval fingerprints folded into a broadcast
    * Bloom filter that prunes corpus fingerprints BEFORE the verify
    * join's shuffle. A Bloom has no false negatives and the verify join
    * removes its false positives, so the oracle replays only the exact
    * winnowing + join chain — the Bloom is pure plan, not semantics
    * (eval-side df-pruning at 50, per-train-doc rollup at ≥ 20 shared
    * fingerprints, the q109 self-similar-corpus tuning). */
  private val q134 = QueryDef(
    "q134_bloom_decontamination",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("text"), col("source"))
      val evalSet = docs.filter(col("source").isin("src0", "src1")).drop("source")
      val train = docs.filter(!col("source").isin("src0", "src1")).drop("source")
      graft.operators.Contamination
        .bloomPrefiltered(train, evalSet, "doc_id", "text",
          minShared = 20, maxDf = 50, k = 8, w = 4, fpp = 0.01,
          index = graft.operators.IndexStore.NoStore,
          minParallelism = s.sparkContext.defaultParallelism,
          rollingHash = true)
        .orderBy(col("train_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7), i ->
                 CAST(list_sum(list_transform(generate_series(0, 7), j ->
                   unicode(substr(text, i + j, 1)) * CAST(31 ** (7 - j) AS BIGINT)))
                   % 1000000007 AS BIGINT)) AS grams
        FROM documents),
      wnd AS (
        SELECT doc_id,
               list_sort(list_distinct(CASE WHEN len(grams) >= 4
                 THEN list_transform(generate_series(1, len(grams) - 3),
                      j -> list_min(grams[j:j+3]))
                 ELSE [list_min(grams)] END)) AS wn
        FROM g WHERE len(grams) > 0),
      fp AS (SELECT doc_id, unnest(wn) AS f FROM wnd),
      ev AS (SELECT doc_id FROM documents WHERE source IN ('src0', 'src1')),
      efp0 AS (
        SELECT fp.doc_id AS eval_id, fp.f
        FROM fp JOIN ev ON ev.doc_id = fp.doc_id),
      pruned AS (SELECT f FROM efp0 GROUP BY f HAVING count(*) <= 50),
      efp AS (SELECT eval_id, f FROM efp0 JOIN pruned USING (f)),
      tfp AS (
        SELECT fp.doc_id AS train_id, fp.f
        FROM fp
        WHERE fp.doc_id NOT IN (SELECT doc_id FROM ev)),
      pairs AS (
        SELECT train_id, eval_id, count(*) AS shared
        FROM tfp JOIN efp USING (f)
        GROUP BY train_id, eval_id
        HAVING count(*) >= 20)
      SELECT train_id, count(*) AS n_eval_docs,
             max(shared) AS max_shared, sum(shared)::BIGINT AS sum_shared
      FROM pairs GROUP BY train_id
      ORDER BY train_id"""))

  override val entries: Seq[QueryDef] =
    Seq(q83, q85, q92, q95, q97, q98, q103, q106, q107, q109, q123, q128,
      q129, q131, q132, q134)
}
