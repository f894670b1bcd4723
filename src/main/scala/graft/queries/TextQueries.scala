package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis extension operators over the documents table: stats +
  * quality, language ID, fingerprints, winnowing. Ratios are exact
  * rationals (int/int) so they compare without rounding; the composite
  * quality score is pure double arithmetic written identically in both
  * engines and rounded half-up at 6. */
object TextQueries extends QueryModule {

  private val q60 = QueryDef(
    "q60_text_stats_quality",
    (s, d) => {
      // single scan: quality is pure arithmetic over the already-projected
      // stats columns — no self-join, no second tokenization pass
      val stats = TextAnalysis.stats(
        Tables.documents(s, d).repartition(col("doc_id")), "doc_id", "text")
      val quality =
        least(col("n_tokens").cast("double") / lit(50.0), lit(1.0)) * lit(0.4) +
        col("ttr") * lit(0.3) +
        (lit(1.0) - least(col("punct_ratio") * lit(5.0), lit(1.0))) * lit(0.2) +
        least(col("en_stopword_ratio") * lit(5.0), lit(1.0)) * lit(0.1)
      stats
        .select(col("doc_id"), col("n_tokens"), col("n_bpe_tokens"), col("n_chars"),
          col("n_distinct"), Rnd.halfUp(col("ttr"), 6).as("ttr6"),
          Rnd.halfUp(col("mean_word_len"), 6).as("mwl6"),
          Rnd.halfUp(col("en_stopword_ratio"), 6).as("stop6"),
          Rnd.halfUp(quality, 6).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS toks
        FROM documents),
      st AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               list_sum(list_transform(toks, x -> 1 + floor((length(x) - 1) / 4)))::BIGINT AS n_bpe_tokens,
               length(text) AS n_chars,
               len(list_distinct(toks)) AS n_distinct,
               len(list_distinct(toks)) * 1.0 / len(toks) AS ttr,
               list_sum(list_transform(toks, x -> length(x))) * 1.0 / len(toks) AS mwl,
               len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) * 1.0 / len(toks) AS stopr,
               (length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g'))) * 1.0 /
                 greatest(length(text), 1) AS punct
        FROM t)
      SELECT doc_id, n_tokens, n_bpe_tokens, n_chars, n_distinct,
             floor(ttr * 1000000.0 + 0.5) / 1000000.0 AS ttr6,
             floor(mwl * 1000000.0 + 0.5) / 1000000.0 AS mwl6,
             floor(stopr * 1000000.0 + 0.5) / 1000000.0 AS stop6,
             floor((least(n_tokens / 50.0, 1.0) * 0.4 + ttr * 0.3 +
                    (1.0 - least(punct * 5.0, 1.0)) * 0.2 +
                    least(stopr * 5.0, 1.0) * 0.1) * 1000000.0 + 0.5) / 1000000.0 AS quality
      FROM st
      ORDER BY doc_id"""))

  private val q61 = QueryDef(
    "q61_lang_id",
    (s, d) => {
      val docs = Tables.documents(s, d).repartition(col("doc_id"))
      TextAnalysis.langId(docs, "doc_id", "text")
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .select(col("doc_id"), col("lang_pred"), col("hits"),
          (col("lang_pred") === col("lang")).as("correct"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH lex(lang_cand, word) AS (VALUES
        ('en','the'),('en','a'),('en','of'),('en','and'),('en','to'),
        ('en','in'),('en','is'),('en','that'),('en','it'),('en','for'),
        ('es','el'),('es','la'),('es','de'),('es','y'),('es','que'),
        ('es','en'),('es','un'),('es','es'),('es','se'),('es','no'),
        ('de','der'),('de','die'),('de','das'),('de','und'),('de','zu'),
        ('de','den'),('de','ist'),('de','von'),('de','mit'),('de','nicht'),
        ('fr','le'),('fr','la'),('fr','de'),('fr','et'),('fr','les'),
        ('fr','des'),('fr','est'),('fr','un'),('fr','une'),('fr','que'),
        ('zh','的'),('zh','了'),('zh','是'),('zh','我'),('zh','不'),
        ('zh','在'),('zh','人'),('zh','有'),('zh','他'),('zh','这')),
      toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS word
        FROM documents),
      hits AS (
        SELECT doc_id, lang_cand, count(*) AS hits
        FROM toks JOIN lex USING (word)
        GROUP BY doc_id, lang_cand),
      best AS (
        SELECT doc_id, lang_cand AS lang_pred, hits,
               row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang_cand ASC) AS rn
        FROM hits)
      SELECT d.doc_id,
             coalesce(b.lang_pred, 'und') AS lang_pred,
             coalesce(b.hits, 0) AS hits,
             (coalesce(b.lang_pred, 'und') = d.lang) AS correct
      FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
      ORDER BY d.doc_id"""))

  private val q62 = QueryDef(
    "q62_fingerprint_groups",
    (s, d) => {
      Tables.documents(s, d)
        .repartition(col("doc_id"))
        .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .groupBy(col("fp"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_docs"))
        .select(col("doc_id"), col("fp"), col("n_docs"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT min(doc_id) AS doc_id,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0))), ' ')) AS fp,
             count(*) AS n_docs
      FROM documents
      GROUP BY 2
      ORDER BY doc_id"""))

  private val q63 = QueryDef(
    "q63_winnowing",
    (s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") <= 200)
        .repartition(col("doc_id"))
        .select(col("doc_id"), TextAnalysis.winnow(col("text"), k = 8, w = 4).as("wn"))
        .select(col("doc_id"),
          size(col("wn")).as("n_fp"),
          element_at(col("wn"), 1).as("fp_min"),
          element_at(col("wn"), -1).as("fp_max"),
          concat_ws(",", slice(col("wn"), 1, 8)).as("fp_head"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7),
                 i -> ('0x' || substr(md5(substr(text, i, 8)), 1, 15))::UBIGINT::BIGINT) AS grams
        FROM documents WHERE doc_id <= 200),
      wnd AS (
        SELECT doc_id,
               list_sort(list_distinct(CASE WHEN len(grams) >= 4
                 THEN list_transform(generate_series(1, len(grams) - 3),
                      j -> list_min(grams[j:j+3]))
                 ELSE [list_min(grams)] END)) AS wn
        FROM g WHERE len(grams) > 0)
      SELECT doc_id, len(wn) AS n_fp, wn[1] AS fp_min, wn[-1] AS fp_max,
             array_to_string(wn[1:8], ',') AS fp_head
      FROM wnd
      ORDER BY doc_id"""))

  /** Rabin-Karp rolling fingerprint (the brief's "rolling hash"): every
    * 8-char window hashed incrementally in O(n) by the codegen'd
    * RollingFingerprint expression. The oracle verifies the VALUES via
    * the direct O(n·k) polynomial — only a per-row loop can express the
    * O(n) recurrence, which is the point of the custom expression. */
  private val q64 = QueryDef(
    "q64_rolling_fingerprint",
    (s, d) => {
      graft.functions.RollingFingerprint.register(s)
      Tables.documents(s, d)
        .filter(col("doc_id") <= 200)
        .repartition(col("doc_id"))
        .select(col("doc_id"),
          graft.functions.RollingFingerprint.rollingFingerprint(col("text"), 8).as("rh"))
        .select(col("doc_id"), size(col("rh")).as("n_h"),
          element_at(col("rh"), 1).as("h_first"),
          element_at(col("rh"), -1).as("h_last"),
          array_min(col("rh")).as("h_min"),
          array_max(col("rh")).as("h_max"),
          concat_ws(",", slice(col("rh"), 1, 8)).as("head8"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH rh AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7), i ->
                 CAST(list_sum(list_transform(generate_series(0, 7), j ->
                   unicode(substr(text, i + j, 1)) * CAST(31 ** (7 - j) AS BIGINT)))
                   % 1000000007 AS BIGINT)) AS h
        FROM documents WHERE doc_id <= 200)
      SELECT doc_id, len(h) AS n_h,
             h[1] AS h_first, h[-1] AS h_last,
             list_min(h) AS h_min, list_max(h) AS h_max,
             array_to_string(h[1:8], ',') AS head8
      FROM rh
      ORDER BY doc_id"""))

  /** Winnowing over the O(n) rolling hash (the paper's own construction)
    * — same window/dedup/sort shape as q63, cheaper hash primitive. */
  private val q65 = QueryDef(
    "q65_winnowing_rolling",
    (s, d) => {
      graft.functions.RollingFingerprint.register(s)
      Tables.documents(s, d)
        .filter(col("doc_id") <= 200)
        .repartition(col("doc_id"))
        .select(col("doc_id"), TextAnalysis.winnowRolling(col("text"), k = 8, w = 4).as("wn"))
        .select(col("doc_id"),
          size(col("wn")).as("n_fp"),
          element_at(col("wn"), 1).as("fp_min"),
          element_at(col("wn"), -1).as("fp_max"),
          concat_ws(",", slice(col("wn"), 1, 8)).as("fp_head"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH g AS (
        SELECT doc_id,
               list_transform(generate_series(1, length(text) - 7), i ->
                 CAST(list_sum(list_transform(generate_series(0, 7), j ->
                   unicode(substr(text, i + j, 1)) * CAST(31 ** (7 - j) AS BIGINT)))
                   % 1000000007 AS BIGINT)) AS grams
        FROM documents WHERE doc_id <= 200),
      wnd AS (
        SELECT doc_id,
               list_sort(list_distinct(CASE WHEN len(grams) >= 4
                 THEN list_transform(generate_series(1, len(grams) - 3),
                      j -> list_min(grams[j:j+3]))
                 ELSE [list_min(grams)] END)) AS wn
        FROM g WHERE len(grams) > 0)
      SELECT doc_id, len(wn) AS n_fp, wn[1] AS fp_min, wn[-1] AS fp_max,
             array_to_string(wn[1:8], ',') AS fp_head
      FROM wnd
      ORDER BY doc_id"""))

  /** Misra-Gries heavy-hitter tokens per language — the frequent-items
    * member of the sketch family (HLL q38, KMV q47, GK q79). The summary
    * SET is processing-order-dependent, so the query verifies the sketch's
    * deterministic GUARANTEES in-query (the q38/q79 pattern): every
    * summary estimate obeys est ≤ true ∧ true − est ≤ n/k, and every
    * token with true count > n/k is present. The oracle recomputes the
    * exact side and expects the guarantee flags.
    *
    * Scale shape: the per-partition MG summaries are O(k) state feeding
    * map-side partial aggregation — only ≤k-entry summaries cross the
    * exchange, never token counts. The exact-count half is the
    * verification harness (like q38's exact distinct), not the operator. */
  private val q81 = QueryDef(
    "q81_freq_items_sketch",
    (s, d) => {
      val k = 64
      import graft.functions.TextFunctions.tokens
      val toks = Tables.documents(s, d)
        .select(col("lang"), explode(tokens(col("text"))).as("tok"))
      val mg = udaf(graft.functions.MisraGries(k))
      val summary = toks.groupBy(col("lang")).agg(mg(col("tok")).as("summary"))
        .select(col("lang"), explode(col("summary")).as(Seq("tok", "est")))
      val exact = toks.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val n = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_tokens"))
      val thresh = col("n_tokens").cast("double") / lit(k)
      // every summary entry within the MG bound for its group
      val bound = summary.join(exact, Seq("lang", "tok"))
        .join(broadcast(n), Seq("lang"))
        .groupBy(col("lang"))
        .agg(sum(when(col("est") <= col("c") &&
          (col("c") - col("est")).cast("double") <= thresh, 0L)
          .otherwise(1L)).as("violations"))
      // every true-heavy token (count > n/k) must be in the summary
      val heavies = exact.join(broadcast(n), Seq("lang"))
        .filter(col("c").cast("double") > thresh)
      val nHeavy = heavies.groupBy(col("lang")).agg(count(lit(1)).as("n_heavy"))
      val nFound = heavies
        .join(summary.select(col("lang"), col("tok")), Seq("lang", "tok"))
        .groupBy(col("lang")).agg(count(lit(1)).as("heavy_found"))
      n.join(nHeavy, Seq("lang"), "left")
        .join(nFound, Seq("lang"), "left")
        .join(bound, Seq("lang"), "left")
        .select(col("lang"), col("n_tokens"),
          coalesce(col("n_heavy"), lit(0L)).as("n_heavy"),
          coalesce(col("heavy_found"), lit(0L)).as("heavy_found"),
          when(coalesce(col("violations"), lit(0L)) === 0, 1L).otherwise(0L)
            .as("within_bound"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH toks AS (
        SELECT lang,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0)) AS tok
        FROM documents),
      n AS (SELECT lang, count(*) AS n_tokens FROM toks GROUP BY lang),
      exact AS (SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok),
      heavy AS (
        SELECT e.lang, count(*) AS n_heavy
        FROM exact e JOIN n USING (lang)
        WHERE e.c > CAST(n.n_tokens AS DOUBLE) / 64
        GROUP BY e.lang)
      SELECT n.lang, n.n_tokens,
             coalesce(h.n_heavy, 0) AS n_heavy,
             coalesce(h.n_heavy, 0) AS heavy_found,
             CAST(1 AS BIGINT) AS within_bound
      FROM n LEFT JOIN heavy h USING (lang)
      ORDER BY n.lang NULLS FIRST"""))

  /** TF-IDF top-3 terms per document over the whole corpus. Both
    * engines rank on the half-up-6 rounded score with term tiebreak, so
    * the comparison is immune to last-ulp ln() differences (see
    * TextAnalysis.tfidf). */
  private val q84 = QueryDef(
    "q84_tfidf_top_terms",
    (s, d) => {
      graft.operators.TextAnalysis
        .tfidf(Tables.documents(s, d), "doc_id", "text", topK = 3,
          minParallelism = s.sparkContext.defaultParallelism)
        .orderBy(col("doc_id"), col("rn"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> length(x) > 0)) AS term
        FROM documents),
      tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      dfreq AS (
        SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
      nd AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
      scored AS (
        SELECT t.doc_id, t.term, t.tf, d.dfreq,
               floor(t.tf * ln(nd.n_docs::DOUBLE / d.dfreq::DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS score6
        FROM tf t JOIN dfreq d USING (term) CROSS JOIN nd),
      ranked AS (
        SELECT doc_id, term, tf, dfreq, score6,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score6 DESC, term ASC) AS rn
        FROM scored)
      SELECT doc_id, term, tf, dfreq, score6, rn
      FROM ranked WHERE rn <= 3
      ORDER BY doc_id, rn"""))

  /** Token-window chunking (64-token windows, stride 48) over the whole
    * corpus; the md5 content hash verifies every chunk's exact token
    * payload without shipping token arrays through the gate. */
  private val q86 = QueryDef(
    "q86_token_chunks",
    (s, d) => {
      graft.operators.TextAnalysis
        .chunks(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 64, stride = 48,
          minParallelism = s.sparkContext.defaultParallelism)
        .orderBy(col("doc_id"), col("chunk_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           x -> length(x) > 0) AS t
        FROM documents),
      ch AS (
        SELECT doc_id, t,
               unnest(generate_series(0,
                 ((CASE WHEN len(t) > 64 THEN len(t) - 64 ELSE 0 END) + 47) // 48)) AS chunk_id
        FROM toks WHERE len(t) > 0)
      SELECT doc_id, chunk_id,
             len(t[chunk_id*48+1 : chunk_id*48+64]) AS n_tokens,
             md5(array_to_string(t[chunk_id*48+1 : chunk_id*48+64], ' ')) AS chunk_hash
      FROM ch
      ORDER BY doc_id, chunk_id"""))

  /** Gopher-style repetition ratios per document. The Spark side is a
    * pure per-row fold (mode count = longest equal-run of the sorted
    * gram array — no explode, no shuffle); the oracle takes the
    * opposite, relational route (unnest + group + max) and must land on
    * the same doubles: numerators/denominators are exact integers, both
    * engines do one IEEE division, and the flag comparisons replay. */
  private val q91 = QueryDef(
    "q91_repetition",
    (s, d) => {
      graft.operators.TextAnalysis
        .repetition(Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text")
        .select(col("doc_id"), col("n_tokens"), col("dup_token_frac"),
          col("top_2gram_frac"), col("top_3gram_frac"), col("flagged"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'),
                           x -> length(x) > 0) AS t
        FROM documents),
      base AS (
        SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct, t
        FROM toks),
      g2 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i + 1])) AS g
        FROM base WHERE len(t) >= 2),
      c2 AS (
        SELECT doc_id, max(c) AS m, sum(c) AS tot
        FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
        GROUP BY doc_id),
      g3 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        FROM base WHERE len(t) >= 3),
      c3 AS (
        SELECT doc_id, max(c) AS m, sum(c) AS tot
        FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
        GROUP BY doc_id),
      r AS (
        SELECT base.doc_id, base.n_tokens,
          CASE WHEN base.n_tokens > 0
               THEN 1.0 - base.n_distinct::DOUBLE / base.n_tokens::DOUBLE
               ELSE 0.0 END AS dup_token_frac,
          COALESCE(c2.m::DOUBLE / c2.tot::DOUBLE, 0.0) AS top_2gram_frac,
          COALESCE(c3.m::DOUBLE / c3.tot::DOUBLE, 0.0) AS top_3gram_frac
        FROM base LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id))
      SELECT doc_id, n_tokens, dup_token_frac, top_2gram_frac, top_3gram_frac,
        CASE WHEN dup_token_frac > 0.4 OR top_2gram_frac > 0.2
                  OR top_3gram_frac > 0.18 THEN 1 ELSE 0 END AS flagged
      FROM r
      ORDER BY doc_id"""))

  /** BM25 top-20 retrieval for a 3-term query over the corpus. The
    * oracle replays idf, length normalization, the 6-decimal contribution
    * rounding, AND the ordered per-doc fold (list(contrib ORDER BY term)
    * + list_reduce, seeded 0.0 like Spark's aggregate) — an unordered
    * SUM() would be last-bit nondeterministic. k1=1.25 / b=0.75 are
    * binary-exact so constant folding can't drift. */
  private val q93 = QueryDef(
    "q93_bm25_retrieval",
    (s, d) => {
      graft.operators.TextAnalysis
        .bm25(Tables.documents(s, d), "doc_id", "text",
          query = Seq("spark", "hash", "window"), topK = 20,
          minParallelism = s.sparkContext.defaultParallelism)
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS t
        FROM documents),
      hits AS (
        SELECT doc_id, len(t) AS dl,
               unnest(list_filter(t, x -> x IN ('spark', 'hash', 'window'))) AS term
        FROM toks),
      tf AS (
        SELECT doc_id, dl, term, count(*) AS tf FROM hits GROUP BY 1, 2, 3),
      dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
      stats AS (
        SELECT count(*) AS n_docs,
               sum(len(t))::DOUBLE / count(*)::DOUBLE AS avgdl
        FROM toks),
      scored AS (
        SELECT doc_id, term,
          floor(ln(1.0::DOUBLE + (stats.n_docs::DOUBLE - dfreq.dfreq::DOUBLE + 0.5::DOUBLE)
                   / (dfreq.dfreq::DOUBLE + 0.5::DOUBLE))
              * (tf.tf::DOUBLE * 2.25::DOUBLE)
              / (tf.tf::DOUBLE + 1.25::DOUBLE
                 * (0.25::DOUBLE + 0.75::DOUBLE * (tf.dl::DOUBLE / stats.avgdl)))
            * 1000000.0 + 0.5) / 1000000.0 AS contrib
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats),
      agg AS (
        SELECT doc_id, count(*) AS n_terms,
          floor(list_reduce(list_prepend(0.0::DOUBLE, list(contrib ORDER BY term)),
                            (a, b) -> a + b) * 1000000.0 + 0.5) / 1000000.0 AS score6
        FROM scored GROUP BY doc_id)
      SELECT doc_id, n_terms, score6
      FROM agg
      ORDER BY score6 DESC, doc_id ASC
      LIMIT 20"""))

  /** Quality-filter funnel per language: the C4/Gopher-style keep/drop
    * gate (min length + repetition flags) applied to the corpus, rolled
    * up per language — the "how much survives filtering, where" report
    * every curation run produces. All output columns are exact integers;
    * the flag thresholds' double comparisons replay per q91's contract.
    * Shape: one per-row metrics pass (no shuffle) + one hash aggregate. */
  private val q96 = QueryDef(
    "q96_quality_funnel",
    (s, d) => {
      val r = graft.operators.TextAnalysis.repetition(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "text")
      val keep = col("n_tokens") >= 20 && col("flagged") === 0
      r.groupBy(col("lang")).agg(
          count(lit(1)).as("n_total"),
          sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
          sum(when(keep, col("n_tokens").cast("long")).otherwise(0L)).as("kept_tokens"))
        .orderBy(col("lang"))
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'),
                           x -> length(x) > 0) AS t
        FROM documents),
      base AS (
        SELECT doc_id, lang, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct, t
        FROM toks),
      g2 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i + 1])) AS g
        FROM base WHERE len(t) >= 2),
      c2 AS (
        SELECT doc_id, max(c) AS m, sum(c) AS tot
        FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2)
        GROUP BY doc_id),
      g3 AS (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(t) - 2),
                 i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
        FROM base WHERE len(t) >= 3),
      c3 AS (
        SELECT doc_id, max(c) AS m, sum(c) AS tot
        FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2)
        GROUP BY doc_id),
      r AS (
        SELECT base.doc_id, base.lang, base.n_tokens,
          CASE WHEN base.n_tokens > 0
               THEN 1.0 - base.n_distinct::DOUBLE / base.n_tokens::DOUBLE
               ELSE 0.0 END AS dup_token_frac,
          COALESCE(c2.m::DOUBLE / c2.tot::DOUBLE, 0.0) AS top_2gram_frac,
          COALESCE(c3.m::DOUBLE / c3.tot::DOUBLE, 0.0) AS top_3gram_frac
        FROM base LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)),
      k AS (
        SELECT lang, n_tokens,
          CASE WHEN n_tokens >= 20
                AND NOT (dup_token_frac > 0.4 OR top_2gram_frac > 0.2
                         OR top_3gram_frac > 0.18)
               THEN 1 ELSE 0 END AS keep
        FROM r)
      SELECT lang, count(*) AS n_total,
             sum(CASE WHEN keep = 1 THEN 1 ELSE 0 END)::BIGINT AS n_kept,
             sum(CASE WHEN keep = 1 THEN n_tokens ELSE 0 END)::BIGINT AS kept_tokens
      FROM k GROUP BY lang
      ORDER BY lang"""))

  /** CCNet-style corpus-LM perplexity bucketing (Wenzek et al., LREC
    * 2020): a Laplace-smoothed bigram LM is trained on the corpus
    * itself, every document is scored by mean bigram NLL, and the
    * corpus splits into head/middle/tail perplexity bands (thresholds
    * at the sf0.01 terciles so all three bands are populated). The
    * oracle retrains the same LM from the same counts and replays the
    * rounding + ordered-fold contract, so nll6/ppl6 hash-compare. */
  /** q117's head/tail perplexity cutoffs — the sf0.01 corpus terciles,
    * measured once so all three CCNet bands are populated at the gate's
    * scale factor. Single source of truth interpolated into BOTH the
    * engine call and the oracle SQL so the two can never drift; at a
    * different scale factor the corpus-trained LM's ppl distribution
    * shifts and these would need re-measuring (a deployment derives
    * them per-corpus with approx_percentile). */
  private val q117HeadPpl = 29.2
  private val q117TailPpl = 29.9

  /** The corpus-LM CTE prefix (token split → bigram tf → model in LONG
    * micro-nats → per-doc exact integer nll → ppl6/band) — shared
    * byte-identically by q117 and the q126 curriculum export, the q101
    * `lloydK8I2Ctes` pattern. Ends with `banded` = (doc_id, bucket). */
  private val lmPplCtes = raw"""toks AS (
        SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> length(x) > 0) AS t
        FROM documents),
      tf AS (
        SELECT doc_id, g AS bigram, count(*) AS tf
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(t) - 1),
                       i -> t[i] || ' ' || t[i + 1])) AS g
              FROM toks WHERE len(t) >= 2)
        GROUP BY 1, 2),
      bc AS (SELECT bigram, sum(tf) AS cb FROM tf GROUP BY 1),
      cc AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(tf) AS cw
             FROM tf GROUP BY 1),
      v AS (SELECT count(DISTINCT x) AS vocab
            FROM (SELECT unnest(t) AS x FROM toks)),
      model AS (
        SELECT bigram,
               CAST(floor((-ln((cb::DOUBLE + 1.0)
                          / (cw::DOUBLE + 1.0 * vocab::DOUBLE)))
                 * 1000000.0 + 0.5) AS BIGINT) AS u6i
        FROM bc JOIN cc ON split_part(bc.bigram, ' ', 1) = cc.w1
        CROSS JOIN v),
      scored AS (
        SELECT doc_id, tf, tf * u6i AS contrib
        FROM tf JOIN model USING (bigram)),
      agg AS (
        SELECT doc_id, sum(tf)::BIGINT AS n_bigrams,
          CAST(sum(contrib) AS DOUBLE) / 1000000.0 AS nll6
        FROM scored GROUP BY doc_id),
      p AS (
        SELECT doc_id, n_bigrams, nll6,
               floor(exp(nll6 / n_bigrams::DOUBLE) * 1000000.0 + 0.5)
                 / 1000000.0 AS ppl6
        FROM agg),
      banded AS (
        SELECT t.doc_id,
               coalesce(p.n_bigrams, 0) AS n_bigrams,
               coalesce(p.nll6, 0.0) AS nll6,
               p.ppl6,
               CASE WHEN p.ppl6 IS NULL THEN 'unscored'
                    WHEN p.ppl6 <= ${q117HeadPpl} THEN 'head'
                    WHEN p.ppl6 <= ${q117TailPpl} THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM toks t LEFT JOIN p USING (doc_id))"""

  private val q117 = QueryDef(
    "q117_lm_perplexity",
    (s, d) => {
      graft.operators.TextAnalysis.lmPerplexity(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", alpha = 1.0,
          headPpl = q117HeadPpl, tailPpl = q117TailPpl,
          minParallelism = s.sparkContext.defaultParallelism)
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH $lmPplCtes
      SELECT doc_id, n_bigrams, nll6, ppl6, bucket
      FROM banded
      ORDER BY doc_id"""))

  /** Curriculum export ([[graft.operators.Sampling.exportShardsPerGroup]]
    * over the q117 perplexity bands): stage training data the CCNet way
    * — band by LM perplexity, then cut EACH band into its own
    * deterministic, balanced shards (band → shard → file; a staged
    * training run consumes head shards first). The oracle composes the
    * byte-identical q117 CTE prefix with per-band shuffle-rank shard
    * math (the q98 fragment, partitioned by band). */
  private val q126 = QueryDef(
    "q126_curriculum_export",
    (s, d) => {
      import graft.operators.Sampling
      val bands = graft.operators.TextAnalysis.lmPerplexity(
          Tables.documents(s, d).select(col("doc_id"), col("text")),
          "doc_id", "text", alpha = 1.0,
          headPpl = q117HeadPpl, tailPpl = q117TailPpl,
          minParallelism = s.sparkContext.defaultParallelism)
        .select(col("doc_id"), col("bucket").as("band"))
      Sampling.exportShardsPerGroup(bands, "doc_id", "band", nShards = 4)
        .groupBy(col("band"), col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("shuffle_pos")).as("min_pos"),
          max(col("shuffle_pos")).as("max_pos"))
        .orderBy(col("band"), col("shard"))
    },
    Some(s"""
      WITH $lmPplCtes,
      c AS (
        SELECT doc_id, bucket AS band,
          ('0x' || substr(md5('graft-shuf|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM banded),
      r AS (
        SELECT doc_id, band,
               row_number() OVER (PARTITION BY band ORDER BY h, doc_id) - 1 AS pos,
               count(*) OVER (PARTITION BY band) AS n
        FROM c)
      SELECT band, CAST(pos * 4 // n AS INT) AS shard,
             count(*) AS n_rows,
             min(pos) AS min_pos,
             max(pos) AS max_pos
      FROM r
      GROUP BY 1, 2
      ORDER BY band, shard"""))

  /** DSIR data selection ([[TextAnalysis.dsirSelect]], Xie et al.
    * NeurIPS 2023): hashed unigram+bigram importance weights trained
    * against the `lang = 'en'` rows as the target distribution, Gumbel
    * top-125 resample. The oracle replays feature hashing (h60 % 64),
    * both Laplace-smoothed bucket models, the fixed-point micro-nat
    * log-ratios (exact integer doc scores — no float-order contract),
    * and the derandomized Gumbel key. */
  private val q121 = QueryDef(
    "q121_dsir_selection",
    (s, d) => {
      TextAnalysis.dsirSelect(Tables.documents(s, d), "doc_id", "text",
          isTarget = col("lang") === "en", k = 125, nBuckets = 64)
        .select(col("doc_id"), col("n_grams"), col("iscore"), col("key6"))
        .orderBy(col("key6").desc, col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS t
        FROM documents),
      g AS (
        SELECT doc_id, lang,
               list_concat(t, CASE WHEN length(t) >= 2
                 THEN list_transform(generate_series(1, length(t) - 1),
                        i -> t[i] || ' ' || t[i + 1])
                 ELSE [] END) AS gs
        FROM d WHERE length(t) > 0),
      f AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(gg), 1, 15))::UBIGINT::BIGINT % 64 AS b
        FROM (SELECT doc_id, lang, unnest(gs) AS gg FROM g)),
      cnt AS (
        SELECT b, count(*) FILTER (WHERE lang = 'en') AS tc, count(*) AS rc
        FROM f GROUP BY b),
      tot AS (SELECT sum(tc) AS tt, sum(rc) AS tr FROM cnt),
      lr AS (
        SELECT b, CAST(floor((ln((tc + 1.0) / (tt + 64.0))
                              - ln((rc + 1.0) / (tr + 64.0)))
                        * 1000000.0 + 0.5) AS BIGINT) AS w
        FROM cnt, tot),
      sc AS (
        SELECT f.doc_id, count(*) AS n_grams, CAST(sum(lr.w) AS BIGINT) AS iscore
        FROM f JOIN lr USING (b) GROUP BY f.doc_id),
      key AS (
        SELECT doc_id, n_grams, iscore,
               floor((iscore / 1000000.0
                      - ln(-ln((('0x' || substr(md5('graft-dsir|' || doc_id::VARCHAR), 1, 15))::UBIGINT::BIGINT + 1)
                               / 1152921504606846976.0)))
                 * 1000000.0 + 0.5) / 1000000.0 AS key6
        FROM sc)
      SELECT doc_id, n_grams, iscore, key6 FROM key
      ORDER BY key6 DESC, doc_id ASC
      LIMIT 125"""))

  /** PMI collocation mining ([[TextAnalysis.collocations]], Church &
    * Hanks CL 1990): the corpus's top-20 bigrams by pointwise mutual
    * information over exact unigram/bigram occurrence counts, count
    * threshold 5, with the true bigram total derived as N_u − n_docs so
    * the threshold can't bias the denominators. The oracle replays
    * tokenization, both count tables, the totals, and the identical
    * PMI double DAG. */
  private val q137 = QueryDef(
    "q137_pmi_collocations",
    (s, d) => {
      TextAnalysis.collocations(
          Tables.documents(s, d).select(col("text")),
          "text", minCount = 5, topN = 20)
        .select(col("bigram"), col("cxy"), Rnd.halfUp(col("pmi"), 6).as("pmi6"))
    },
    Some("""
      WITH t1 AS (
        SELECT list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0) AS t
        FROM documents
        WHERE len(list_filter(string_split_regex(text, '\s+'),
                x -> length(x) > 0)) >= 1),
      uni AS (
        SELECT w, count(*) AS c
        FROM (SELECT unnest(t) AS w FROM t1) GROUP BY w),
      tot AS (
        SELECT greatest(1, CAST(sum(c) AS BIGINT)) AS nu,
               greatest(1, CAST(sum(c) AS BIGINT)
                 - (SELECT count(*) FROM t1)) AS nb
        FROM uni),
      bi0 AS (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i, t
        FROM t1 WHERE len(t) >= 2),
      big AS (SELECT t[i] AS x, t[i + 1] AS y FROM bi0),
      bi AS (
        SELECT x, y, count(*) AS cxy FROM big
        GROUP BY x, y HAVING count(*) >= 5),
      pmi AS (
        SELECT bi.x || ' ' || bi.y AS bigram, bi.cxy,
               ln((CAST(bi.cxy AS DOUBLE) / CAST(tot.nb AS DOUBLE)) /
                  ((CAST(ux.c AS DOUBLE) / CAST(tot.nu AS DOUBLE)) *
                   (CAST(uy.c AS DOUBLE) / CAST(tot.nu AS DOUBLE)))) AS pmi
        FROM bi JOIN uni ux ON ux.w = bi.x
                JOIN uni uy ON uy.w = bi.y, tot)
      SELECT bigram, cxy,
             floor(pmi * 1000000.0 + 0.5) / 1000000.0 AS pmi6
      FROM pmi
      ORDER BY pmi DESC, bigram ASC
      LIMIT 20"""))

  /** Per-source distribution drift ([[TextAnalysis.sourceDivergence]]):
    * Jensen-Shannon divergence of each source's unigram distribution
    * against the corpus blend, nano-nat fixed-point sums (the q117
    * micro-nat pattern, one decimal finer) plus the closed-form
    * absent-vocabulary tail; the JVM's ln 2 is interpolated into the
    * replay so both engines use the bit-same constant. */
  private val q138 = QueryDef(
    "q138_source_divergence",
    (s, d) => {
      TextAnalysis.sourceDivergence(
          Tables.documents(s, d).select(col("source"), col("text")),
          "source", "text")
        .select(col("source"), col("n_tokens"), col("n_terms"),
          Rnd.halfUp(col("js"), 6).as("js6"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH st AS (
        SELECT src, w, count(*) AS cst FROM (
          SELECT source AS src,
                 unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents WHERE source IS NOT NULL)
        GROUP BY src, w),
      ct AS (SELECT w, CAST(sum(cst) AS BIGINT) AS ct FROM st GROUP BY w),
      tot AS (SELECT greatest(1, CAST(sum(ct) AS BIGINT)) AS n FROM ct),
      ns AS (
        SELECT src, CAST(sum(cst) AS BIGINT) AS ns, count(*) AS nterms
        FROM st GROUP BY src),
      j AS (
        SELECT st.src, ns.ns, ns.nterms, ct.ct,
               CAST(st.cst AS DOUBLE) / CAST(ns.ns AS DOUBLE) AS p,
               CAST(ct.ct AS DOUBLE) / CAST(tot.n AS DOUBLE) AS q,
               (p + q) / 2.0 AS m,
               CAST(floor(p * ln(p / m) * 1000000000.0 + 0.5) AS BIGINT) AS u1,
               CAST(floor(q * ln(q / m) * 1000000000.0 + 0.5) AS BIGINT) AS u2
        FROM st JOIN ct USING (w) JOIN ns USING (src), tot),
      agg AS (
        SELECT src, max(ns) AS n_tokens, max(nterms) AS n_terms,
               CAST(sum(u1) AS BIGINT) AS s1, CAST(sum(u2) AS BIGINT) AS s2,
               CAST(sum(ct) AS BIGINT) AS cov
        FROM j GROUP BY src)
      SELECT src AS source, n_tokens, n_terms,
             floor((0.5 * (CAST(s1 AS DOUBLE) / 1000000000.0) +
                    0.5 * (CAST(s2 AS DOUBLE) / 1000000000.0 +
                           ${math.log(2.0)} * (1.0 - CAST(cov AS DOUBLE) /
                             CAST((SELECT n FROM tot) AS DOUBLE))))
                   * 1000000.0 + 0.5) / 1000000.0 AS js6
      FROM agg
      ORDER BY source"""))

  /** Learned quality filter, trained IN-QUERY and replayed bit-exactly
    * by the oracle: [[TextAnalysis.linearProbeTrain]] fits a
    * fastText-shaped linear probe (hashed unigram counts → micro-unit
    * label) by 3 steps of full-batch gradient descent in EXACT integer
    * arithmetic — so the DuckDB oracle unrolls the whole training loop
    * (weights after each step are CTEs) and must land on the identical
    * weights, and therefore identical per-doc scores, down to the last
    * micro-unit. The label is a stopword-density heuristic stated in
    * integers (100·n_stop ≥ 15·n_tokens) so no doubles exist anywhere
    * in the query. */
  private val q167 = QueryDef(
    "q167_learned_quality_probe",
    (s, d) => {
      import graft.functions.TextFunctions._
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val stop = TextAnalysis.stopwords("en")
      def toks = tokens(col("text"))
      def label =
        when(lit(100) * size(filter(toks, x => x.isin(stop: _*)))
          >= lit(15) * size(toks), lit(1000000L)).otherwise(lit(0L))
      val model = TextAnalysis.linearProbeTrain(docs, "text", label,
        nBuckets = 64, steps = 3, lrShift = 5)
      val labels = docs.filter(size(toks) > 0)
        .select(col("doc_id"), label.as("label_micro"))
      TextAnalysis.linearProbeScore(docs, "doc_id", "text", model)
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"), col("label_micro"), col("score_micro"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> length(x) > 0) AS toks
        FROM documents),
      dd AS (SELECT doc_id, toks FROM d WHERE len(toks) > 0),
      y AS (
        SELECT doc_id,
               CASE WHEN 100 * len(list_filter(toks, x -> list_contains(
                        ['the','a','of','and','to','in','is','that','it','for'], x)))
                         >= 15 * len(toks)
                    THEN CAST(1000000 AS BIGINT) ELSE CAST(0 AS BIGINT)
               END AS label_micro
        FROM dd),
      b AS (
        SELECT doc_id,
               (('0x' || substr(md5(tok), 1, 15))::UBIGINT::BIGINT) % 64 AS j
        FROM (SELECT doc_id, unnest(toks) AS tok FROM dd)),
      n AS (SELECT count(*) AS n FROM dd),
      ws AS (SELECT CAST(s.j AS BIGINT) AS j, CAST(0 AS BIGINT) AS w
             FROM generate_series(0, 64) s(j)),
      e1 AS (SELECT doc_id, CAST(0 AS BIGINT) - label_micro AS e FROM y),
      g1 AS (
        SELECT j, CAST(SUM(e) AS BIGINT) AS g FROM (
          SELECT b.j, e1.e FROM b JOIN e1 USING (doc_id)
          UNION ALL
          SELECT CAST(64 AS BIGINT), e FROM e1) GROUP BY j),
      w1 AS (
        SELECT ws.j, ws.w - (COALESCE(g1.g, 0) // ((SELECT n FROM n) * 32)) AS w
        FROM ws LEFT JOIN g1 USING (j)),
      p2 AS (SELECT b.doc_id, CAST(SUM(w1.w) AS BIGINT) AS pw
             FROM b JOIN w1 ON b.j = w1.j GROUP BY b.doc_id),
      e2 AS (SELECT y.doc_id,
                    COALESCE(p2.pw, 0) + (SELECT w FROM w1 WHERE j = 64)
                      - y.label_micro AS e
             FROM y LEFT JOIN p2 USING (doc_id)),
      g2 AS (
        SELECT j, CAST(SUM(e) AS BIGINT) AS g FROM (
          SELECT b.j, e2.e FROM b JOIN e2 USING (doc_id)
          UNION ALL
          SELECT CAST(64 AS BIGINT), e FROM e2) GROUP BY j),
      w2 AS (
        SELECT w1.j, w1.w - (COALESCE(g2.g, 0) // ((SELECT n FROM n) * 32)) AS w
        FROM w1 LEFT JOIN g2 USING (j)),
      p3 AS (SELECT b.doc_id, CAST(SUM(w2.w) AS BIGINT) AS pw
             FROM b JOIN w2 ON b.j = w2.j GROUP BY b.doc_id),
      e3 AS (SELECT y.doc_id,
                    COALESCE(p3.pw, 0) + (SELECT w FROM w2 WHERE j = 64)
                      - y.label_micro AS e
             FROM y LEFT JOIN p3 USING (doc_id)),
      g3 AS (
        SELECT j, CAST(SUM(e) AS BIGINT) AS g FROM (
          SELECT b.j, e3.e FROM b JOIN e3 USING (doc_id)
          UNION ALL
          SELECT CAST(64 AS BIGINT), e FROM e3) GROUP BY j),
      w3 AS (
        SELECT w2.j, w2.w - (COALESCE(g3.g, 0) // ((SELECT n FROM n) * 32)) AS w
        FROM w2 LEFT JOIN g3 USING (j)),
      ps AS (SELECT b.doc_id, CAST(SUM(w3.w) AS BIGINT) AS pw
             FROM b JOIN w3 ON b.j = w3.j GROUP BY b.doc_id)
      SELECT y.doc_id, y.label_micro,
             COALESCE(ps.pw, 0) + (SELECT w FROM w3 WHERE j = 64) AS score_micro
      FROM y LEFT JOIN ps USING (doc_id)
      ORDER BY y.doc_id"""))

  /** BPE tokenizer TRAINING in-query ([[TextAnalysis.bpeTrain]],
    * Sennrich ACL'16), oracle-replayed round by round: three merge
    * rounds over the documents corpus (pair counts weighted by word
    * frequency, ties (count desc, pair asc)), then the post-merge
    * subword vocabulary's top 25. Both engines hold words in the
    * space-wrapped symbol form where greedy pair application is a
    * literal string replace — identical left-to-right non-overlap
    * semantics — so the merge LIST, each pair's count, and the final
    * vocabulary must agree exactly. */
  private val q171 = QueryDef(
    "q171_bpe_tokenizer_train",
    (s, d) => {
      import s.implicits._
      val docs = Tables.documents(s, d).select(col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      val mergesDf = m.zipWithIndex
        .map { case ((p, c), i) => ("merge", (i + 1).toLong, p, c) }
        .toDF("kind", "ord", "token", "cnt")
      val top = TextAnalysis.bpeVocab(docs, "text", m.map(_._1))
        .orderBy(col("cnt").desc, col("sym").asc).limit(25)
        .collect().zipWithIndex
        .map { case (r, i) => ("symbol", (i + 1).toLong, r.getString(0), r.getLong(1)) }
        .toSeq.toDF("kind", "ord", "token", "cnt")
      mergesDf.unionByName(top).orderBy(col("kind"), col("ord"))
    },
    Some("""
      WITH w0 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents) GROUP BY w),
      s0 AS (
        SELECT ' ' || array_to_string(list_transform(generate_series(1, length(w)),
                 i -> substr(w, i, 1)), '  ') || ' ' AS s, c
        FROM w0),
      p1 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s0))
        GROUP BY pair),
      b1 AS (SELECT pair, cnt FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s1 AS (SELECT replace(s,
               ' ' || replace((SELECT pair FROM b1), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ') AS s, c
             FROM s0),
      p2 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s1))
        GROUP BY pair),
      b2 AS (SELECT pair, cnt FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s2 AS (SELECT replace(s,
               ' ' || replace((SELECT pair FROM b2), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ') AS s, c
             FROM s1),
      p3 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s2))
        GROUP BY pair),
      b3 AS (SELECT pair, cnt FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s3 AS (SELECT replace(s,
               ' ' || replace((SELECT pair FROM b3), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b3), ' ', '') || ' ') AS s, c
             FROM s2),
      vocab AS (
        SELECT sym, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(string_split(trim(s), '  ')) AS sym, c FROM s3)
        GROUP BY sym),
      topsym AS (
        SELECT 'symbol' AS kind,
               CAST(row_number() OVER (ORDER BY cnt DESC, sym ASC) AS BIGINT) AS ord,
               sym AS token, cnt
        FROM vocab ORDER BY cnt DESC, sym ASC LIMIT 25)
      SELECT kind, ord, token, cnt FROM (
        SELECT 'merge' AS kind, CAST(1 AS BIGINT) AS ord,
               (SELECT pair FROM b1) AS token, (SELECT cnt FROM b1) AS cnt
        UNION ALL
        SELECT 'merge', CAST(2 AS BIGINT),
               (SELECT pair FROM b2), (SELECT cnt FROM b2)
        UNION ALL
        SELECT 'merge', CAST(3 AS BIGINT),
               (SELECT pair FROM b3), (SELECT cnt FROM b3)
        UNION ALL
        SELECT kind, ord, token, cnt FROM topsym)
      ORDER BY kind, ord"""))

  /** BPE tokenizer APPLICATION ([[TextAnalysis.bpeEncode]]): train 3
    * merges in-query (bit-identical to q171's trainer), then encode
    * every document — per-doc word and subword counts, the numbers a
    * token-budgeted packing/pricing pipeline reads off the tokenizer it
    * just trained. The word-type factorization is the scale story:
    * each DISTINCT word segments once and documents JOIN their words
    * back (vocabulary-bounded work + one mergeable hash join), never a
    * per-occurrence re-segmentation. The oracle replays the 3 merge
    * rounds on the word vocabulary, segments it relationally, and
    * re-joins the docs — any drift in the replace semantics or the
    * join shape breaks the hash. */
  private val q175 = QueryDef(
    "q175_bpe_encode",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      TextAnalysis.bpeEncode(docs, "doc_id", "text", m.map(_._1))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH w0 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents) GROUP BY w),
      s0 AS (
        SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
                 i -> substr(w, i, 1)), '  ') || ' ' AS s, c
        FROM w0),
      p1 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s0))
        GROUP BY pair),
      b1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s1 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b1), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ') AS s, c
             FROM s0),
      p2 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s1))
        GROUP BY pair),
      b2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s2 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b2), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ') AS s, c
             FROM s1),
      p3 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s2))
        GROUP BY pair),
      b3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s3 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b3), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b3), ' ', '') || ' ') AS s
             FROM s2),
      seg AS (
        SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sub
        FROM s3),
      dw AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(SUM(n_sub) AS BIGINT) AS n_subwords
      FROM dw JOIN seg USING (w)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** TOKENIZER-PRICED sequence packing — the full train-time
    * composition: train 3 BPE merges (q171's trainer), price every
    * document in SUBWORDS ([[TextAnalysis.bpeEncode]], q175), then
    * pack the corpus into capacity-1024 context windows
    * ([[graft.operators.Packing.assign]], q90's distributed prefix
    * sum). This is the number chain a real pretraining pipeline runs —
    * context budgets are set in the model's own token units, not in
    * whitespace words. The oracle replays all three stages: the merge
    * ladder, the relational segmentation + doc join, and the windowed
    * prefix sum with the same integer clamps. */
  private val q178 = QueryDef(
    "q178_bpe_priced_packing",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 3)
      val priced = TextAnalysis.bpeEncode(docs, "doc_id", "text", m.map(_._1))
        .select(col("doc_id"), col("n_subwords"))
      graft.operators.Packing.assign(priced, "doc_id", "n_subwords",
        capacity = 1024L).orderBy(col("doc_id"))
    },
    Some("""
      WITH w0 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents) GROUP BY w),
      s0 AS (
        SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
                 i -> substr(w, i, 1)), '  ') || ' ' AS s, c
        FROM w0),
      p1 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s0))
        GROUP BY pair),
      b1 AS (SELECT pair FROM p1 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s1 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b1), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b1), ' ', '') || ' ') AS s, c
             FROM s0),
      p2 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s1))
        GROUP BY pair),
      b2 AS (SELECT pair FROM p2 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s2 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b2), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b2), ' ', '') || ' ') AS s, c
             FROM s1),
      p3 AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s2))
        GROUP BY pair),
      b3 AS (SELECT pair FROM p3 ORDER BY cnt DESC, pair ASC LIMIT 1),
      s3 AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b3), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b3), ' ', '') || ' ') AS s
             FROM s2),
      seg AS (
        SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sub
        FROM s3),
      dw AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents),
      priced AS (
        SELECT doc_id, CAST(SUM(n_sub) AS BIGINT) AS n_tokens
        FROM dw JOIN seg USING (w)
        GROUP BY doc_id),
      c AS (
        SELECT doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS tok_offset
        FROM priced)
      SELECT doc_id, n_tokens, tok_offset,
        tok_offset // 1024 AS seq_id,
        tok_offset % 1024 AS seq_offset,
        (tok_offset + greatest(n_tokens, 1) - 1) // 1024 AS seq_last
      FROM c
      ORDER BY doc_id"""))

  /** The q175-family oracle merge ladder, generated for k rounds: each
    * round counts pairs over the previous round's vocabulary, picks the
    * (count desc, pair asc) argmax, and applies it as the one wrapped
    * literal replace. `s0` must already be defined by the caller. */
  private def bpeRoundsSql(k: Int): String =
    (1 to k).map { i =>
      s"""p$i AS (
        SELECT pair, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
                   i -> sy[i] || ' ' || sy[i+1])) AS pair, c
          FROM (SELECT string_split(trim(s), '  ') AS sy, c FROM s${i - 1}))
        GROUP BY pair),
      b$i AS (SELECT pair FROM p$i ORDER BY cnt DESC, pair ASC LIMIT 1),
      s$i AS (SELECT w, replace(s,
               ' ' || replace((SELECT pair FROM b$i), ' ', '  ') || ' ',
               ' ' || replace((SELECT pair FROM b$i), ' ', '') || ' ') AS s, c
             FROM s${i - 1})"""
    }.mkString(",\n      ")

  /** TOKENIZER AS A TABLE ARTIFACT ([[TextAnalysis.bpeSave]] /
    * [[TextAnalysis.bpeLoad]]): train 4 merges, persist the ordered
    * merge list as a versioned ACID table, then ENCODE the corpus with
    * the tokenizer loaded back FROM THE TABLE — train-once/serve-
    * everywhere as two decoupled jobs, the artifact itself
    * time-travelable. The oracle replays the 4 merge rounds and the
    * relational segmentation; any corruption in the save→load
    * round-trip (ordering, truncation, pair text) breaks the hash. */
  private val q179 = QueryDef(
    "q179_bpe_tokenizer_artifact",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 4)
      val path = s"/tmp/graft_bpe_artifact_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      TextAnalysis.bpeSave(s, m, path)
      // the serving side: the tokenizer comes ONLY from the artifact
      val loaded = TextAnalysis.bpeLoad(s, path)
      TextAnalysis.bpeEncode(docs, "doc_id", "text", loaded.map(_._1))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH w0 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents) GROUP BY w),
      s0 AS (
        SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
                 i -> substr(w, i, 1)), '  ') || ' ' AS s, c
        FROM w0),
      ${bpeRoundsSql(4)},
      seg AS (
        SELECT w, CAST(len(string_split(trim(s), '  ')) AS BIGINT) AS n_sub
        FROM s4),
      dw AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'),
                 x -> length(x) > 0)) AS w
        FROM documents)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
             CAST(SUM(n_sub) AS BIGINT) AS n_subwords
      FROM dw JOIN seg USING (w)
      GROUP BY doc_id
      ORDER BY doc_id"""))

  /** Domain/topic classification by keyword lexicon
    * ([[graft.operators.TextAnalysis.lexiconClassify]]) — the curation
    * primitive behind domain balancing: every document tagged with the
    * taxonomy topic whose keywords it hits most (broadcast lexicon
    * join + two mergeable doc-id aggregations, argmax ties broken
    * topic-ascending; zero-hit docs classify 'unknown'). The oracle
    * replays the explode → join → count → row_number argmax
    * relationally over the same VALUES lexicon. */
  private val q181 = QueryDef(
    "q181_lexicon_domain_classify",
    (s, d) => {
      graft.operators.TextAnalysis.lexiconClassify(
        Tables.documents(s, d), "doc_id", "text",
        Map(
          "storage" -> Seq("table", "row", "column", "scan", "part"),
          "compute" -> Seq("join", "hash", "agg", "sort", "group", "merge"),
          "streaming" -> Seq("stream", "window", "batch"),
          "query" -> Seq("query", "filter", "key", "value")))
    },
    Some("""
      WITH lex(topic, w) AS (VALUES
        ('storage','table'), ('storage','row'), ('storage','column'),
        ('storage','scan'), ('storage','part'),
        ('compute','join'), ('compute','hash'), ('compute','agg'),
        ('compute','sort'), ('compute','group'), ('compute','merge'),
        ('streaming','stream'), ('streaming','window'), ('streaming','batch'),
        ('query','query'), ('query','filter'), ('query','key'),
        ('query','value')),
      words AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> length(x) > 0)) AS w
        FROM documents),
      hits AS (
        SELECT doc_id, topic, count(*) AS hits
        FROM words JOIN lex USING (w) GROUP BY 1, 2),
      win AS (
        SELECT doc_id, topic, hits,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY hits DESC, topic ASC) AS rn
        FROM hits)
      SELECT d.doc_id,
             coalesce(w.topic, 'unknown') AS topic,
             coalesce(w.hits, 0) AS hits
      FROM (SELECT DISTINCT doc_id FROM documents) d
      LEFT JOIN (SELECT doc_id, topic, hits FROM win WHERE rn = 1) w
        USING (doc_id)
      ORDER BY doc_id"""))

  /** The q186/q187 shared oracle: merge-ladder training (4 rounds),
    * per-word subword SEGMENTATION with positions, the frequency-ranked
    * id table (ids 256+, 0–255 reserved for byte fallback), OOV
    * expansion to byte ids, and the per-document flatten in word order
    * — ending at `doc_ids(doc_id, tids)`. ASCII corpus ⇒ the oracle's
    * per-char ascii() equals the engine's true UTF-8 byte fallback. */
  private val tokenIdCtes = s"""w0 AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
          SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                   x -> length(x) > 0)) AS w
          FROM documents) GROUP BY w),
      s0 AS (
        SELECT w, ' ' || array_to_string(list_transform(generate_series(1, length(w)),
                 i -> substr(w, i, 1)), '  ') || ' ' AS s, c
        FROM w0),
      ${bpeRoundsSql(4)},
      seg AS (SELECT w, string_split(trim(s), '  ') AS subs FROM s4),
      vocab AS (
        SELECT sym, CAST(SUM(c) AS BIGINT) AS cnt FROM (
          SELECT unnest(string_split(trim(s), '  ')) AS sym, c FROM s4)
        GROUP BY sym),
      vids AS (
        SELECT sym, 255 + row_number() OVER (ORDER BY cnt DESC, sym ASC)
               AS sym_id
        FROM vocab),
      wsyms AS (
        SELECT w, generate_subscripts(subs, 1) AS spos, unnest(subs) AS sym
        FROM seg),
      sym_ids AS (
        SELECT w, spos,
               CASE WHEN v.sym_id IS NOT NULL THEN [CAST(v.sym_id AS BIGINT)]
                    ELSE list_transform(generate_series(1, length(sym)),
                           i -> CAST(ascii(substr(sym, i, 1)) AS BIGINT))
               END AS ids
        FROM wsyms LEFT JOIN vids v USING (sym)),
      word_ids AS (
        SELECT w, flatten(list(ids ORDER BY spos)) AS word_ids
        FROM sym_ids GROUP BY w),
      dw AS (
        SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS w
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\\s+'),
                                 x -> length(x) > 0) AS ws
              FROM documents)),
      doc_ids AS (
        SELECT doc_id, flatten(list(word_ids ORDER BY wpos)) AS tids
        FROM dw JOIN word_ids USING (w) GROUP BY doc_id)"""

  /** TOKEN-ID SEQUENCE EXPORT ([[TextAnalysis.bpeTokenIds]] — the
    * segmented subword ID sequences a training-batch exporter ships;
    * [[TextAnalysis.bpeEncode]] prices, this emits): train 4 merges,
    * build the frequency-ranked id table over the tokenizer's
    * vocabulary ([[TextAnalysis.bpeVocabIds]], ids 256+, 0–255
    * reserved byte fallback), then export every document's ordered ids
    * — one row per token position. The oracle replays training,
    * per-position segmentation, id ranking, OOV byte expansion, and
    * the word-order flatten. */
  private val q186 = QueryDef(
    "q186_bpe_token_ids",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 4).map(_._1)
      val vids = TextAnalysis.bpeVocabIds(
        TextAnalysis.bpeVocab(docs, "text", m))
      TextAnalysis.bpeTokenIds(docs, "doc_id", "text", m, vids)
        .orderBy(col("doc_id"), col("pos"))
    },
    Some(s"""
      WITH $tokenIdCtes
      SELECT doc_id,
             CAST(generate_subscripts(tids, 1) - 1 AS BIGINT) AS pos,
             unnest(tids) AS token_id
      FROM doc_ids
      ORDER BY doc_id, pos"""))

  /** PACKED TOKEN-ID EXPORT ([[TextAnalysis.bpePackedExport]] — q186's
    * sequences through the distributed prefix-sum packer into
    * capacity-64 context windows, q178's ladder with the ACTUAL ids):
    * one row per (sequence, output position). The oracle collapses the
    * slice arithmetic to the global-position identity — a token at
    * document offset p with stream offset o lands at sequence
    * (o+p)//64, position (o+p)%64 — which is exactly what
    * assign→slices→join computes piecewise. */
  private val q187 = QueryDef(
    "q187_bpe_packed_export",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      val m = TextAnalysis.bpeTrain(docs, "text", merges = 4).map(_._1)
      val vids = TextAnalysis.bpeVocabIds(
        TextAnalysis.bpeVocab(docs, "text", m))
      TextAnalysis.bpePackedExport(docs, "doc_id", "text", m, vids,
          capacity = 64L)
        .orderBy(col("seq_id"), col("out_pos"))
    },
    Some(s"""
      WITH $tokenIdCtes,
      counts AS (
        SELECT doc_id, CAST(len(tids) AS BIGINT) AS n_tokens FROM doc_ids),
      c AS (
        SELECT doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS tok_offset
        FROM counts),
      pos_ids AS (
        SELECT doc_id,
               CAST(generate_subscripts(tids, 1) - 1 AS BIGINT) AS pos,
               unnest(tids) AS token_id
        FROM doc_ids)
      SELECT (c.tok_offset + p.pos) // 64 AS seq_id,
             (c.tok_offset + p.pos) % 64 AS out_pos,
             p.doc_id, p.token_id
      FROM pos_ids p JOIN c USING (doc_id)
      ORDER BY seq_id, out_pos"""))

  override val entries: Seq[QueryDef] =
    Seq(q60, q61, q62, q63, q64, q65, q81, q84, q86, q91, q93, q96, q117,
      q121, q126, q137, q138, q167, q171, q175, q178, q179, q181, q186,
      q187)
}
