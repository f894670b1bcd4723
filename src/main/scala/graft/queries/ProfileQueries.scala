package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Profile
import org.apache.spark.sql.functions._

/** Table-profiling surface (operators/Profile.scala): ANALYZE-style
  * per-column statistics, fully deterministic (string-form values,
  * count ties broken by value asc) so every statistic — including the
  * modal value — hash-matches the DuckDB replay. */
object ProfileQueries extends QueryModule {

  /** Profile six lineitem columns (3 low-cardinality strings, 3 key
    * ints) in one melted scan. */
  private val q88 = QueryDef(
    "q88_table_profile",
    (s, d) => {
      Profile.columns(Tables.lineitem(s, d),
          Seq("l_returnflag", "l_linestatus", "l_partkey",
            "l_linenumber", "l_suppkey", "l_orderkey"))
        .orderBy(col("col_name"))
    },
    Some("""
      WITH m AS (
        SELECT 'l_returnflag' AS col_name, l_returnflag::VARCHAR AS value FROM lineitem
        UNION ALL SELECT 'l_linestatus', l_linestatus::VARCHAR FROM lineitem
        UNION ALL SELECT 'l_partkey', l_partkey::VARCHAR FROM lineitem
        UNION ALL SELECT 'l_linenumber', l_linenumber::VARCHAR FROM lineitem
        UNION ALL SELECT 'l_suppkey', l_suppkey::VARCHAR FROM lineitem
        UNION ALL SELECT 'l_orderkey', l_orderkey::VARCHAR FROM lineitem),
      stats AS (
        SELECT col_name, count(*) AS n_rows,
               count(*) - count(value) AS n_null,
               count(DISTINCT value) AS n_distinct,
               min(value) AS min_value, max(value) AS max_value
        FROM m GROUP BY col_name),
      top AS (
        SELECT col_name, value AS top_value, cnt AS top_count FROM (
          SELECT col_name, value, count(*) AS cnt,
                 row_number() OVER (PARTITION BY col_name
                   ORDER BY count(*) DESC, value ASC) AS rn
          FROM m WHERE value IS NOT NULL
          GROUP BY col_name, value) t
        WHERE rn = 1)
      SELECT s.col_name, s.n_rows, s.n_null, s.n_distinct,
             s.min_value, s.max_value, t.top_value, t.top_count
      FROM stats s LEFT JOIN top t USING (col_name)
      ORDER BY s.col_name"""))

  /** Typed numeric profile of four lineitem measure columns: exact
    * moments (count/null/min/max and the half-up-6 mean) hash-compared;
    * the GK quantile sketch is BOUND-verified (the q79 pattern —
    * within_bound recomputes each sketch value's rank against the data
    * and checks the 1/accuracy + 1/n guarantee, which the oracle then
    * asserts as a literal 1). */
  private val q102 = QueryDef(
    "q102_numeric_profile",
    (s, d) => {
      Profile.numericColumns(Tables.lineitem(s, d),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
          percentiles = Seq(0.5, 0.9, 0.99), accuracy = 1000)
        .select(col("col_name"), col("n_rows"), col("n_null"),
          col("min_value"), col("max_value"),
          Rnd.halfUp(col("mean"), 6).as("mean6"), col("within_bound"))
        .orderBy(col("col_name"))
    },
    Some("""
      WITH m AS (
        SELECT 'l_quantity' AS col_name, l_quantity::DOUBLE AS x FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice::DOUBLE FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount::DOUBLE FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax::DOUBLE FROM lineitem)
      SELECT col_name, count(*) AS n_rows,
             count(*) - count(x) AS n_null,
             min(x) AS min_value, max(x) AS max_value,
             floor(avg(x) * 1000000.0 + 0.5) / 1000000.0 AS mean6,
             CAST(1 AS BIGINT) AS within_bound
      FROM m GROUP BY col_name
      ORDER BY col_name"""))

  /** Typed temporal profile across two tables' event-time columns —
    * true calendar min/max/span (the string branch would order dates
    * lexicographically only by accident of ISO formatting; the numeric
    * branch can't express them at all). Exact, so fully hash-compared. */
  private val q110 = QueryDef(
    "q110_temporal_profile",
    (s, d) => {
      Profile.temporalColumns(Tables.lineitem(s, d), Seq("l_shipdate"))
        .unionByName(
          Profile.temporalColumns(Tables.orders(s, d), Seq("o_orderdate")))
        .orderBy(col("col_name"))
    },
    Some("""
      WITH m AS (
        SELECT 'l_shipdate' AS col_name, CAST(l_shipdate AS TIMESTAMP) AS t FROM lineitem
        UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS TIMESTAMP) FROM orders)
      SELECT col_name, count(*) AS n_rows,
             count(*) - count(t) AS n_null,
             min(t) AS min_value, max(t) AS max_value,
             date_diff('day', CAST(min(t) AS DATE), CAST(max(t) AS DATE)) AS span_days
      FROM m GROUP BY col_name
      ORDER BY col_name"""))

  /** Bivariate dependence branch: per-returnflag correlation /
    * covariance / regression of extendedprice on quantity, moments
    * accumulated as exact DECIMAL(38,0) fixed-point sums (HUGEINT on
    * the DuckDB side) so both engines feed bit-identical integers into
    * the same double DAG; the half-up-6 rounding absorbs sub-ulp
    * int128→double conversion differences. Either-null pairs excluded
    * (pairwise-complete). */
  private val q133 = QueryDef(
    "q133_dependence_profile",
    (s, d) => {
      Profile.dependence(Tables.lineitem(s, d),
          "l_quantity", "l_extendedprice", Seq("l_returnflag"), scale = 2)
        .select(col("l_returnflag"), col("n_pairs"),
          Rnd.halfUp(col("corr"), 6).as("corr6"),
          Rnd.halfUp(col("covar_samp"), 4).as("covar4"),
          Rnd.halfUp(col("slope"), 6).as("slope6"),
          Rnd.halfUp(col("intercept"), 4).as("intercept4"),
          Rnd.halfUp(col("r2"), 6).as("r2_6"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""
      WITH m AS (
        SELECT l_returnflag AS g,
               CAST(floor(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) AS HUGEINT) AS x,
               CAST(floor(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS HUGEINT) AS y
        FROM lineitem
        WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
      mo AS (
        SELECT g, CAST(count(*) AS HUGEINT) AS n,
               sum(x) AS sx, sum(y) AS sy,
               sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM m GROUP BY g),
      s AS (
        SELECT g, n,
               CAST(n * sxy - sx * sy AS DOUBLE) AS num,
               CAST(n * sxx - sx * sx AS DOUBLE) AS dx,
               CAST(n * syy - sy * sy AS DOUBLE) AS dy,
               CAST(n AS DOUBLE) AS nd,
               CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd
        FROM mo)
      SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n_pairs,
             ${Rnd.sql("num / sqrt(dx * dy)", 6)} AS corr6,
             ${Rnd.sql("num / (nd * (nd - 1.0) * 10000.0)", 4)} AS covar4,
             ${Rnd.sql("num / dx", 6)} AS slope6,
             ${Rnd.sql("(syd - (num / dx) * sxd) / (nd * 100.0)", 4)} AS intercept4,
             ${Rnd.sql("(num / sqrt(dx * dy)) * (num / sqrt(dx * dy))", 6)} AS r2_6
      FROM s
      ORDER BY l_returnflag"""))

  /** Per-source data card — the release-notes table a dataset ships
    * with: volume (docs, tokens, chars), redundancy (exact-content
    * distinct count and the dup rate it implies), and language mix, all
    * derived from exact integer counts so every cell hash-matches. One
    * scan into a per-(source, content-key) aggregate, then a per-source
    * rollup; the token count rides the same scan as a projection. */
  private val q147 = QueryDef(
    "q147_source_data_card",
    (s, d) => {
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, d)
        .select(col("source"), col("lang"), col("n_chars"),
          graft.operators.Dedup.contentKey(col("text")).as("__h"),
          size(TextFunctions.tokens(col("text"))).cast("long").as("__tok"))
      val perContent = docs
        .groupBy(col("source"), col("__h"))
        .agg(count(lit(1)).as("__n"), sum(col("__tok")).as("__t"),
          sum(col("n_chars")).as("__c"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"))
      perContent.groupBy(col("source"))
        .agg(sum(col("__n")).as("n_docs"),
          sum(col("__t")).as("n_tokens"),
          count(lit(1)).as("n_distinct_contents"),
          Rnd.halfUp(
            (sum(col("__n")) - count(lit(1))).cast("double") /
              sum(col("__n")).cast("double"), 6).as("dup_rate6"),
          Rnd.halfUp(sum(col("__en")).cast("double") /
            sum(col("__n")).cast("double"), 6).as("en_frac6"),
          Rnd.halfUp(sum(col("__c")).cast("double") /
            sum(col("__n")).cast("double"), 4).as("mean_chars4"))
        .orderBy(col("source"))
    },
    Some("""
      WITH docs AS (
        SELECT source, lang, n_chars, md5(text) AS h,
               len(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0))::BIGINT AS tok
        FROM documents),
      pc AS (
        SELECT source, h, count(*) AS n, CAST(sum(tok) AS BIGINT) AS t,
               CAST(sum(n_chars) AS BIGINT) AS c,
               CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en
        FROM docs GROUP BY source, h)
      SELECT source,
             CAST(sum(n) AS BIGINT) AS n_docs,
             CAST(sum(t) AS BIGINT) AS n_tokens,
             count(*) AS n_distinct_contents,
             floor((CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS dup_rate6,
             floor((CAST(sum(en) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS en_frac6,
             floor((CAST(sum(c) AS DOUBLE) / CAST(sum(n) AS DOUBLE))
               * 10000.0 + 0.5) / 10000.0 AS mean_chars4
      FROM pc GROUP BY source
      ORDER BY source"""))

  /** Token-count histogram ([[Profile.histogram]]): the corpus length
    * distribution in 8 equi-width buckets — exact counts, bounds from
    * one extremes collect, bucket edges rounded for the cross-engine
    * hash (presentation only; bucket ASSIGNMENT is the shared double
    * DAG). */
  private val q152 = QueryDef(
    "q152_length_histogram",
    (s, d) => {
      import graft.functions.TextFunctions
      val toks = Tables.documents(s, d)
        .select(size(TextFunctions.tokens(col("text"))).cast("long").as("x"))
      Profile.histogram(toks, "x", nBuckets = 8)
        .select(col("bucket"), Rnd.halfUp(col("lo"), 6).as("lo6"),
          Rnd.halfUp(col("hi"), 6).as("hi6"), col("n"))
        .orderBy(col("bucket"))
    },
    Some("""
      WITH t AS (
        SELECT len(list_filter(string_split_regex(text, '\s+'),
                 x -> length(x) > 0))::BIGINT AS x
        FROM documents),
      mm AS (
        SELECT CAST(min(x) AS DOUBLE) AS lo, CAST(max(x) AS DOUBLE) AS hi
        FROM t WHERE x IS NOT NULL),
      b AS (
        SELECT CAST(least(7.0, floor((CAST(x AS DOUBLE) - mm.lo)
                 / ((mm.hi - mm.lo) / 8.0))) AS BIGINT) AS bucket
        FROM t, mm WHERE x IS NOT NULL)
      SELECT bucket,
             floor(((SELECT lo FROM mm)
               + CAST(bucket AS DOUBLE) * ((SELECT (hi - lo) / 8.0 FROM mm)))
               * 1000000.0 + 0.5) / 1000000.0 AS lo6,
             floor(((SELECT lo FROM mm)
               + CAST(bucket + 1 AS DOUBLE) * ((SELECT (hi - lo) / 8.0 FROM mm)))
               * 1000000.0 + 0.5) / 1000000.0 AS hi6,
             count(*) AS n
      FROM b GROUP BY bucket
      ORDER BY bucket"""))

  override val entries: Seq[QueryDef] = Seq(q88, q102, q110, q133, q147, q152)
}
