package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Scalar-function families (SURVEY.md §2.B): string, date/time, math,
  * JSON, array/struct/explode. Everything is a built-in codegen'd
  * function — no UDFs — so the whole projection stays inside one
  * WholeStageCodegen span over the parquet scan.
  */
object Scalars extends QueryModule {

  /** String functions: concat, substring, upper/lower, trim, length,
    * split, regexp_extract, like. */
  private val q26 = QueryDef(
    "q26_string_functions",
    (s, d) => {
      Tables.part(s, d)
        .filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          concat(upper(col("p_brand")), lit(":"), lower(col("p_name"))).as("tag"),
          substring(col("p_name"), 1, 4).as("head4"),
          length(col("p_name")).as("name_len"),
          trim(lit("  padded  ")).as("trimmed"),
          size(split(col("p_name"), " ")).as("n_words"),
          regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
          col("p_name").like("%bolt%").as("is_bolt"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      SELECT p_partkey,
             concat(upper(p_brand), ':', lower(p_name)) AS tag,
             substring(p_name, 1, 4) AS head4,
             length(p_name) AS name_len,
             trim('  padded  ') AS trimmed,
             len(string_split(p_name, ' ')) AS n_words,
             regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
             (p_name LIKE '%bolt%') AS is_bolt
      FROM part
      WHERE p_partkey <= 500
      ORDER BY p_partkey"""))

  /** Date/time functions over event time: year/month/day/hour, date_trunc,
    * date_format, unix epoch, quarter, ISO week (the partition-bucket
    * functions of SURVEY §1.4 on event time). */
  private val q27 = QueryDef(
    "q27_datetime_functions",
    (s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") <= 500)
        .select(
          col("event_id"),
          year(col("ts")).as("y"),
          month(col("ts")).as("m"),
          dayofmonth(col("ts")).as("dom"),
          hour(col("ts")).as("h"),
          quarter(col("ts")).as("q"),
          weekofyear(col("ts")).as("iso_week"),
          date_format(col("ts"), "yyyy-MM-dd").as("day_str"),
          date_format(date_trunc("month", col("ts")), "yyyy-MM-dd").as("month_start"),
          unix_timestamp(col("ts")).as("epoch_sec"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             year(ts) AS y, month(ts) AS m, day(ts) AS dom, hour(ts) AS h,
             quarter(ts) AS q, weekofyear(ts) AS iso_week,
             strftime(ts, '%Y-%m-%d') AS day_str,
             strftime(date_trunc('month', ts), '%Y-%m-%d') AS month_start,
             CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec
      FROM events
      WHERE event_id <= 500
      ORDER BY event_id"""))

  /** Math functions: arithmetic, %, round/floor/ceil/abs/pow/ln. */
  private val q28 = QueryDef(
    "q28_math_functions",
    (s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 200)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          Rnd.halfUp(col("l_extendedprice") * col("l_discount") / lit(2.0) + col("l_tax") - lit(0.5), 3).as("arith"),
          (col("l_orderkey") % 7).as("mod7"),
          floor(col("l_extendedprice")).as("fl"),
          ceil(col("l_extendedprice")).as("ce"),
          abs(col("l_discount") - lit(0.5)).cast("decimal(10,4)").cast("double").as("absd"),
          Rnd.halfUp(pow(col("l_quantity"), 2), 2).as("qty_sq"),
          Rnd.halfUp(log(col("l_extendedprice") + lit(1.0)), 6).as("ln_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             floor((l_extendedprice * l_discount / 2.0 + l_tax - 0.5) * 1000.0 + 0.5) / 1000.0 AS arith,
             l_orderkey % 7 AS mod7,
             CAST(floor(l_extendedprice) AS BIGINT) AS fl,
             CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
             CAST(CAST(abs(l_discount - 0.5) AS DECIMAL(10,4)) AS DOUBLE) AS absd,
             floor(pow(l_quantity, 2) * 100.0 + 0.5) / 100.0 AS qty_sq,
             floor(ln(l_extendedprice + 1.0) * 1000000.0 + 0.5) / 1000000.0 AS ln_price
      FROM lineitem
      WHERE l_orderkey <= 200
      ORDER BY l_orderkey, l_linenumber"""))

  /** JSON functions over the events.props payload column:
    * get_json_object / typed extraction (core of ingest ops A2/A8/A9);
    * schema_of_json's inferred DDL pinned against its documented value. */
  private val q29 = QueryDef(
    "q29_json_functions",
    (s, d) => {
      Tables.events(s, d)
        .select(
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"))
        .withColumn("props_schema", schema_of_json(lit("""{"k": 1}""")))
        .orderBy(col("k"))
    },
    Some("""
      SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k, count(*) AS n,
             'STRUCT<k: BIGINT>' AS props_schema
      FROM events
      GROUP BY 1
      ORDER BY k"""))

  /** Array ops + explode (Generator): tokenize document text, explode,
    * count word frequencies — the canonical "flatten then aggregate". */
  private val q30 = QueryDef(
    "q30_explode_wordcount",
    (s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(length(col("word")) > 0)
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
    },
    Some("""
      SELECT word, count(*) AS n
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      WHERE length(word) > 0
      GROUP BY word
      ORDER BY n DESC NULLS LAST, word"""))

  /** Array scalar ops: size, array_contains, element_at, sort, distinct. */
  private val q31 = QueryDef(
    "q31_array_functions",
    (s, d) => {
      Tables.documents(s, d)
        .filter(col("doc_id") <= 100)
        .withColumn("words", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("words")).as("n_tokens"),
          array_contains(col("words"), "spark").as("has_spark"),
          element_at(col("words"), 1).as("first_word"),
          element_at(col("words"), -1).as("last_word"),
          size(array_distinct(col("words"))).as("n_distinct"),
          element_at(array_sort(array_distinct(col("words"))), 1).as("min_word"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             len(words) AS n_tokens,
             list_contains(words, 'spark') AS has_spark,
             words[1] AS first_word,
             words[-1] AS last_word,
             len(list_distinct(words)) AS n_distinct,
             list_sort(list_distinct(words))[1] AS min_word
      FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
      WHERE doc_id <= 100
      ORDER BY doc_id"""))

  /** Struct build + nested field access (payload.props.x pattern of the
    * reference's envelope, SURVEY §2.B "nested-field access"). */
  private val q32 = QueryDef(
    "q32_struct_nested",
    (s, d) => {
      Tables.events(s, d)
        .filter(col("event_id") <= 300)
        .withColumn("payload", struct(
          col("event_type").as("type"),
          struct(col("user_id").as("uid"), col("value").as("v")).as("props")))
        .select(
          col("event_id"),
          col("payload.type").as("ptype"),
          col("payload.props.uid").as("uid"),
          round(col("payload.props.v"), 2).as("pv"))
        .orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id,
             payload.type AS ptype,
             payload.props.uid AS uid,
             round(payload.props.v, 2) AS pv
      FROM (SELECT event_id,
                   {'type': event_type,
                    'props': {'uid': user_id, 'v': value}} AS payload
            FROM events)
      WHERE event_id <= 300
      ORDER BY event_id"""))

  override val entries: Seq[QueryDef] = Seq(q26, q27, q28, q29, q30, q31, q32)
}
