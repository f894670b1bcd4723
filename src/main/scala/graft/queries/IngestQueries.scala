package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators._
import org.apache.spark.sql.functions._

/** The ingest-side operators of SURVEY §2.A surfaced as oracle-checkable
  * queries. Raw messages are reconstructed deterministically from the
  * events table (identical string construction in Spark and DuckDB), so
  * the oracle exercises the same envelope/routing/masking/partitioning
  * semantics the pipeline applies, not a reimplementation shortcut.
  */
object IngestQueries extends QueryModule {

  /** A2 envelope projection + identity precedence over synthesized raw
    * JSON (projectId > writeKey; payload verbatim). */
  private val q33 = QueryDef(
    "q33_envelope_projection",
    (s, d) => {
      val raw = Tables.events(s, d)
        .select(
          when(col("user_id") % 4 === 0,
            format_string("""{"projectId":"proj-%d","writeKey":"wk-%d","stream_id":"sid-%d","type":"%s","v":%d}""",
              col("user_id"), col("user_id"), col("user_id"), col("event_type"), col("user_id")))
          .otherwise(
            format_string("""{"writeKey":"wk-%d","stream_id":"sid-%d","v":%d}""",
              col("user_id"), col("user_id"), col("user_id"))).as("json"))
      Envelope.project(raw, "json")
        .groupBy(col("stream_id"), col("stream_alt_id"), col("message_type"))
        .agg(count(lit(1)).as("n"), min(col("payload")).as("sample_payload"))
        .orderBy(col("stream_id"), col("stream_alt_id").asc_nulls_first,
          col("message_type").asc_nulls_first)
    },
    Some("""
      WITH raw AS (
        SELECT CASE WHEN user_id % 4 = 0
               THEN printf('{"projectId":"proj-%d","writeKey":"wk-%d","stream_id":"sid-%d","type":"%s","v":%d}',
                           user_id, user_id, user_id, event_type, user_id)
               ELSE printf('{"writeKey":"wk-%d","stream_id":"sid-%d","v":%d}',
                           user_id, user_id, user_id) END AS json
        FROM events),
      env AS (
        SELECT nullif(json_extract_string(json, '$.stream_id'), '') AS stream_id,
               coalesce(nullif(json_extract_string(json, '$.projectId'), ''),
                        nullif(json_extract_string(json, '$.writeKey'), '')) AS stream_alt_id,
               nullif(json_extract_string(json, '$.type'), '') AS message_type,
               json AS payload
        FROM raw)
      SELECT stream_id, stream_alt_id, message_type,
             count(*) AS n, min(payload) AS sample_payload
      FROM env
      GROUP BY 1, 2, 3
      ORDER BY stream_id, stream_alt_id ASC NULLS FIRST, message_type ASC NULLS FIRST"""))

  /** A7 control filter + A8 type precedence on a stream with rtdl_205
    * control messages mixed in. */
  private val q34 = QueryDef(
    "q34_control_and_type_precedence",
    (s, d) => {
      val msgs = Tables.events(s, d)
        .select(
          when(col("event_id") % 100 === 0, lit(Envelope.ControlMessageType))
            .when(col("event_id") % 3 === 0, col("event_type"))
            .otherwise(lit("")).as("message_type"),
          when(col("event_id") % 5 === 0,
            format_string("""{"type":"pt-%s"}""", col("event_type")))
            .otherwise(lit("{}")).as("payload"))
      Envelope.filterControl(msgs)
        .select(Envelope.resolvedMessageType(
          col("payload"), col("message_type"), lit("cfg-default")).as("resolved"))
        .groupBy(col("resolved"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("resolved"))
    },
    Some("""
      WITH msgs AS (
        SELECT CASE WHEN event_id % 100 = 0 THEN 'rtdl_205'
                    WHEN event_id % 3 = 0 THEN event_type
                    ELSE '' END AS message_type,
               CASE WHEN event_id % 5 = 0 THEN printf('{"type":"pt-%s"}', event_type)
                    ELSE '{}' END AS payload
        FROM events)
      SELECT coalesce(nullif(json_extract_string(payload, '$.type'), ''),
                      nullif(message_type, ''),
                      'cfg-default') AS resolved,
             count(*) AS n
      FROM msgs
      WHERE message_type IS NULL OR message_type <> 'rtdl_205'
      GROUP BY 1
      ORDER BY resolved"""))

  /** A21 PII masking: exact reference regexes over text salted with
    * deterministic SSN/phone strings (incl. the leading-1 near-miss). */
  private val q35 = QueryDef(
    "q35_pii_masking",
    (s, d) => {
      val salted = Tables.documents(s, d)
        .select(col("doc_id"),
          format_string("%s ssn=%03d-%02d-%04d phone=%d%02d-555-%04d note=123-555-1234",
            substring(col("text"), 1, 40),
            col("doc_id") % 1000, col("doc_id") % 100, col("doc_id") % 10000,
            col("doc_id") % 8 + 2, col("doc_id") % 100, col("doc_id") % 10000).as("txt"))
      salted.select(col("doc_id"), PiiMask.mask(col("txt")).as("masked"))
        .orderBy(col("doc_id"))
    },
    Some("""
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 printf('%s ssn=%03d-%02d-%04d phone=%d%02d-555-%04d note=123-555-1234',
                        substring(text, 1, 40),
                        doc_id % 1000, doc_id % 100, doc_id % 10000,
                        doc_id % 8 + 2, doc_id % 100, doc_id % 10000),
                 '\d{3}-\d{2}-\d{4}', '###', 'g'),
               '[2-9]\d{2}-\d{3}-\d{4}', '###', 'g') AS masked
      FROM documents
      ORDER BY doc_id"""))

  /** A10 time-partition buckets, all five granularities on event time. */
  private val q36 = QueryDef(
    "q36_time_partition_buckets",
    (s, d) => {
      val ev = Tables.events(s, d)
      ev.select(
          TimePartitions.bucket(col("ts"), TimePartitions.Hourly).as("hourly"),
          TimePartitions.bucket(col("ts"), TimePartitions.Daily).as("daily"),
          TimePartitions.bucket(col("ts"), TimePartitions.Weekly).as("weekly"),
          TimePartitions.bucket(col("ts"), TimePartitions.Monthly).as("monthly"),
          TimePartitions.bucket(col("ts"), TimePartitions.Quarterly).as("quarterly"))
        .groupBy(col("hourly"), col("daily"), col("weekly"), col("monthly"), col("quarterly"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("hourly"))
    },
    Some("""
      SELECT strftime(ts, '%Y-%m-%d-%H') AS hourly,
             strftime(ts, '%Y-%m-%d') AS daily,
             concat(CAST(isoyear(ts) AS VARCHAR), '-', CAST(weekofyear(ts) AS VARCHAR)) AS weekly,
             strftime(ts, '%Y-%m') AS monthly,
             concat(strftime(ts, '%Y'), '-', CAST(quarter(ts) AS VARCHAR)) AS quarterly,
             count(*) AS n
      FROM events
      GROUP BY 1, 2, 3, 4, 5
      ORDER BY hourly"""))

  /** A3/A4 config routing: alt-id-over-id precedence, chain head → topic,
    * config message_type fallback — via the real Router over an inline
    * config set. */
  private val q37 = QueryDef(
    "q37_config_routing",
    (s, d) => {
      val configs = Seq(
        StreamConfig("sid-0", "", active = true, "cfg-t0", 1, "", 2, 1, Seq("ingester")),
        StreamConfig("sid-1", "alt-1", active = true, "cfg-t1", 1, "", 2, 1, Seq("pii-detection", "ingester")),
        StreamConfig("", "alt-2", active = true, "cfg-t2", 1, "", 2, 1, Seq.empty),
        StreamConfig("sid-3", "", active = true, "", 1, "", 2, 1, Seq("deltawriter", "ingester")))
      val msgs = Tables.events(s, d)
        .select(
          format_string("sid-%d", col("user_id") % 5).as("stream_id"),
          when(col("user_id") % 3 === 0,
            format_string("alt-%d", col("user_id") % 5)).as("stream_alt_id"),
          when(col("user_id") % 2 === 0, col("event_type")).otherwise(lit("")).as("message_type"),
          lit("{}").as("payload"))
      Router.route(s, msgs, configs)
        .groupBy(col("stream_id"), col("stream_alt_id"),
          col("cfg_stream_id"), col("cfg_message_type"),
          col("route_topic"), col("message_type_resolved"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("stream_id"), col("stream_alt_id").asc_nulls_first,
          col("message_type_resolved"))
    },
    Some("""
      WITH cfg(cfg_stream_id, cfg_stream_alt_id, cfg_message_type, cfg_functions) AS (
        VALUES ('sid-0', '', 'cfg-t0', 'ingester'),
               ('sid-1', 'alt-1', 'cfg-t1', 'pii-detection,ingester'),
               ('', 'alt-2', 'cfg-t2', ''),
               ('sid-3', '', '', 'deltawriter,ingester')),
      msgs AS (
        SELECT printf('sid-%d', user_id % 5) AS stream_id,
               CASE WHEN user_id % 3 = 0 THEN printf('alt-%d', user_id % 5) END AS stream_alt_id,
               CASE WHEN user_id % 2 = 0 THEN event_type ELSE '' END AS message_type,
               '{}' AS payload
        FROM events),
      routed AS (
        SELECT m.stream_id, m.stream_alt_id, m.message_type, m.payload,
               CASE WHEN a.cfg_stream_alt_id IS NOT NULL THEN a.cfg_stream_id ELSE b.cfg_stream_id END AS cfg_stream_id,
               CASE WHEN a.cfg_stream_alt_id IS NOT NULL THEN a.cfg_message_type ELSE b.cfg_message_type END AS cfg_message_type,
               CASE WHEN a.cfg_stream_alt_id IS NOT NULL THEN a.cfg_functions ELSE b.cfg_functions END AS cfg_functions,
               (a.cfg_stream_alt_id IS NOT NULL OR b.cfg_stream_id IS NOT NULL) AS matched
        FROM msgs m
        LEFT JOIN cfg a ON a.cfg_stream_alt_id <> '' AND m.stream_alt_id = a.cfg_stream_alt_id
        LEFT JOIN cfg b ON b.cfg_stream_id <> '' AND m.stream_id = b.cfg_stream_id)
      SELECT stream_id, stream_alt_id, cfg_stream_id, cfg_message_type,
             CASE WHEN matched THEN
               concat(coalesce(nullif(string_split(cfg_functions, ',')[1], ''), 'ingester'), '-ingress')
             ELSE concat(coalesce(nullif(string_split(CAST(NULL AS VARCHAR), ',')[1], ''), 'ingester'), '-ingress') END AS route_topic,
             coalesce(nullif(json_extract_string(payload, '$.type'), ''),
                      nullif(message_type, ''),
                      nullif(cfg_message_type, ''),
                      'rtdl_default') AS message_type_resolved,
             count(*) AS n
      FROM routed
      GROUP BY 1, 2, 3, 4, 5, 6
      ORDER BY stream_id, stream_alt_id ASC NULLS FIRST, message_type_resolved"""))

  /** approx_count_distinct (HLL++): sketch values are engine-specific and
    * not cross-engine-replayable, so the oracle contract is a BOUND, not
    * the estimate itself: Spark emits `within_5pct = 1` iff the HLL
    * estimate lands within 5% relative error of the exact distinct count;
    * DuckDB emits the exact count and a constant 1. A drifting sketch
    * hash-mismatches (1 vs 0) — a real pass/fail row, not `no_oracle`.
    * rsd=0.02 sizes the sketch so typical error is well inside the 5%
    * contract (HLL merge is register-wise max → partition-order
    * deterministic). The replayable-sketch counterpart is q47 (KMV). */
  private val q38 = QueryDef(
    "q38_approx_count_distinct",
    (s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(
          col("l_returnflag"),
          col("exact_parts"),
          when(abs(col("approx_parts").cast("double") / col("exact_parts") - 1.0d) <= 0.05d, 1L)
            .otherwise(0L).as("within_5pct"))
        .orderBy(col("l_returnflag"))
    },
    Some("""
      SELECT l_returnflag,
             count(DISTINCT l_partkey) AS exact_parts,
             CAST(1 AS BIGINT) AS within_5pct
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  /** KMV distinct sketch (custom mergeable Aggregator over the h60 hash
    * family): the oracle-verifiable approximate-distinct — unlike q38's
    * HLL, the sketch state (k minimum hashes) replays exactly in DuckDB,
    * so the estimate hash-matches. Exact count included for accuracy. */
  private val q47 = QueryDef(
    "q47_kmv_distinct_sketch",
    (s, d) => {
      import graft.functions.TextFunctions.h60
      val k = 64
      val kM = 1152921504606846976.0 // h60 domain is [0, 16^15) = [0, 2^60)
      val kmv = udaf(graft.functions.KmvSketch(k))
      Tables.events(s, d)
        .select(col("event_type"), col("user_id"), h60(col("user_id")).as("h"))
        .groupBy(col("event_type"))
        .agg(kmv(col("h")).as("sk"),
          countDistinct(col("user_id")).as("exact_distinct"))
        .withColumn("est",
          when(col("sk._1") < k, col("sk._1").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(kM) / col("sk._2")))
        .select(col("event_type"),
          col("sk._1").as("n_min"), col("sk._2").as("kth_hash"),
          Rnd.halfUp(col("est"), 2).as("est2"), col("exact_distinct"))
        .orderBy(col("event_type"))
    },
    Some("""
      WITH h AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM events),
      r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h),
      sk AS (
        SELECT event_type,
               CAST(least(count(*), 64) AS INT) AS n_min,
               max(h) FILTER (WHERE rn <= 64) AS kth_hash
        FROM r GROUP BY event_type),
      ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type)
      SELECT s.event_type, n_min, kth_hash,
             floor((CASE WHEN n_min < 64 THEN n_min::DOUBLE
                         ELSE 63.0 * 1152921504606846976.0 / kth_hash END)
                   * 100.0 + 0.5) / 100.0 AS est2,
             exact_distinct
      FROM sk s JOIN ex USING (event_type)
      ORDER BY event_type"""))

  /** Z-order clustered layout ([[Layout]]): bucketize (doc_id, n_chars)
    * to 8 bits each by data-derived min-max bounds, interleave into the
    * 16-bit Morton code, and roll up the curve's 16 top-level shards —
    * count, per-dimension bounding box, and the exact per-row z-value
    * sum (every row's interleave arithmetic is hash-verified through
    * `z_sum`). The shard bounding boxes ARE the data-skipping story:
    * each curve segment covers a tight box in BOTH dimensions at once,
    * which is what parquet footer min/max pruning keys on. */
  private val q113 = QueryDef(
    "q113_zorder_layout",
    (s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      docs
        .withColumn("zv", Layout.zColumn(docs, Seq("doc_id", "n_chars"), bits = 8))
        .withColumn("shard", shiftright(col("zv"), 12))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("id_min"), max(col("doc_id")).as("id_max"),
          min(col("n_chars")).as("nc_min"), max(col("n_chars")).as("nc_max"),
          sum(col("zv")).as("z_sum"))
        .orderBy(col("shard"))
    },
    Some("""
      WITH bounds AS (
        SELECT min(doc_id)::DOUBLE AS idlo, max(doc_id)::DOUBLE AS idhi,
               min(n_chars)::DOUBLE AS nclo, max(n_chars)::DOUBLE AS nchi
        FROM documents),
      bkt AS (
        SELECT doc_id, n_chars,
          CASE WHEN idhi <= idlo THEN 0
               ELSE least(255, greatest(0,
                 floor(((doc_id::DOUBLE - idlo) / (idhi - idlo)) * 256.0)))::BIGINT
          END AS bx,
          CASE WHEN nchi <= nclo THEN 0
               ELSE least(255, greatest(0,
                 floor(((n_chars::DOUBLE - nclo) / (nchi - nclo)) * 256.0)))::BIGINT
          END AS bn
        FROM documents CROSS JOIN bounds),
      z AS (
        SELECT doc_id, n_chars,
          list_sum(list_transform(generate_series(0, 7),
            b -> (((bx >> b) & 1) << (2 * b)) +
                 (((bn >> b) & 1) << (2 * b + 1))))::BIGINT AS zv
        FROM bkt)
      SELECT zv >> 12 AS shard, count(*) AS n_docs,
             min(doc_id) AS id_min, max(doc_id) AS id_max,
             min(n_chars) AS nc_min, max(n_chars) AS nc_max,
             sum(zv)::BIGINT AS z_sum
      FROM z
      GROUP BY 1
      ORDER BY shard"""))

  /** Seed a [[TxLogTable]] from the supplier table and run the full DML
    * sequence the reference's Delta lineage supports (delta_writer.py:
    * 88-94, extended to the MERGE/DELETE surface): v0 = seed append,
    * v1 = keyed UPSERT (nationkey<5 rows replaced with bumped balances
    * and '_v2' names; nationkey>=20 rows re-inserted under shifted keys),
    * v2 = predicate DELETE of nationkey 7. Rebuilt from scratch on every
    * call (delete-first), so the query is idempotent and deterministic —
    * the oracle replays the same relational algebra over the raw
    * parquet. Returns the table path. */
  private def acidDmlTable(s: org.apache.spark.sql.SparkSession,
      d: String): String = {
    val path = s"/tmp/graft_acid_dml_${new java.io.File(d).getName}"
    val root = new org.apache.hadoop.fs.Path(path)
    root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
    val seed = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
    TxLogTable.append(s, seed, path) // v0
    val updates = seed.filter(col("s_nationkey") < 5)
      .select(col("s_suppkey"), concat(col("s_name"), lit("_v2")).as("s_name"),
        col("s_nationkey"), (col("s_acctbal") + lit(1000.0)).as("s_acctbal"))
      .unionByName(seed.filter(col("s_nationkey") >= 20)
        .select((col("s_suppkey") + lit(10000L)).as("s_suppkey"),
          concat(col("s_name"), lit("_new")).as("s_name"),
          col("s_nationkey"), col("s_acctbal")))
    TxLogTable.upsertByKey(s, path, updates, Seq("s_suppkey")) // v1
    TxLogTable.deleteWhere(s, path, col("s_nationkey") === 7)  // v2
    path
  }

  /** A23 ACID DML, head snapshot: the post-UPSERT-post-DELETE state read
    * back through the commit log — matched rows replaced, unmatched
    * inserted, predicate-matched rows erased, everything else carried. */
  private val q154 = QueryDef(
    "q154_acid_dml_snapshot",
    (s, d) => TxLogTable.read(s, acidDmlTable(s, d))
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal")),
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      merged AS (
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
        FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT * FROM upd)
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM merged WHERE s_nationkey <> 7
      ORDER BY s_suppkey"""))

  /** A23 ACID time travel THROUGH the DML: version 0 read after the
    * upsert and delete rebased the head — history must be byte-intact
    * (copy-on-write never touches published snapshots). */
  private val q155 = QueryDef(
    "q155_acid_time_travel",
    (s, d) => TxLogTable.readVersion(s, acidDmlTable(s, d), 0L)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal")),
    Some("""
      SELECT s_suppkey, s_name, s_nationkey, s_acctbal
      FROM supplier ORDER BY s_suppkey"""))

  /** A23 change feed ([[TxLogTable.changesBetween]]): the row-level diff
    * v0 → head derived from the log's file listings — replaced rows
    * surface as delete(old image) + insert(new image), erased rows as
    * delete, fresh keys as insert; untouched rows cancel file-level
    * before any row is scanned. */
  private val q156 = QueryDef(
    "q156_acid_change_feed",
    (s, d) => {
      val path = acidDmlTable(s, d)
      TxLogTable.changesBetween(s, path, 0L, TxLogTable.currentVersion(path))
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"), col("_change_type"))
    },
    Some("""
      WITH ins AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal, 'insert' AS _change_type
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal,
               'insert'
        FROM supplier WHERE s_nationkey >= 20),
      del AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               'delete' AS _change_type
        FROM supplier WHERE s_nationkey < 5 OR s_nationkey = 7)
      SELECT * FROM ins UNION ALL SELECT * FROM del
      ORDER BY _change_type, s_suppkey"""))

  /** A23 log-level data skipping, oracle-checked end to end: orders is
    * committed to a [[TxLogTable]] as four disjoint key-range appends
    * (one file each — four tight min/max stats intervals), then
    * [[TxLogTable.readWhere]] serves a range predicate strictly inside
    * the second commit's interval. The query REQUIRES exactly three of
    * the four files to be stats-skipped before any footer opens — a
    * regression to scan-everything fails the gate, not just a spec —
    * and the returned rows hash-compare against DuckDB running the same
    * range algebra on the raw table. */
  private val q158 = QueryDef(
    "q158_acid_stats_skipping",
    (s, d) => {
      val path = s"/tmp/graft_acid_skip_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      val hi = b1 + (b2 - b1) / 2
      val pred = col("o_orderkey") > b1 && col("o_orderkey") <= hi
      val (kept, skipped) = TxLogTable.prunedFiles(s, path, pred)
      require(skipped.size == 3 && kept.size == 1,
        s"stats skipping must drop 3 of 4 files, got kept=${kept.size} " +
          s"skipped=${skipped.size}")
      TxLogTable.readWhere(s, path, pred)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH b AS (
        SELECT max(o_orderkey) // 4 AS b1, max(o_orderkey) // 2 AS b2
        FROM orders)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders, b
      WHERE o_orderkey > b1 AND o_orderkey <= b1 + (b2 - b1) // 2
      ORDER BY o_orderkey"""))

  /** A23 timestamp-based time travel ([[TxLogTable.readAsOf]]) THROUGH
    * a restore: the DML table gains a v3 = RESTORE-to-v0 commit, then
    * the read resolves v1's own commit timestamp — `TIMESTAMP AS OF`
    * must land on the post-upsert snapshot, not the restored head, and
    * not the later delete. Timestamps are monotonized in version order
    * (the Delta resolution rule), so v1's recorded instant maps to
    * exactly v1 regardless of commit clock skew. */
  private val q161 = QueryDef(
    "q161_acid_timestamp_as_of",
    (s, d) => {
      val path = acidDmlTable(s, d)
      TxLogTable.restore(s, path, 0L) // v3: head is the seed again
      val ts1 = TxLogTable.history(path).find(_._1 == 1L).get._2
      TxLogTable.readAsOf(s, path, ts1)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20)
      SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
      FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
      UNION ALL
      SELECT * FROM upd
      ORDER BY s_suppkey"""))

  /** A23 conditional MERGE ([[TxLogTable.mergeByKey]]) — the delta
    * world's `WHEN MATCHED AND <cond> THEN UPDATE/DELETE` surface,
    * oracle-verified: suppliers with nationkey<10 arrive with balances
    * bumped by (nationkey mod 3 → −500 / +500 / ±0); the merge deletes
    * matches whose incoming balance is LOWER, updates those HIGHER, and
    * carries the equal ones untouched (neither clause fires), while
    * nationkey≥20 rows arrive under fresh keys and insert. The oracle
    * replays the same three-way case split relationally. */
  private val q162 = QueryDef(
    "q162_acid_conditional_merge",
    (s, d) => {
      val path = s"/tmp/graft_acid_merge_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val seed = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
      TxLogTable.append(s, seed, path) // v0
      val updates = seed.filter(col("s_nationkey") < 10)
        .select(col("s_suppkey"),
          concat(col("s_name"), lit("_m")).as("s_name"),
          col("s_nationkey"),
          (col("s_acctbal") + when(col("s_nationkey") % 3 === 0, -500.0)
            .when(col("s_nationkey") % 3 === 1, 500.0)
            .otherwise(0.0)).as("s_acctbal"))
        .unionByName(seed.filter(col("s_nationkey") >= 20)
          .select((col("s_suppkey") + lit(20000L)).as("s_suppkey"),
            concat(col("s_name"), lit("_i")).as("s_name"),
            col("s_nationkey"), col("s_acctbal")))
      TxLogTable.mergeByKey(s, path, updates, Seq("s_suppkey"),
        whenMatchedUpdateIf = Some("s.s_acctbal > t.s_acctbal"),
        whenMatchedDeleteIf = Some("s.s_acctbal < t.s_acctbal")) // v1
      TxLogTable.read(s, path)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"))
    },
    Some("""
      WITH u AS (
        SELECT s_suppkey, s_name || '_m' AS s_name, s_nationkey,
               s_acctbal + CASE s_nationkey % 3
                 WHEN 0 THEN -500.0 WHEN 1 THEN 500.0 ELSE 0.0 END
                 AS s_acctbal
        FROM supplier WHERE s_nationkey < 10
        UNION ALL
        SELECT s_suppkey + 20000, s_name || '_i', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20)
      SELECT t.s_suppkey, t.s_name, t.s_nationkey, t.s_acctbal
      FROM supplier t ANTI JOIN u ON t.s_suppkey = u.s_suppkey
      UNION ALL
      SELECT t.s_suppkey,
             CASE WHEN u.s_acctbal > t.s_acctbal THEN u.s_name
                  ELSE t.s_name END AS s_name,
             t.s_nationkey,
             CASE WHEN u.s_acctbal > t.s_acctbal THEN u.s_acctbal
                  ELSE t.s_acctbal END AS s_acctbal
      FROM supplier t JOIN u ON t.s_suppkey = u.s_suppkey
      WHERE NOT (u.s_acctbal < t.s_acctbal)
      UNION ALL
      SELECT u.s_suppkey, u.s_name, u.s_nationkey, u.s_acctbal
      FROM u ANTI JOIN supplier t ON u.s_suppkey = t.s_suppkey
      ORDER BY s_suppkey"""))

  /** A23 hive-partitioned TxLogTable, oracle-checked end to end: orders
    * is committed with `partitionBy = o_orderpriority` (5 partitions),
    * then [[TxLogTable.readWhere]] serves a partition-predicate point
    * query. The query REQUIRES — in-query, q158-pattern — that
    * partition pruning keeps ONLY files inside the matched partition's
    * `k=v` directory and drops every foreign-partition file from the
    * listing before any footer or stats sidecar opens (path-segment
    * pruning is pass 1, zero I/O). A mixed partition+data predicate
    * then composes path pruning with the per-file stats interval. */
  private val q163 = QueryDef(
    "q163_acid_partition_pruning",
    (s, d) => {
      val path = s"/tmp/graft_acid_part_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
      TxLogTable.append(s, orders.repartition(2), path,
        partitionBy = Seq("o_orderpriority"))
      val pred = col("o_orderpriority") === "1-URGENT"
      val (kept, skipped) = TxLogTable.prunedFiles(s, path, pred)
      require(kept.nonEmpty && kept.forall(_.contains("o_orderpriority=1-URGENT")),
        s"partition pruning must keep only the matched partition: $kept")
      require(skipped.nonEmpty &&
        skipped.forall(!_.contains("o_orderpriority=1-URGENT")),
        s"every foreign-partition file must be pruned: kept=${kept.size} " +
          s"skipped=${skipped.size}")
      TxLogTable.readWhere(s, path, pred && col("o_totalprice") > 50000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 50000.0
      ORDER BY o_orderkey"""))

  /** A23 commit history ([[TxLogTable.historyDf]] — the DESCRIBE
    * HISTORY surface): the DML table gains restore and compact
    * commits, then the log's own record of WHAT each version did is
    * oracle-verified on its deterministic columns (version, operation,
    * rebase flag; timestamps are wall-clock and stay out of the
    * hash). */
  private val q164 = QueryDef(
    "q164_acid_history",
    (s, d) => {
      val path = acidDmlTable(s, d)                 // v0..v2
      TxLogTable.restore(s, path, 0L)               // v3
      TxLogTable.compact(s, path, targetFiles = 2)  // v4
      TxLogTable.historyDf(s, path)
        .select(col("version"), col("operation"), col("is_rebase"))
    },
    Some("""
      SELECT * FROM (VALUES
        (0, 'append',  false),
        (1, 'upsert',  true),
        (2, 'delete',  true),
        (3, 'restore', true),
        (4, 'compact', true))
        AS t(version, operation, is_rebase)
      ORDER BY version"""))

  /** A23 per-version change feed ([[TxLogTable.changesPerVersion]] —
    * Delta's `table_changes` shape): the v0→v2 DML history unrolled
    * COMMIT BY COMMIT, each row tagged `_commit_version` — the upsert's
    * replaced rows surface as delete+insert at version 1, the erased
    * nationkey-7 rows as delete at version 2 (they were untouched by
    * the upsert, so their images are the originals). The oracle
    * replays both commits' relational algebra with the version tag. */
  private val q165 = QueryDef(
    "q165_acid_changes_per_version",
    (s, d) => {
      val path = acidDmlTable(s, d)
      // head, not a literal 2: at sf0.001 the DELETE predicate matches
      // no supplier row, deleteWhere no-ops without a commit, and the
      // table tops out at v1 (the bench warmup runs there)
      TxLogTable.changesPerVersion(s, path, 0L,
          TxLogTable.currentVersion(path))
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal"), col("_change_type"), col("_commit_version"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      c1 AS (
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal,
               'delete' AS _change_type, 1 AS _commit_version
        FROM supplier s JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               'insert', 1
        FROM upd),
      c2 AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
               'delete' AS _change_type, 2 AS _commit_version
        FROM supplier WHERE s_nationkey = 7)
      SELECT * FROM c1 UNION ALL SELECT * FROM c2
      ORDER BY _commit_version, _change_type, s_suppkey"""))

  /** A23 SHALLOW CLONE isolation, oracle-checked end to end: the DML
    * table clones at head (zero data rewritten — hard links on local
    * FS), the CLONE takes an independent predicate DELETE, and the
    * query REQUIRES in-flight that the source's version never advanced.
    * Output is both tables' snapshots side-tagged; the oracle replays
    * the source algebra (q154's) twice, once with the clone's extra
    * delete — any leakage between the tables breaks the hash. */
  private val q169 = QueryDef(
    "q169_acid_clone_isolation",
    (s, d) => {
      val src = acidDmlTable(s, d) // v0..v2
      val dest = src + "_clone"
      val droot = new org.apache.hadoop.fs.Path(dest)
      droot.getFileSystem(s.sessionState.newHadoopConf()).delete(droot, true)
      TxLogTable.shallowClone(s, src, dest)
      val vSrc = TxLogTable.currentVersion(src)
      TxLogTable.deleteWhere(s, dest, col("s_nationkey") < 2)
      require(TxLogTable.currentVersion(src) == vSrc,
        "clone DML must never advance the source table")
      TxLogTable.read(s, src).withColumn("side", lit("src"))
        .unionByName(TxLogTable.read(s, dest).withColumn("side", lit("clone")))
        .select(col("side"), col("s_suppkey"), col("s_name"),
          col("s_nationkey"), col("s_acctbal"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      merged AS (
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
        FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT * FROM upd),
      head AS (
        SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        FROM merged WHERE s_nationkey <> 7)
      SELECT 'src' AS side, s_suppkey, s_name, s_nationkey, s_acctbal
      FROM head
      UNION ALL
      SELECT 'clone', s_suppkey, s_name, s_nationkey, s_acctbal
      FROM head WHERE s_nationkey >= 2
      ORDER BY side, s_suppkey"""))

  /** A23 incrementally-maintained aggregate view
    * ([[IncrementalView.maintain]] — linear aggregates over the change
    * feed, the DBSP observation): full load at the DML head, then one
    * MORE delete commits and a second maintain applies ONLY that delta
    * (REQUIRED in-query: the view advances exactly one version, and the
    * applied-source-version record reaches the new head). The oracle
    * recomputes the final aggregate directly — any drift between
    * incremental maintenance and recompute breaks the hash. Money sums
    * round to 2 decimals (the documented double-sum discipline). */
  private val q170 = QueryDef(
    "q170_incremental_view",
    (s, d) => {
      val src = acidDmlTable(s, d) // v0..v2
      val view = src + "_view"
      val vroot = new org.apache.hadoop.fs.Path(view)
      vroot.getFileSystem(s.sessionState.newHadoopConf()).delete(vroot, true)
      IncrementalView.maintain(s, src, view,
        Seq("s_nationkey"), Seq("s_acctbal")) // full load of the head
      // head-relative, not literal versions: at sf0.001 the DML
      // table's own nationkey-7 delete no-ops (no matching rows), so
      // the head is 1 there, not 2 — the q165 lesson (bench warmups
      // run at sf0.001)
      val dv = TxLogTable.deleteWhere(s, src, col("s_nationkey") === 3)
      val applied = IncrementalView.maintain(s, src, view,
        Seq("s_nationkey"), Seq("s_acctbal"))
      require(applied == TxLogTable.currentVersion(src),
        s"second maintain must reach the source head, got $applied")
      require(dv < 0 || TxLogTable.currentVersion(view) == 1L,
        "incremental refresh must be the view's v1, not a rebuild history")
      TxLogTable.read(s, view)
        .select(col("s_nationkey"), col("cnt"),
          round(col("sum_s_acctbal"), 2).as("sum_acctbal"))
        .orderBy(col("s_nationkey"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      merged AS (
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
        FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT * FROM upd),
      head AS (
        SELECT s_suppkey, s_nationkey, s_acctbal
        FROM merged WHERE s_nationkey <> 7 AND s_nationkey <> 3)
      SELECT s_nationkey, count(*) AS cnt,
             round(SUM(s_acctbal), 2) AS sum_acctbal
      FROM head GROUP BY s_nationkey
      ORDER BY s_nationkey"""))

  /** A23 incremental view with MIN/MAX under the dirty-group
    * discipline: the balance-capped DELETE strips the stored maximum
    * from MANY nationkey groups in one commit — exactly those groups
    * recompute their extremes from the base (semi-join-restricted),
    * every other group carries on the delta alone. The oracle
    * recomputes the final (cnt, min, max) directly; any stale
    * extremum the dirty tracking missed breaks the hash. */
  private val q172 = QueryDef(
    "q172_incremental_view_extremes",
    (s, d) => {
      val src = acidDmlTable(s, d)
      val view = src + "_mm"
      val vroot = new org.apache.hadoop.fs.Path(view)
      vroot.getFileSystem(s.sessionState.newHadoopConf()).delete(vroot, true)
      IncrementalView.maintain(s, src, view, Seq("s_nationkey"),
        Seq.empty, minCols = Seq("s_acctbal"), maxCols = Seq("s_acctbal"))
      val dv = TxLogTable.deleteWhere(s, src, col("s_acctbal") > 8000.0)
      val applied = IncrementalView.maintain(s, src, view, Seq("s_nationkey"),
        Seq.empty, minCols = Seq("s_acctbal"), maxCols = Seq("s_acctbal"))
      require(applied == TxLogTable.currentVersion(src),
        s"second maintain must reach the source head, got $applied")
      require(dv < 0 || TxLogTable.currentVersion(view) == 1L,
        "incremental refresh must be the view's v1")
      TxLogTable.read(s, view)
        .select(col("s_nationkey"), col("cnt"),
          col("min_s_acctbal"), col("max_s_acctbal"))
        .orderBy(col("s_nationkey"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      merged AS (
        SELECT s.s_suppkey, s.s_name, s.s_nationkey, s.s_acctbal
        FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT * FROM upd),
      head AS (
        SELECT s_nationkey, s_acctbal
        FROM merged WHERE s_nationkey <> 7 AND NOT (s_acctbal > 8000.0))
      SELECT s_nationkey, count(*) AS cnt,
             MIN(s_acctbal) AS min_s_acctbal,
             MAX(s_acctbal) AS max_s_acctbal
      FROM head GROUP BY s_nationkey
      ORDER BY s_nationkey"""))

  /** A23 expression-level UPDATE ([[TxLogTable.updateWhere]] — the
    * delta world's `UPDATE … SET col = expr WHERE pred`, its most-used
    * DML form after DELETE): orders is committed as four disjoint
    * key-range appends (one file each, q158's layout), then an UPDATE
    * whose predicate lands strictly inside the second file's interval
    * bumps two columns. The query REQUIRES — in-query — that EXACTLY
    * one of the four files rewrote and the other three carried into
    * the new version by reference (file-pruned copy-on-write, not
    * O(N)); the oracle replays the same CASE split over the raw
    * table. Additions, not multiplications, keep the double algebra
    * bit-identical across engines. */
  private val q173 = QueryDef(
    "q173_acid_update_where",
    (s, d) => {
      val path = s"/tmp/graft_acid_upd_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      val hi = b1 + (b2 - b1) / 2
      val pred = col("o_orderkey") > b1 && col("o_orderkey") <= hi
      val v0 = TxLogTable.currentVersion(path)
      val at0 = TxLogTable.filesAt(path, v0)
      val v = TxLogTable.updateWhere(s, path,
        Map("o_custkey" -> (col("o_custkey") + lit(1000000L)),
          "o_totalprice" -> (col("o_totalprice") + lit(1000.0))),
        pred)
      require(v == v0 + 1, s"update must commit exactly one version, got $v")
      val at1 = TxLogTable.filesAt(path, v)
      require(at0.diff(at1).size == 1,
        s"exactly ONE of ${at0.size} files may rewrite, got ${at0.diff(at1)}")
      require(at0.count(at1.contains) == 3,
        "the three unmatched files must carry by reference")
      TxLogTable.read(s, path)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH b AS (
        SELECT max(o_orderkey) // 4 AS b1,
               max(o_orderkey) // 4 + (max(o_orderkey) // 2 - max(o_orderkey) // 4) // 2 AS hi
        FROM orders)
      SELECT o_orderkey,
             CASE WHEN o_orderkey > b1 AND o_orderkey <= hi
                  THEN o_custkey + 1000000 ELSE o_custkey END AS o_custkey,
             CASE WHEN o_orderkey > b1 AND o_orderkey <= hi
                  THEN o_totalprice + 1000.0 ELSE o_totalprice END
                  AS o_totalprice
      FROM orders, b
      ORDER BY o_orderkey"""))

  /** A23 incremental view with APPROX-DISTINCT under the dirty-group
    * discipline ([[IncrementalView.maintain]]'s `distinctCols`,
    * backed by the mergeable KMV sketch — the q47 lineage lifted to
    * VIEW level): full load stores each nationkey's 8 smallest
    * distinct supplier-key hashes; a modulo DELETE then strips hashes
    * out of some sketches — exactly those groups recompute, the rest
    * ride the delta. The oracle replays the final KMV state from the
    * head relationally (DISTINCT + row_number ≤ k), so a stale sketch
    * the dirty tracking missed breaks the hash, q170-style. */
  private val q174 = QueryDef(
    "q174_incremental_view_distinct",
    (s, d) => {
      val k = 8
      val src = acidDmlTable(s, d) // v0..v2
      val view = src + "_kmv"
      val vroot = new org.apache.hadoop.fs.Path(view)
      vroot.getFileSystem(s.sessionState.newHadoopConf()).delete(vroot, true)
      IncrementalView.maintain(s, src, view, Seq("s_nationkey"),
        Seq.empty, distinctCols = Seq("s_suppkey"), distinctK = k)
      val dv = TxLogTable.deleteWhere(s, src, col("s_suppkey") % 4 === 0)
      val applied = IncrementalView.maintain(s, src, view, Seq("s_nationkey"),
        Seq.empty, distinctCols = Seq("s_suppkey"), distinctK = k)
      require(applied == TxLogTable.currentVersion(src),
        s"second maintain must reach the source head, got $applied")
      require(dv < 0 || TxLogTable.currentVersion(view) == 1L,
        "incremental refresh must be the view's v1")
      val kM = 1152921504606846976.0 // h60 domain [0, 2^60)
      TxLogTable.read(s, view)
        .select(col("s_nationkey"), col("cnt"),
          size(col("kmv_s_suppkey")).as("n_min"),
          element_at(col("kmv_s_suppkey"), -1).as("kth_hash"))
        .withColumn("est2", Rnd.halfUp(
          when(col("n_min") < k, col("n_min").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(kM) / col("kth_hash")), 2))
        .orderBy(col("s_nationkey"))
    },
    Some("""
      WITH upd AS (
        SELECT s_suppkey, s_name || '_v2' AS s_name, s_nationkey,
               s_acctbal + 1000.0 AS s_acctbal
        FROM supplier WHERE s_nationkey < 5
        UNION ALL
        SELECT s_suppkey + 10000, s_name || '_new', s_nationkey, s_acctbal
        FROM supplier WHERE s_nationkey >= 20),
      merged AS (
        SELECT s.s_suppkey, s.s_nationkey
        FROM supplier s ANTI JOIN upd u ON s.s_suppkey = u.s_suppkey
        UNION ALL
        SELECT s_suppkey, s_nationkey FROM upd),
      head AS (
        SELECT s_suppkey, s_nationkey FROM merged
        WHERE s_nationkey <> 7 AND NOT (s_suppkey % 4 = 0)),
      h AS (
        SELECT DISTINCT s_nationkey,
               ('0x' || substr(md5(s_suppkey::VARCHAR), 1, 15))::UBIGINT::BIGINT AS h
        FROM head),
      r AS (
        SELECT s_nationkey, h,
               row_number() OVER (PARTITION BY s_nationkey ORDER BY h) AS rn
        FROM h),
      sk AS (
        SELECT s_nationkey,
               CAST(least(count(*), 8) AS INT) AS n_min,
               max(h) FILTER (WHERE rn <= 8) AS kth_hash
        FROM r GROUP BY s_nationkey),
      c AS (
        SELECT s_nationkey, count(*) AS cnt FROM head GROUP BY s_nationkey)
      SELECT c.s_nationkey, c.cnt, n_min, kth_hash,
             floor((CASE WHEN n_min < 8 THEN n_min::DOUBLE
                         ELSE 7.0 * 1152921504606846976.0 / kth_hash END)
                   * 100.0 + 0.5) / 100.0 AS est2
      FROM c JOIN sk USING (s_nationkey)
      ORDER BY s_nationkey"""))

  /** A23/§2.B scans — the `graftlog` DataSource (spark.read/SQL
    * connector over TxLogTable, the delta world's reader shape with
    * versionAsOf/timestampAsOf options): orders lands in an ACID table
    * as four disjoint key-range commits, then the read goes through
    * `spark.read.format("graftlog")` with a range filter. The query
    * REQUIRES — in-query — that Catalyst pushed the predicate into the
    * V1 scan node (`PushedFilters` is the handoff that reaches the
    * log's stats skipping) and that the result equals DuckDB running
    * the same algebra on the raw table. Pushdown is advisory
    * (`unhandledFilters` keeps everything), so exactness never depends
    * on the pruning translation. */
  private val q176 = QueryDef(
    "q176_datasource_connector",
    (s, d) => {
      val path = s"/tmp/graft_acid_dsrc_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      val hi = b1 + (b2 - b1) / 2
      val out = s.read.format("graftlog").load(path)
        .filter(col("o_orderkey") > b1 && col("o_orderkey") <= hi)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val plan = out.queryExecution.executedPlan.toString
      require(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(o_orderkey"),
        s"range filter must push into the graftlog scan:\n$plan")
      out
    },
    Some("""
      WITH b AS (
        SELECT max(o_orderkey) // 4 AS b1,
               max(o_orderkey) // 4 + (max(o_orderkey) // 2 - max(o_orderkey) // 4) // 2 AS hi
        FROM orders)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders, b
      WHERE o_orderkey > b1 AND o_orderkey <= hi
      ORDER BY o_orderkey"""))

  /** A23 conditional MERGE with COLUMN-LEVEL SET
    * ([[TxLogTable.mergeByKey]]'s `whenMatchedSet` — Delta's
    * `WHEN MATCHED THEN UPDATE SET col = expr` clause) applied from a
    * NARROW source (keys + one delta column, the CDC-apply shape; the
    * source never carries the target schema): every third order sends
    * an adjustment in [−50, 49]; matches below −40 DELETE (clause
    * order first), positive adjustments bump `o_totalprice` in place
    * (`t`/`s` expression), everything else — including matched rows
    * failing both clauses and unmatched source keys with
    * `insertUnmatched = false` — carries verbatim. The oracle replays
    * the three-way split with a LEFT JOIN + CASE. Integer-valued
    * double addition keeps the arithmetic engine-identical. */
  private val q177 = QueryDef(
    "q177_acid_merge_column_set",
    (s, d) => {
      val path = s"/tmp/graft_acid_mset_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      TxLogTable.append(s, orders, path) // v0
      val adj = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey"),
          (col("o_orderkey") % 100 - 50).as("adj"))
      TxLogTable.mergeByKey(s, path, adj, Seq("o_orderkey"),
        whenMatchedUpdateIf = Some("s.adj > 0"),
        whenMatchedDeleteIf = Some("s.adj < -40"),
        insertUnmatched = false,
        whenMatchedSet = Some(Map(
          "o_totalprice" -> "t.o_totalprice + s.adj"))) // v1
      TxLogTable.read(s, path)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH s AS (
        SELECT o_orderkey, o_orderkey % 100 - 50 AS adj
        FROM orders WHERE o_orderkey % 3 = 0)
      SELECT t.o_orderkey, t.o_custkey,
             CASE WHEN s.o_orderkey IS NOT NULL AND s.adj > 0
                  THEN t.o_totalprice + s.adj
                  ELSE t.o_totalprice END AS o_totalprice
      FROM orders t LEFT JOIN s USING (o_orderkey)
      WHERE NOT (s.o_orderkey IS NOT NULL AND s.adj < -40)
      ORDER BY o_orderkey"""))

  /** The `graftlog` connector's VECTORIZED partitioned read
    * (round 14's log-backed-FileIndex architecture, end to end through
    * the public API): write `customer` hive-partitioned by
    * `c_mktsegment` through `df.write.format("graftlog")`, read one
    * segment back through `spark.read.format("graftlog")`. In-query
    * REQUIREs pin the architecture, not just the rows: the physical
    * scan must be Spark's own columnar `FileSourceScanExec` (the
    * vectorized parquet reader — a row-relation fallback would fail
    * the REQUIRE), and the planner's partition filter must prune the
    * PHYSICAL LISTING to exactly the matching hive directory's files
    * (`numFiles` metric == the snapshot's `c_mktsegment=BUILDING`
    * count, strictly fewer than the table's total). The partition
    * column itself round-trips from the directory PATH, not file
    * contents — the oracle's value equality covers that recovery. */
  private val q180 = QueryDef(
    "q180_connector_partitioned_scan",
    (s, d) => {
      val path = s"/tmp/graft_acid_part_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("c_acctbal"))
        .repartition(2)
        .write.format("graftlog").option("partitionBy", "c_mktsegment")
        .save(path)
      val out = s.read.format("graftlog").load(path)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          col("c_acctbal"))
      val scans = out.queryExecution.executedPlan.collectLeaves().collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
      require(scans.size == 1 && scans.head.supportsColumnar,
        "the partitioned connector read must plan as one columnar " +
          s"FileSourceScanExec:\n${out.queryExecution.executedPlan}")
      // execute THIS plan (a derived frame would run a clone whose
      // metrics stay zero), then hold the listing to account. The one
      // deliberate double-materialization in the corpus: the returned
      // frame re-executes in Verify/Bench, and this in-builder run is
      // what makes the scan metrics REQUIREable — bounded to the one
      // matching hive segment at gate scale.
      out.collect()
      val all = TxLogTable.snapshotFiles(path, 0L)
      val matching = all.count(_.contains("c_mktsegment=BUILDING"))
      val scanned = scans.head.metrics("numFiles").value
      require(scanned == matching && scanned < all.size,
        s"partition pruning must reach the physical listing: scanned " +
          s"$scanned of ${all.size} files, expected $matching")
      out
    },
    Some("""
      SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal
      FROM customer
      WHERE c_mktsegment = 'BUILDING'
      ORDER BY c_custkey"""))

  /** A23 SQL ROW-LEVEL DML ([[graft.sources.GraftDmlResolution]] — the
    * delta world's `UPDATE` / `DELETE FROM` / `MERGE INTO` as plain
    * `spark.sql` statements over a graftlog view, each landing as ONE
    * file-pruned ACID commit through the engine's copy-on-write
    * surface): orders commits as four disjoint key-range files (q173's
    * layout); a SQL DELETE thins odd keys out of the second range, a
    * SQL UPDATE bumps the fourth range's prices, and a SQL MERGE
    * against a derived source deletes/updates inside the third range
    * and inserts beyond the key space (conditional clauses, explicit
    * INSERT projection, delete-before-update order). The query
    * REQUIREs — in-query — that every statement committed exactly one
    * version and rewrote ONLY its range's file (three others carry by
    * reference each time); the oracle replays all three statements
    * relationally. Additions only, so the double algebra stays
    * bit-identical across engines. */
  private val q184 = QueryDef(
    "q184_sql_row_dml",
    (s, d) => {
      val path = s"/tmp/graft_sqldml_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      s.read.format("graftlog").load(path).createOrReplaceTempView("t184")
      val v0 = TxLogTable.currentVersion(path)
      val at0 = TxLogTable.filesAt(path, v0)

      s.sql(s"DELETE FROM t184 WHERE o_orderkey > $b1 AND " +
        s"o_orderkey <= $b2 AND o_orderkey % 2 = 1")
      val v1 = TxLogTable.currentVersion(path)
      require(v1 == v0 + 1, s"SQL DELETE must commit exactly one version")
      val at1 = TxLogTable.filesAt(path, v1)
      require(at0.diff(at1).size == 1 && at0.count(at1.contains) == 3,
        "SQL DELETE must rewrite only the second range's file")

      s.sql(s"UPDATE t184 SET o_totalprice = o_totalprice + 500.0 " +
        s"WHERE o_orderkey > $b3")
      val v2 = TxLogTable.currentVersion(path)
      require(v2 == v1 + 1, "SQL UPDATE must commit exactly one version")
      val at2 = TxLogTable.filesAt(path, v2)
      require(at1.diff(at2).size == 1 && at1.count(at2.contains) == 3,
        "SQL UPDATE must rewrite only the fourth range's file")

      // merge source: price adjustments for every 5th key of the third
      // range, plus brand-new keys beyond the key space
      orders.filter(col("o_orderkey") > b2 && col("o_orderkey") <= b3 &&
          col("o_orderkey") % 5 === 0)
        .select(col("o_orderkey"),
          (col("o_custkey") + lit(1000000L)).as("o_custkey"),
          (col("o_totalprice") + lit(11.5)).as("o_totalprice"))
        .unionByName(
          orders.filter(col("o_orderkey") <= b1 && col("o_orderkey") % 3 === 0)
            // + maxK + 1: the synthetic key space starts at 0, so a bare
            // + maxK would collide key 0's image with the existing max
            .select((col("o_orderkey") + lit(maxK + 1)).as("o_orderkey"),
              col("o_custkey"), col("o_totalprice")))
        .createOrReplaceTempView("s184")
      s.sql("""
        MERGE INTO t184 USING s184 ON t184.o_orderkey = s184.o_orderkey
        WHEN MATCHED AND s184.o_custkey % 2 = 0 THEN DELETE
        WHEN MATCHED THEN
          UPDATE SET o_totalprice = t184.o_totalprice + s184.o_totalprice
        WHEN NOT MATCHED AND s184.o_custkey % 2 = 1 THEN
          INSERT (o_orderkey, o_custkey, o_totalprice)
          VALUES (s184.o_orderkey, s184.o_custkey + 1, s184.o_totalprice)
      """)
      val v3 = TxLogTable.currentVersion(path)
      require(v3 == v2 + 1, "SQL MERGE must commit exactly one version")
      val at3 = TxLogTable.filesAt(path, v3)
      require(at2.diff(at3).size == 1,
        "SQL MERGE must rewrite only the third range's file (matched " +
          "keys live there; inserts stage fresh)")
      TxLogTable.read(s, path)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH b AS (
        SELECT max(o_orderkey) // 4 AS b1, max(o_orderkey) // 2 AS b2,
               3 * max(o_orderkey) // 4 AS b3, max(o_orderkey) AS mk
        FROM orders),
      base AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
      d1 AS (
        SELECT t.* FROM base t, b
        WHERE NOT (t.o_orderkey > b.b1 AND t.o_orderkey <= b.b2
                   AND t.o_orderkey % 2 = 1)),
      u1 AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey > b.b3 THEN o_totalprice + 500.0
                    ELSE o_totalprice END AS o_totalprice
        FROM d1, b),
      src AS (
        SELECT o_orderkey, o_custkey + 1000000 AS o_custkey,
               o_totalprice + 11.5 AS o_totalprice
        FROM base, b
        WHERE o_orderkey > b.b2 AND o_orderkey <= b.b3
          AND o_orderkey % 5 = 0
        UNION ALL
        SELECT o_orderkey + b.mk + 1, o_custkey, o_totalprice
        FROM base, b WHERE o_orderkey <= b.b1 AND o_orderkey % 3 = 0),
      m1 AS (
        SELECT t.o_orderkey, t.o_custkey,
               CASE WHEN s.o_orderkey IS NOT NULL
                    THEN t.o_totalprice + s.o_totalprice
                    ELSE t.o_totalprice END AS o_totalprice,
               CASE WHEN s.o_orderkey IS NOT NULL AND s.o_custkey % 2 = 0
                    THEN 1 ELSE 0 END AS del
        FROM u1 t LEFT JOIN src s ON t.o_orderkey = s.o_orderkey),
      kept AS (
        SELECT o_orderkey, o_custkey, o_totalprice FROM m1 WHERE del = 0),
      ins AS (
        SELECT s.o_orderkey, s.o_custkey + 1 AS o_custkey, s.o_totalprice
        FROM src s ANTI JOIN u1 t ON s.o_orderkey = t.o_orderkey
        WHERE s.o_custkey % 2 = 1)
      SELECT * FROM (SELECT * FROM kept UNION ALL SELECT * FROM ins)
      ORDER BY o_orderkey"""))

  /** A23 merge-on-read DELETE via deletion vectors
    * ([[TxLogTable.deleteWhereDv]], the delta protocol's DV table
    * feature rebuilt on the log): orders commits as four single-file
    * key-range appends, then TWO dv deletes land — one inside the
    * second range, one spanning every range — and the head reads back
    * through the `(file, row_index)` anti-join. REQUIREd in-query, so a
    * regression fails the gate: each dv commit keeps the FILE LISTING
    * IDENTICAL (no data file rewrites — the whole point: a k-row delete
    * in a multi-TB table costs O(k) dv rows, not a file rewrite), the
    * recorded mask totals equal the predicate's match count, the two
    * masks UNION on the shared file (pointer replacement), and
    * [[TxLogTable.purgeDeletes]] folds the masks into a rewrite that
    * reads IDENTICALLY. The returned frame is the DV-masked head (the
    * anti-join path is what the oracle hashes); DuckDB replays both
    * predicates over the raw table. */
  private val q188 = QueryDef(
    "q188_dv_delete",
    (s, d) => {
      val path = s"/tmp/graft_dv_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      val v0 = TxLogTable.currentVersion(path)
      val at0 = TxLogTable.filesAt(path, v0)

      // dv delete 1: odd keys of the second range — stats-pruned to one
      // candidate file, masks recorded, NOTHING rewritten
      val p1 = col("o_orderkey") > b1 && col("o_orderkey") <= b2 &&
        col("o_orderkey") % 2 === 1
      val n1 = orders.filter(p1).count()
      val v1 = TxLogTable.deleteWhereDv(s, path, p1)
      require(v1 == v0 + 1, "dv delete must commit exactly one version")
      require(TxLogTable.filesAt(path, v1) == at0.sorted,
        "dv delete must keep the data-file listing IDENTICAL")
      val dv1 = TxLogTable.deletionVectors(path, v1)
      require(dv1.size == 1 && dv1.values.map(_._2).sum == n1,
        s"dv delete 1 must mask exactly $n1 rows in 1 file, got $dv1")

      // dv delete 2: every 7th customer corpus-wide — overlaps the
      // already-masked file (union) and masks the other three
      val p2 = col("o_custkey") % 7 === 0
      val n2 = orders.filter(p2 && !p1).count()
      val v2 = TxLogTable.deleteWhereDv(s, path, p2)
      require(v2 == v1 + 1, "dv delete must commit exactly one version")
      require(TxLogTable.filesAt(path, v2) == at0.sorted,
        "second dv delete must also keep the listing identical")
      val dv2 = TxLogTable.deletionVectors(path, v2)
      require(dv2.values.map(_._2).sum == n1 + n2,
        s"masks must UNION on the shared file: want ${n1 + n2} total, " +
          s"got ${dv2.values.map(_._2).sum}")

      // the masked head ≡ the purged head (REORG APPLY PURGE folds the
      // masks into a file-pruned rewrite; reads drop the anti-join)
      val masked = TxLogTable.readVersion(s, path, v2)
      val vP = TxLogTable.purgeDeletes(s, path)
      require(vP == v2 + 1 && TxLogTable.deletionVectors(path, vP).isEmpty,
        "purge must clear the dv map in one commit")
      require(TxLogTable.read(s, path).count() == masked.count(),
        "purged read must equal the dv-masked read")
      // return the DV-MASKED snapshot — the anti-join path is what the
      // oracle hashes; time travel serves it bit-exactly post-purge
      TxLogTable.readVersion(s, path, v2)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH b AS (SELECT max(o_orderkey) // 4 AS b1,
                        max(o_orderkey) // 2 AS b2 FROM orders)
      SELECT o_orderkey, o_custkey, o_totalprice
      FROM orders, b
      WHERE NOT (o_orderkey > b1 AND o_orderkey <= b2 AND
                 o_orderkey % 2 = 1)
        AND NOT (o_custkey % 7 = 0)
      ORDER BY o_orderkey"""))

  /** A23 metadata-only schema evolution ([[TxLogTable.addColumns]], the
    * delta world's ALTER TABLE ADD COLUMNS): customer seeds the table,
    * a `tier` column is added by DDL — REQUIREd in-query to commit with
    * the file listing IDENTICAL (zero data bytes move; at 100 TB a
    * rewrite-based widening costs the table, this costs one log entry)
    * — then two predicate UPDATEs populate it and unmatched rows keep
    * the born-NULL value. DuckDB replays the widening as a CASE
    * projection over the raw table. */
  private val q189 = QueryDef(
    "q189_add_columns",
    (s, d) => {
      val path = s"/tmp/graft_alter_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      TxLogTable.append(s, cust, path) // v0
      val at0 = TxLogTable.filesAt(path, 0)
      val v1 = TxLogTable.addColumns(s, path, Seq(
        org.apache.spark.sql.types.StructField("tier",
          org.apache.spark.sql.types.StringType)))
      require(v1 == 1 && TxLogTable.filesAt(path, 1).toSet == at0.toSet,
        "ALTER ADD COLUMNS must be metadata-only (listing identical)")
      require(TxLogTable.readVersion(s, path, 0).columns.length == 3,
        "pre-DDL versions must keep the narrow schema")
      TxLogTable.updateWhere(s, path, Map("tier" -> lit("gold")),
        col("c_acctbal") >= 5000.0) // v2
      TxLogTable.updateWhere(s, path, Map("tier" -> lit("risk")),
        col("c_acctbal") < 0.0) // v3
      TxLogTable.read(s, path)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("tier"))
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal,
             CASE WHEN c_acctbal >= 5000.0 THEN 'gold'
                  WHEN c_acctbal < 0.0 THEN 'risk'
                  ELSE NULL END AS tier
      FROM customer
      ORDER BY c_custkey"""))

  /** A23 deletion vectors beyond DELETE — the delta protocol serves
    * all three DML forms merge-on-read, and so does the engine:
    * [[TxLogTable.updateWhereDv]] masks the matched old images and
    * appends only the new ones (REQUIREd in-query: the pre-update
    * listing survives INTACT — append-only, zero rewrites — and the
    * mask total equals the matched-row count), then a
    * [[TxLogTable.mergeByKey]] with `useDv` runs delete+update+insert
    * clauses over the same table (REQUIREd: still append-only, op =
    * dvmerge, masks = deleted + updated). The returned frame is the
    * dv-masked head — the anti-join read path is what the oracle
    * hashes; DuckDB replays both DML layers as CASE/filter algebra
    * over the raw table. */
  private val q191 = QueryDef(
    "q191_dv_update_merge",
    (s, d) => {
      val path = s"/tmp/graft_dvum_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      val (b1, b2, b3) = (maxK / 4, maxK / 2, 3 * maxK / 4)
      Seq(
        col("o_orderkey") <= b1,
        col("o_orderkey") > b1 && col("o_orderkey") <= b2,
        col("o_orderkey") > b2 && col("o_orderkey") <= b3,
        col("o_orderkey") > b3
      ).foreach(p => TxLogTable.append(s, orders.filter(p).coalesce(1), path))
      val v0 = TxLogTable.currentVersion(path)
      val at0 = TxLogTable.filesAt(path, v0)

      // dv UPDATE: stats-pruned to the first range's file; masks the
      // matched old images, appends only the new ones
      val upd = col("o_orderkey") % 5 === 0 && col("o_orderkey") <= b1
      val nUpd = orders.filter(upd).count()
      val v1 = TxLogTable.updateWhereDv(s, path,
        Map("o_totalprice" -> (col("o_totalprice") + lit(1000.0))), upd)
      require(v1 == v0 + 1, "dv update must commit exactly one version")
      val at1 = TxLogTable.filesAt(path, v1)
      require(at0.forall(at1.contains),
        "dv update must keep every pre-update file (append-only listing)")
      require(at1.size > at0.size, "dv update must append image files")
      require(TxLogTable.deletionVectors(path, v1).values.map(_._2).sum
        == nUpd, s"dv update must mask exactly the $nUpd matched rows")

      // dv MERGE: conditional delete + unconditional update of the
      // rest + 5 inserts, all merge-on-read
      val src = orders.filter(col("o_custkey") % 10 === 3)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .unionByName(s.range(1, 6).select(
          (lit(maxK) + col("id")).as("o_orderkey"),
          (col("id") * 11).as("o_custkey"),
          (col("id").cast("double") * 100.0).as("o_totalprice")))
      val v2 = TxLogTable.mergeByKey(s, path, src, Seq("o_orderkey"),
        whenMatchedDeleteIf = Some("s.o_custkey % 20 = 3"),
        useDv = true)
      require(v2 == v1 + 1, "dv merge must commit exactly one version")
      val at2 = TxLogTable.filesAt(path, v2)
      require(at1.forall(at2.contains),
        "dv merge must keep every pre-merge file (append-only listing)")
      require(TxLogTable.historyDf(s, path)
        .filter(col("version") === v2).select("operation")
        .head().getString(0) == "dvmerge", "merge must take the dv path")
      TxLogTable.read(s, path)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    },
    Some("""
      WITH b AS (SELECT max(o_orderkey) // 4 AS b1,
                        max(o_orderkey) AS mx FROM orders),
      u AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 5 = 0 AND o_orderkey <= b1
                    THEN o_totalprice + 1000.0 ELSE o_totalprice END
                 AS o_totalprice
        FROM orders, b),
      m AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_custkey % 10 = 3
                    THEN (SELECT o_totalprice * 2 FROM orders o
                          WHERE o.o_orderkey = u.o_orderkey)
                    ELSE o_totalprice END AS o_totalprice
        FROM u WHERE NOT (o_custkey % 20 = 3)),
      ins AS (
        SELECT CAST(mx + i AS BIGINT) AS o_orderkey,
               CAST(i * 11 AS BIGINT) AS o_custkey,
               CAST(i AS DOUBLE) * 100.0 AS o_totalprice
        FROM b, generate_series(1, 5) AS t(i))
      SELECT * FROM m UNION ALL SELECT * FROM ins
      ORDER BY o_orderkey"""))

  /** A23 column mapping ([[TxLogTable.renameColumn]] /
    * [[TxLogTable.dropColumn]] — Delta's `columnMapping.mode = name`):
    * customer seeds the table; RENAME then DROP then a re-ADD of the
    * dropped name run as three metadata-only commits (REQUIREd
    * in-query: the file listing stays IDENTICAL through all three —
    * zero data bytes move), an UPDATE populates the re-added column
    * under its fresh physical name, and the final read must serve the
    * renamed column from the ORIGINAL file bytes, the re-added column
    * from only the update (never the dropped bytes — the resurrection
    * hazard the GUID physical names exist for). DuckDB replays the
    * whole mapping stack as plain projection algebra. */
  private val q192 = QueryDef(
    "q192_column_mapping",
    (s, d) => {
      val path = s"/tmp/graft_colmap_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("c_mktsegment"))
      TxLogTable.append(s, cust, path) // v0
      val at0 = TxLogTable.filesAt(path, 0)
      val v1 = TxLogTable.renameColumn(s, path, "c_acctbal", "balance")
      val v2 = TxLogTable.dropColumn(s, path, "c_mktsegment")
      val v3 = TxLogTable.addColumns(s, path, Seq(
        org.apache.spark.sql.types.StructField("c_mktsegment",
          org.apache.spark.sql.types.StringType)))
      require(Seq(v1, v2, v3) == Seq(1L, 2L, 3L) &&
        Seq(1L, 2L, 3L).forall(v =>
          TxLogTable.filesAt(path, v).toSet == at0.toSet),
        "rename/drop/re-add must all be metadata-only (listing identical)")
      require(TxLogTable.readVersion(s, path, 0).columns.toSeq ==
        Seq("c_custkey", "c_name", "c_acctbal", "c_mktsegment"),
        "time travel below the DDL must serve the original schema")
      // populate the re-added column for a slice; everything else must
      // stay NULL (the dropped bytes must NOT resurrect)
      TxLogTable.updateWhere(s, path,
        Map("c_mktsegment" -> lit("REMAPPED")),
        col("c_custkey") % 10 === 0) // v4
      TxLogTable.read(s, path)
        .select(col("c_custkey"), col("c_name"), col("balance"),
          col("c_mktsegment"))
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal AS balance,
             CASE WHEN c_custkey % 10 = 0 THEN 'REMAPPED'
                  ELSE NULL END AS c_mktsegment
      FROM customer
      ORDER BY c_custkey"""))

  /** A23 incremental, concurrency-survivable OPTIMIZE
    * ([[TxLogTable.compact]] `where` + [[TxLogTable]]'s rebase conflict
    * re-validation — Delta's `OPTIMIZE … WHERE` + ConcurrentAppend
    * rules): a partitioned table takes a scoped `OPTIMIZE … WHERE`
    * through SQL while a concurrent append lands MID-COMPACT
    * (deterministically, via the pre-commit hook). REQUIREd in-query:
    * BOTH commits land (the append wins v0+1, the compact retries and
    * takes v0+2), every out-of-scope partition file carries BY
    * REFERENCE, the in-scope partition bin-packs to one file, and the
    * raced rows survive. DuckDB replays the final state as the base
    * table plus the raced batch. */
  private val q193 = QueryDef(
    "q193_scoped_optimize",
    (s, d) => {
      val path = s"/tmp/graft_optw_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val maxK = orders.agg(max(col("o_orderkey"))).first().getLong(0)
      // 3 appends -> 3 small files per status partition
      (0 until 3).foreach { i =>
        TxLogTable.append(s,
          orders.filter(col("o_orderkey") % 3 === i).coalesce(1),
          path, partitionBy = Seq("o_orderstatus"))
      }
      val v0 = TxLogTable.currentVersion(path)
      val at0 = TxLogTable.filesAt(path, v0)
      val outOfScope = at0.filterNot(_.contains("o_orderstatus=F"))
      require(outOfScope.nonEmpty && at0.size > outOfScope.size,
        "fixture needs both in-scope and out-of-scope partitions")
      // a concurrent append lands between the compact's snapshot read
      // and its publish — the retry must carry it, not abort
      val raced = s.range(1, 6).select(
        (lit(maxK) + col("id")).as("o_orderkey"),
        lit("Z").as("o_orderstatus"),
        (col("id").cast("double") * 10.0).as("o_totalprice"))
      TxLogTable.testPreCommitHooks.put(
        new org.apache.hadoop.fs.Path(path).toString,
        () => TxLogTable.append(s, raced, path,
          partitionBy = Seq("o_orderstatus")))
      val cv = s.sql(
        s"OPTIMIZE graftlog.`$path` WHERE o_orderstatus = 'F'")
        .head().getLong(0)
      require(cv == v0 + 2,
        s"append must win v0+1 and the compact retry v0+2, got $cv")
      require(TxLogTable.historyDf(s, path)
        .filter(col("version") === cv).select("operation")
        .head().getString(0) == "compact", "the retried commit is a compact")
      val after = TxLogTable.filesAt(path, cv)
      require(outOfScope.forall(after.contains),
        "out-of-scope partitions must carry by reference")
      require(after.count(_.contains("o_orderstatus=F")) == 1,
        "the in-scope partition must bin-pack to one file")
      require(after.exists(_.contains("o_orderstatus=Z")),
        "the raced append's files must carry into the compact listing")
      TxLogTable.read(s, path)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    },
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      UNION ALL
      SELECT (SELECT max(o_orderkey) FROM orders) + i, 'Z',
             CAST(i AS DOUBLE) * 10.0
      FROM generate_series(1, 5) AS t(i)
      ORDER BY o_orderkey"""))

  /** A23/B-scans `table_changes` TVF (Delta's change-feed function,
    * parse-time rewrite over the batch readChangeFeed relation): an
    * UPDATE and a DELETE commit on top of the seeded table, then the
    * TVF serves the (1, 2] range — REQUIREd in-query to equal the
    * readChangeFeed option row-for-row. DuckDB replays the feed as
    * CASE/filter algebra: the update's old images as deletes + new
    * images as inserts at commit 1, the delete's (post-update) images
    * as deletes at commit 2. */
  private val q194 = QueryDef(
    "q194_table_changes_tvf",
    (s, d) => {
      val path = s"/tmp/graft_tvf_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
      TxLogTable.append(s, cust.coalesce(1), path) // v0
      TxLogTable.updateWhere(s, path,
        Map("c_acctbal" -> (col("c_acctbal") + lit(100.0))),
        col("c_custkey") % 7 === 0) // v1
      TxLogTable.deleteWhere(s, path, col("c_custkey") % 10 === 1) // v2
      val tvf = s.sql(
        s"""SELECT _change_type, _commit_version, c_custkey, c_acctbal
            FROM table_changes('graftlog.`$path`', 1, 2)""")
      val viaOption = s.read.format("graftlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 1).option("endingVersion", 2)
        .load(path)
        .select(col("_change_type"), col("_commit_version"),
          col("c_custkey"), col("c_acctbal"))
      require(tvf.exceptAll(viaOption).isEmpty &&
        viaOption.exceptAll(tvf).isEmpty,
        "table_changes must equal the readChangeFeed option row-for-row")
      tvf
    },
    Some("""
      SELECT 'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version,
             c_custkey, c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT 'insert', CAST(1 AS BIGINT), c_custkey, c_acctbal + 100.0
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT 'delete', CAST(2 AS BIGINT), c_custkey,
             CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                  ELSE c_acctbal END
      FROM customer WHERE c_custkey % 10 = 1
      ORDER BY _commit_version, _change_type, c_custkey"""))

  /** A23 MERGE schema evolution (Delta's autoMerge, composed as
    * metadata-only [[TxLogTable.addColumns]] + the merge): a WIDER
    * source (new `note` column) merges with `schemaEvolution = true` —
    * REQUIREd in-query: exactly two commits (addcolumns + merge) and
    * the widen carries every file by reference (listing identical).
    * Matched rows take the source image including the new column,
    * unmatched target rows read it as NULL, inserts carry it. DuckDB
    * replays the widen-then-merge as projection algebra. */
  private val q195 = QueryDef(
    "q195_merge_schema_evolution",
    (s, d) => {
      val path = s"/tmp/graft_evo_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val part = Tables.part(s, d)
        .select(col("p_partkey"), col("p_retailprice"))
      TxLogTable.append(s, part.repartition(2), path) // v0
      val maxK = part.agg(max(col("p_partkey"))).first().getLong(0)
      val at0 = TxLogTable.filesAt(path, 0)
      val src = part.filter(col("p_partkey") % 5 === 0)
        .select(col("p_partkey"),
          (col("p_retailprice") / 2).as("p_retailprice"),
          lit("disc").as("note"))
        .unionByName(s.range(1, 6).select(
          (lit(maxK) + col("id")).as("p_partkey"),
          (col("id").cast("double") * 9.0).as("p_retailprice"),
          lit("new").as("note")))
      val v = TxLogTable.mergeByKey(s, path, src, Seq("p_partkey"),
        schemaEvolution = true)
      require(v == 2, s"expected addcolumns(1) + merge(2), got $v")
      require(TxLogTable.filesAt(path, 1).toSet == at0.toSet,
        "the widen must be metadata-only (listing identical)")
      require(TxLogTable.historyDf(s, path)
        .orderBy("version").select("operation")
        .collect().map(_.getString(0)).toSeq ==
        Seq("append", "addcolumns", "merge"),
        "exactly two evolution commits on top of the seed")
      TxLogTable.read(s, path)
        .select(col("p_partkey"), col("p_retailprice"), col("note"))
    },
    Some("""
      SELECT p_partkey,
             CASE WHEN p_partkey % 5 = 0 THEN p_retailprice / 2
                  ELSE p_retailprice END AS p_retailprice,
             CASE WHEN p_partkey % 5 = 0 THEN 'disc' ELSE NULL END AS note
      FROM part
      UNION ALL
      SELECT (SELECT max(p_partkey) FROM part) + i,
             CAST(i AS DOUBLE) * 9.0, 'new'
      FROM generate_series(1, 5) AS t(i)
      ORDER BY p_partkey"""))

  /** A23 SHALLOW CLONE via SQL (`CREATE TABLE … SHALLOW CLONE …
    * VERSION AS OF n` — Delta's clone spelling over
    * [[TxLogTable.shallowClone]]): the clone pins a historical version
    * with ZERO data copied (REQUIREd in-query: identical listing AND
    * hard-link inode identity), then source and clone evolve
    * independently — a later DELETE on the source never shows in the
    * clone, and the clone's own UPDATE never shows in the source.
    * DuckDB replays the clone's final state as the v0 snapshot plus
    * its own update. */
  private val q196 = QueryDef(
    "q196_shallow_clone",
    (s, d) => {
      val tag = new java.io.File(d).getName
      val src = s"/tmp/graft_clsrc_$tag"
      val dst = s"/tmp/graft_cldst_$tag"
      val conf = s.sessionState.newHadoopConf()
      Seq(src, dst).foreach { p =>
        val hp = new org.apache.hadoop.fs.Path(p)
        hp.getFileSystem(conf).delete(hp, true)
      }
      val sup = Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_acctbal"))
      TxLogTable.append(s, sup.coalesce(1), src) // v0
      TxLogTable.updateWhere(s, src,
        Map("s_acctbal" -> (col("s_acctbal") + lit(50.0))),
        col("s_suppkey") % 3 === 0) // v1 (post-clone-point noise)
      val cv = s.sql(s"CREATE TABLE graftlog.`$dst` SHALLOW CLONE " +
        s"graftlog.`$src` VERSION AS OF 0").head().getLong(0)
      require(cv == 0L, "clone lands as the destination's v0")
      val srcFiles = TxLogTable.filesAt(src, 0)
      require(TxLogTable.filesAt(dst, 0).toSet == srcFiles.toSet,
        "clone listing must be the source snapshot's, verbatim")
      def ino(p: String) = java.nio.file.Files.getAttribute(
        java.nio.file.Paths.get(p), "unix:ino")
      require(ino(s"$dst/${srcFiles.head}") == ino(s"$src/${srcFiles.head}"),
        "clone must hard-link, not copy — zero data bytes")
      // independent evolution both ways
      TxLogTable.deleteWhere(s, src, col("s_suppkey") % 7 === 0)
      TxLogTable.updateWhere(s, dst,
        Map("s_acctbal" -> (col("s_acctbal") * 2)),
        col("s_suppkey") % 5 === 0)
      require(TxLogTable.read(s, dst).count() == sup.count(),
        "the source's delete must never show in the clone")
      TxLogTable.read(s, dst)
        .select(col("s_suppkey"), col("s_acctbal"))
    },
    Some("""
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 5 = 0 THEN s_acctbal * 2
                  ELSE s_acctbal END AS s_acctbal
      FROM supplier
      ORDER BY s_suppkey"""))

  /** A23 metadata-only CONVERT (Delta's `CONVERT TO DELTA`,
    * [[TxLogTable.convert]]): a plain hive-partitioned parquet lake —
    * the reference ingester's own output shape (`ingester.go:995-1035`)
    * — onboards to the ACID surface with ONE v0 commit referencing the
    * files in place. REQUIREd in-query: zero data files rewritten
    * (byte-length + mtime identity across the convert), the v0 listing
    * is exactly the pre-existing relative paths, footer-harvested
    * stats prune a point predicate immediately, and post-convert ACID
    * DML (a real DELETE) runs against the converted files. DuckDB
    * replays the delete as a filter. */
  private val q197 = QueryDef(
    "q197_convert_in_place",
    (s, d) => {
      val path = s"/tmp/graft_conv_${new java.io.File(d).getName}"
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(s.sessionState.newHadoopConf()).delete(root, true)
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"), col("c_nationkey"))
      // the plain lake: hive-partitioned by a derived bucket, NOT graft
      cust.withColumn("nk_bucket", (col("c_nationkey") % 4).cast("string"))
        .repartition(2).write.partitionBy("nk_bucket").parquet(path)
      def snapshotDisk(): Map[String, (Long, Long)] = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(new java.io.File(path))
          .filter(_.getName.endsWith(".parquet"))
          .map(f => f.getPath -> ((f.length(), f.lastModified()))).toMap
      }
      val before = snapshotDisk()
      val v = TxLogTable.convert(s, path, partitionBy = Seq("nk_bucket"))
      require(v == 0L, s"convert must land as v0, got $v")
      require(snapshotDisk() == before,
        "convert must move ZERO data bytes (no rewrite, no touch)")
      val files = TxLogTable.filesAt(path, 0)
      require(files.nonEmpty && files.forall(_.startsWith("nk_bucket=")),
        s"v0 must reference the in-place hive files, got ${files.take(3)}")
      // footer-harvested stats engage without any graft-written file
      val (kept, skipped) = TxLogTable.prunedFiles(s, path,
        col("nk_bucket") === "9999")
      require(kept.isEmpty && skipped.nonEmpty,
        "partition pruning must drop every file for an absent bucket")
      // ACID DML straight off the converted snapshot
      TxLogTable.deleteWhere(s, path, col("c_custkey") % 10 === 0)
      require(TxLogTable.readVersion(s, path, 0).count() == cust.count(),
        "time travel to the converted v0 must serve the full lake")
      TxLogTable.read(s, path)
        .select(col("c_custkey"), col("c_acctbal"))
    },
    Some("""
      SELECT c_custkey, c_acctbal FROM customer
      WHERE c_custkey % 10 <> 0
      ORDER BY c_custkey"""))

  override val entries: Seq[QueryDef] =
    Seq(q33, q34, q35, q36, q37, q38, q47, q113, q154, q155, q156, q158,
      q161, q162, q163, q164, q165, q169, q170, q172, q173, q174, q176,
      q177, q180, q184, q188, q189, q191, q192, q193, q194, q195, q196,
      q197)
}
