package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** A20 + end-to-end batch ingest — the whole reference hot path (SURVEY
  * §3.1) collapsed into one Spark job:
  *
  *   raw JSON → envelope (A2) → config broadcast-join routing (A3/A4) →
  *   control filter (A7) → per-config function chain (A20):
  *     "pii-detection" → payload masking (A21)
  *     "ingester"      → time-partitioned parquet lake write (A9-A17)
  *     "deltawriter"   → append-mode table write with schema merge (A23)
  *
  * The reference hops through Kafka + Flink StateFun between every stage
  * (6 process boundaries); here the chain is a fold of DataFrame
  * transforms inside one plan — the only boundaries left are source and
  * storage, which is why the rebuild's per-message cost collapses.
  *
  * Chain semantics preserved: stages run in config order after dedup
  * (ingester.go:174-184, 1600-1650); each stage after the first receives
  * the (possibly transformed) payload, and sinks see the payload as it is
  * at their position in the chain (pii before ingester masks what lands
  * in the lake; after, only downstream stages see masked data).
  *
  * Delta divergence note: stock /opt/spark/jars has no delta-core, so
  * "deltawriter" appends parquet with schema evolution via mergeSchema-on-
  * read — same append-only table semantics (delta_writer.py:88-94), no
  * ACID log. Swap to format("delta") when the jar is present.
  */
object IngestPipeline {

  final case class BatchResult(
      config: StreamConfig,
      tables: Seq[(String, String)],
      chain: Seq[String])

  /** Run one batch of raw JSON documents through the full pipeline.
    *
    * `batchScope = Some((scope, batchId))` makes EVERY sink in the fan-out
    * idempotent for that (scope, batch) — quarantine and lake files
    * publish with batch-scoped names that a replay replaces
    * ([[graft.streaming.BatchCommits.publishBatch]]), and the
    * transaction-logged delta appends carry a SetTransaction-style
    * `(appId, batchId)` identifier [[TxLogTable.append]] skips on replay.
    * This is what upgrades streaming ingest's sink→marker window from
    * at-least-once to exactly-once (A22). */
  def runBatch(
      spark: SparkSession,
      rawJson: DataFrame,
      jsonCol: String,
      configs: Seq[StreamConfig],
      destRoot: String,
      tsCol: Column = current_timestamp(),
      database: String = "rtdl",
      registerTables: Boolean = true,
      batchScope: Option[(String, Long)] = None): Seq[BatchResult] = {

    val env = Envelope.project(rawJson, jsonCol)
    val allRouted = Envelope.filterControl(Router.route(spark, env, configs))

    // DLQ (improvement over the reference, which logs-and-drops —
    // ingester.go:1592-1597): unroutable messages (no config match —
    // including malformed JSON, whose envelope fields are all null — or
    // an inactive stream) land in a quarantine table with a reason.
    val quarantined = allRouted
      .filter(col("cfg_stream_id").isNull || col("cfg_active") =!= true)
      .select(col("payload"),
        when(col("cfg_stream_id").isNull, "no_matching_config")
          .otherwise("stream_inactive").as("reason"))
    // written unconditionally: one job, vs isEmpty (a full scan when the
    // quarantine is empty — the common case) plus the write job
    batchScope match {
      case Some((scope, batchId)) =>
        graft.streaming.BatchCommits.publishBatch(
          quarantined, s"$destRoot/_quarantine", scope, batchId)
      case None =>
        quarantined.write.mode(SaveMode.Append).parquet(s"$destRoot/_quarantine")
    }

    val routed = Router.activeOnly(allRouted)
      .cache() // reused once per config; unpersisted below

    try {
      configs.filter(_.active).flatMap { cfg =>
        val mine = routed.filter(
          (col("cfg_stream_id") === cfg.streamId) ||
          (lit(cfg.streamAltId) =!= "" && col("cfg_stream_alt_id") === cfg.streamAltId))
        val chain = StreamConfig.dedupChain(
          if (cfg.functions.nonEmpty) cfg.functions else Seq(Router.DefaultFunction))
        // the idempotency scope must be unique PER CONFIG, not just per
        // (checkpoint, batch): two configs can resolve to the same output
        // path (shared folderName, or streamIds that sanitize to the same
        // ident), and a shared scope would make each config's publishBatch
        // delete-and-replace the other's files within the batch — silent
        // data loss the old plain Append never had. Hash the full routing
        // identity into the scope (stable across restarts, distinct
        // across configs).
        val cfgScope = batchScope.map { case (s, b) =>
          val tag = java.security.MessageDigest.getInstance("MD5")
            .digest(s"${cfg.streamId}|${cfg.streamAltId}".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.take(8)
          (s"$s-$tag", b)
        }

        var df = mine
        val written = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        chain.foreach {
          case "pii-detection" =>
            df = PiiMask.maskColumn(df, "payload")
          case "ingester" =>
            written ++= LakeWriter.writeStreamTable(
              spark, df, cfg, destRoot, tsCol, database, registerTables,
              batchScope = cfgScope)
          case "deltawriter" =>
            written ++= appendDeltaStyle(spark, df, cfg, destRoot, database,
              registerTables, cfgScope)
          case other =>
            throw new IllegalArgumentException(s"unknown chain function '$other'")
        }
        if (written.isEmpty) None
        else Some(BatchResult(cfg, written.toSeq, chain))
      }
    } finally routed.unpersist()
  }

  /** A23 — append-mode table per (db, table) with db/table resolution
    * project_id > stream_alt_id > stream_id and type > message_type
    * (delta_writer.py:25-41). */
  private def appendDeltaStyle(
      spark: SparkSession,
      messages: DataFrame,
      cfg: StreamConfig,
      destRoot: String,
      database: String,
      registerTables: Boolean,
      batchScope: Option[(String, Long)] = None): Seq[(String, String)] = {
    val dbName = LakeWriter.sanitizeIdent(
      if (cfg.streamAltId.nonEmpty) cfg.streamAltId else cfg.streamId)
    val types = messages.select(col("message_type_resolved")).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    types.map { mt =>
      val sub = messages.filter(col("message_type_resolved") === mt)
      val parsed = SchemaPolicy.parseColumn(spark, sub, "payload", "__p")
      val flat = parsed.select(col("__p.*"))
      val path = s"$destRoot/_delta/$dbName/$mt"
      // transaction-logged append (TxLogTable): atomic versioned commits,
      // snapshot isolation, time travel — the ACID semantics the reference
      // gets from Delta (delta_writer.py:94), without delta jars. The txn
      // identifier scopes idempotency per streaming (checkpoint, batch):
      // a replayed batch's append is a no-op (SetTransaction contract).
      TxLogTable.append(spark, flat, path,
        txn = batchScope.map { case (s, b) =>
          (s"$s:${LakeWriter.sanitizeIdent(dbName)}/${LakeWriter.sanitizeIdent(mt)}", b) })
      // txlog tables are read through TxLogTable.read (snapshot resolution);
      // a plain parquet-location catalog entry can't express the log, so
      // registration is via a temp view over the committed snapshot
      val table = s"delta_${dbName}_${LakeWriter.sanitizeIdent(mt)}"
      if (registerTables) TxLogTable.read(spark, path).createOrReplaceTempView(table)
      (table, path)
    }
  }

  /** A24 — read-back of an append table with schema drift merged;
    * transaction-logged tables resolve the committed snapshot. Log
    * detection goes through Hadoop FS so a table on `hdfs://`/`s3a://`
    * resolves its snapshot, not the driver's local disk. */
  def readTable(spark: SparkSession, path: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path, "_log")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) TxLogTable.read(spark, path)
    else spark.read.option("mergeSchema", true).parquet(path)
  }
}
