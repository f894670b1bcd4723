package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** End-to-end SURVEY §3.1: JSON messages → envelope → routing → chain
  * (pii → ingester → deltawriter) → partitioned lake → SQL query. */
class IngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val cfgLake = StreamConfig("stream-a", "seg-key-1", active = true,
    "pageview", 1, "webdata", TimePartitions.Daily, 1, Seq("ingester"))
  private val cfgChain = StreamConfig("stream-b", "", active = true,
    "signup", 1, "crm", TimePartitions.Monthly, 2, Seq("pii-detection", "ingester", "deltawriter"))
  private val cfgOff = StreamConfig("stream-c", "", active = false,
    "dead", 1, "", TimePartitions.Daily, 1, Seq("ingester"))

  private def tmpDir = Files.createTempDirectory("graft-lake").toString

  test("e2e: routed batch lands as time-partitioned queryable parquet") {
    val dest = tmpDir
    val docs = Seq(
      """{"projectId":"seg-key-1","type":"pageview","url":"/a","ms":120,"ts_day":"2026-08-10"}""",
      """{"projectId":"seg-key-1","type":"pageview","url":"/b","ms":80,"ts_day":"2026-08-11"}""",
      """{"writeKey":"seg-key-1","url":"/c","ms":10}""",             // type from config
      """{"stream_id":"stream-c","type":"dead","x":1}""",            // inactive → dropped
      """{"stream_id":"rtdl_none","type":"zzz"}""",                  // unmatched → dropped
      """{"stream_id":"","message_type":"rtdl_205"}"""               // control → dropped
    ).toDF("json")

    val results = IngestPipeline.runBatch(spark, docs, "json",
      Seq(cfgLake, cfgChain, cfgOff), dest,
      tsCol = to_timestamp(lit("2026-08-12 10:00:00")), registerTables = false)

    assert(results.map(_.config.streamId) == Seq("stream-a"))
    val (_, path) = results.head.tables.head
    assert(path.endsWith("webdata/pageview"))

    val back = spark.read.parquet(path)
    assert(back.count() == 3)
    // partition column is the daily bucket of the injected clock
    assert(back.select("part").distinct().as[String].collect().toSeq == Seq("2026-08-12"))
    // payload fields became real columns; numbers are double (reference policy)
    assert(back.filter(col("url") === "/a").select("ms").as[Double].head() == 120.0)
  }

  test("e2e: pii-detection before ingester masks what lands in the lake; deltawriter appends") {
    val dest = tmpDir
    val docs = Seq(
      """{"stream_id":"stream-b","user":"u1","ssn":"123-45-6789","phone":"415-555-0199"}""",
      """{"stream_id":"stream-b","user":"u2","ssn":"987-65-4321"}"""
    ).toDF("json")

    val results = IngestPipeline.runBatch(spark, docs, "json", Seq(cfgChain), dest,
      tsCol = to_timestamp(lit("2026-08-12 10:00:00")), registerTables = false)

    assert(results.head.chain == Seq("pii-detection", "ingester", "deltawriter"))
    val lakePath = results.head.tables.find(_._2.contains("/crm/")).get._2
    val lake = spark.read.parquet(lakePath)
    assert(lake.select("ssn").as[String].collect().toSet == Set("###"))
    assert(lake.filter(col("user") === "u1").select("phone").as[String].head() == "###")

    // deltawriter target got the same masked rows, append-mode
    val deltaPath = results.head.tables.find(_._2.contains("/_delta/")).get._2
    assert(IngestPipeline.readTable(spark, deltaPath).count() == 2)
    // run again → append doubles the delta table (delta_writer.py append semantics)
    IngestPipeline.runBatch(spark, docs, "json", Seq(cfgChain), dest,
      tsCol = to_timestamp(lit("2026-08-12 10:00:00")), registerTables = false)
    assert(IngestPipeline.readTable(spark, deltaPath).count() == 4)
  }

  test("e2e: catalog registration makes tables SQL-queryable") {
    val dest = tmpDir
    val docs = Seq("""{"projectId":"seg-key-1","type":"pageview","url":"/a","ms":5}""").toDF("json")
    IngestPipeline.runBatch(spark, docs, "json", Seq(cfgLake), dest,
      tsCol = to_timestamp(lit("2026-08-12 10:00:00")), database = "rtdl_test")
    val n = spark.sql("SELECT count(*) AS n FROM rtdl_test.webdata_pageview").as[Long].head()
    assert(n == 1)
    spark.sql("DROP DATABASE rtdl_test CASCADE")
  }

  test("DLQ: unroutable and inactive-stream messages land in quarantine with reasons") {
    val dest = tmpDir
    val docs = Seq(
      """{"projectId":"seg-key-1","type":"pageview","url":"/ok","ms":1}""", // routed
      """{"stream_id":"stream-c","type":"dead","x":1}""",                   // inactive
      """{"stream_id":"nobody-home","y":2}""",                              // unmatched
      """not json at all {{{"""                                             // malformed
    ).toDF("json")
    IngestPipeline.runBatch(spark, docs, "json", Seq(cfgLake, cfgOff), dest,
      tsCol = to_timestamp(lit("2026-08-12 10:00:00")), registerTables = false)
    val q = spark.read.parquet(s"$dest/_quarantine")
    val reasons = q.select("reason").as[String].collect().sorted.toSeq
    assert(reasons == Seq("no_matching_config", "no_matching_config", "stream_inactive"))
    // the malformed original payload is preserved verbatim for replay
    assert(q.filter(col("payload").contains("not json")).count() == 1)
    // the routable message still landed in the lake
    assert(spark.read.parquet(s"$dest/webdata/pageview").count() == 1)
  }

  test("schema drift across batches merges on read (mergeSchema discipline)") {
    val dest = tmpDir
    IngestPipeline.runBatch(spark,
      Seq("""{"stream_id":"stream-b","user":"u1"}""").toDF("json"), "json",
      Seq(cfgChain.copy(functions = Seq("deltawriter"))), dest, registerTables = false)
    IngestPipeline.runBatch(spark,
      Seq("""{"stream_id":"stream-b","user":"u2","new_field":7}""").toDF("json"), "json",
      Seq(cfgChain.copy(functions = Seq("deltawriter"))), dest, registerTables = false)
    val merged = IngestPipeline.readTable(spark, s"$dest/_delta/stream_b/signup")
    assert(merged.columns.contains("new_field"))
    assert(merged.count() == 2)
  }

  test("batchScope: configs sharing an output path don't replace each other's files") {
    // two ACTIVE configs with the same folderName and message type —
    // both route distinct messages to the SAME lake dir and delta table.
    // The per-batch idempotency scope must be per-config: a shared scope
    // would make the second config's publishBatch delete-and-replace the
    // first's files (and its delta append silently no-op on the shared
    // txn watermark) — silent data loss plain Append never had.
    val dest = tmpDir
    val cfgA = StreamConfig("stream-x", "", active = true,
      "pageview", 1, "shared", TimePartitions.Daily, 1, Seq("ingester", "deltawriter"))
    val cfgB = StreamConfig("stream-y", "", active = true,
      "pageview", 1, "shared", TimePartitions.Daily, 1, Seq("ingester", "deltawriter"))
    val docs = Seq(
      """{"stream_id":"stream-x","type":"pageview","url":"/from-x"}""",
      """{"stream_id":"stream-y","type":"pageview","url":"/from-y"}""").toDF("json")
    IngestPipeline.runBatch(spark, docs, "json", Seq(cfgA, cfgB), dest,
      tsCol = to_timestamp(lit("2026-08-13 10:00:00")), registerTables = false,
      batchScope = Some(("scope0", 0L)))
    val lake = spark.read.parquet(s"$dest/shared/pageview")
      .select("url").as[String].collect().toSet
    assert(lake == Set("/from-x", "/from-y"),
      s"both configs' rows must land in the shared lake dir: $lake")
    // delta tables key on streamId (distinct dirs here), but the txn
    // appIds must also be distinct — replay the batch and check both
    // tables are still exactly-once (no-op replays, no lost rows)
    IngestPipeline.runBatch(spark, docs, "json", Seq(cfgA, cfgB), dest,
      tsCol = to_timestamp(lit("2026-08-13 10:00:00")), registerTables = false,
      batchScope = Some(("scope0", 0L)))
    assert(spark.read.parquet(s"$dest/shared/pageview").count() == 2,
      "a replayed batch must replace per-config files, not drop or duplicate them")
    assert(IngestPipeline.readTable(spark, s"$dest/_delta/stream_x/pageview").count() == 1)
    assert(IngestPipeline.readTable(spark, s"$dest/_delta/stream_y/pageview").count() == 1)
  }
}
