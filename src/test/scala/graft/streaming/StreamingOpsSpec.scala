package graft.streaming

import graft.SparkSpec
import graft.operators.{ConfigService, IngestPipeline, StreamConfig, TimePartitions}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowed agg with watermark: late row beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedCounts(events, "ts", "event_type",
      "5 minutes", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      mem.addData((ts("2026-01-01 10:00:10"), "click", 1.0),
        (ts("2026-01-01 10:02:00"), "click", 2.0))
      q.processAllAvailable()
      // advance watermark far past the first window
      mem.addData((ts("2026-01-01 11:00:00"), "view", 1.0))
      q.processAllAvailable()
      // this row is > 10 min late → dropped by the watermark
      mem.addData((ts("2026-01-01 10:01:00"), "click", 100.0))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 12:00:00"), "view", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .filter(col("event_type") === "click")
        .select("n", "total").as[(Long, Double)].collect()
      assert(rows.toSeq == Seq((2L, 3.0))) // late 100.0 never counted
    } finally q.stop()
  }

  test("session windows: gap splits sessions") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "user_id")
    val q = StreamingOps.sessionCounts(events, "ts", "user_id", "5 minutes")
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      mem.addData((ts("2026-01-01 10:00:00"), 1L), (ts("2026-01-01 10:02:00"), 1L),
        (ts("2026-01-01 10:30:00"), 1L)) // second session
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 12:00:00"), 2L)) // close watermark
      q.processAllAvailable()
      val sessions = spark.table("sess_out").filter(col("user_id") === 1)
        .select("n").as[Long].collect().sorted.toSeq
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming dedup drops in-watermark duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val events = mem.toDF().toDF("ts", "event_id")
    val q = StreamingOps.dedupStream(events, "ts", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      mem.addData((ts("2026-01-01 10:00:00"), 1L), (ts("2026-01-01 10:00:00"), 1L),
        (ts("2026-01-01 10:00:01"), 2L))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("flatMapGroupsWithState: running count per key across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val events = mem.toDF().toDF("user_id")
    val q = StreamingOps.runningCountPerKey(spark, events, "user_id")
      .writeStream.outputMode("append").format("memory").queryName("state_out").start()
    try {
      mem.addData(7L, 7L, 8L); q.processAllAvailable()
      mem.addData(7L); q.processAllAvailable()
      val counts = spark.table("state_out").as[(Long, Long)].collect().toSet
      assert(counts.contains((7L, 2L)) && counts.contains((7L, 3L)) && counts.contains((8L, 1L)))
    } finally q.stop()
  }

  test("update output mode: window results re-emit as late-but-in-watermark rows arrive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamingOps.windowedCounts(events, "ts", "event_type",
      "5 minutes", watermark = "10 minutes")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("upd_out").start()
    try {
      mem.addData((ts("2026-01-01 10:00:10"), "click", 1.0))
      q.processAllAvailable()
      // same window, still within watermark → update mode re-emits the row
      mem.addData((ts("2026-01-01 10:01:00"), "click", 2.0))
      q.processAllAvailable()
      val emitted = spark.table("upd_out").filter(col("event_type") === "click")
        .select("n", "total").as[(Long, Double)].collect().toSet
      assert(emitted == Set((1L, 1.0), (2L, 3.0))) // first emit, then updated emit
    } finally q.stop()
  }

  test("e2e streaming ingest: drop-dir JSON → foreachBatch pipeline → lake") {
    val src = Files.createTempDirectory("graft-stream-src").toString
    val cfgDir = Files.createTempDirectory("graft-stream-cfg").toString
    val dest = Files.createTempDirectory("graft-stream-dest").toString
    val chk = Files.createTempDirectory("graft-stream-chk").toString

    val svc = new ConfigService(cfgDir)
    svc.create(StreamConfig("", "stream-key", active = true, "clickstream", 1,
      "weblogs", TimePartitions.Daily, 1, Seq("ingester")))

    Files.writeString(java.nio.file.Paths.get(src, "batch1.json"),
      """{"projectId":"stream-key","type":"clickstream","url":"/a","ms":12}
        |{"projectId":"stream-key","type":"clickstream","url":"/b","ms":34}
        |""".stripMargin)

    val q = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
    try {
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dest/weblogs/clickstream")
      assert(out.count() == 2)
      assert(out.columns.contains("part"))
      // restart with new data: checkpoint resumes, no reprocessing
      Files.writeString(java.nio.file.Paths.get(src, "batch2.json"),
        """{"projectId":"stream-key","type":"clickstream","url":"/c","ms":56}""" + "\n")
      val q2 = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
      q2.processAllAvailable(); q2.stop()
      assert(spark.read.parquet(s"$dest/weblogs/clickstream").count() == 3)
    } finally if (q.isActive) q.stop()
  }

  test("A22 replay guard: a re-delivered batch id is skipped, no duplicate rows") {
    val src = Files.createTempDirectory("graft-replay-src").toString
    val cfgDir = Files.createTempDirectory("graft-replay-cfg").toString
    val dest = Files.createTempDirectory("graft-replay-dest").toString
    val chk = Files.createTempDirectory("graft-replay-chk").toString

    new ConfigService(cfgDir).create(StreamConfig("", "stream-key", active = true,
      "clickstream", 1, "weblogs", TimePartitions.Daily, 1, Seq("ingester")))
    Files.writeString(java.nio.file.Paths.get(src, "batch1.json"),
      """{"projectId":"stream-key","type":"clickstream","url":"/a","ms":12}""" + "\n")

    val q = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(s"$dest/weblogs/clickstream").count() == 1)

    // wipe the checkpoint: the restarted query re-reads the same file under
    // the SAME batch id 0 — exactly the replay-after-partial-commit shape.
    // The _batch_commits marker must make it a no-op.
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(chk)).iterator().asScala.toSeq
      .sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
    val q2 = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(s"$dest/weblogs/clickstream").count() == 1)
  }

  test("A22 exactly-once: crash in the sink→marker window replays without duplicates") {
    val src = Files.createTempDirectory("graft-eo-src").toString
    val cfgDir = Files.createTempDirectory("graft-eo-cfg").toString
    val dest = Files.createTempDirectory("graft-eo-dest").toString
    val chk = Files.createTempDirectory("graft-eo-chk").toString

    // both sink kinds in one chain (lake append + transaction-logged
    // delta append), plus an unroutable row for the quarantine sink
    new ConfigService(cfgDir).create(StreamConfig("", "stream-key", active = true,
      "clickstream", 1, "weblogs", TimePartitions.Daily, 1,
      Seq("ingester", "deltawriter")))
    Files.writeString(java.nio.file.Paths.get(src, "batch1.json"),
      """{"projectId":"stream-key","type":"clickstream","url":"/a","ms":12}
        |{"projectId":"stream-key","type":"clickstream","url":"/b","ms":34}
        |{"projectId":"nobody-home","type":"clickstream","url":"/x","ms":1}
        |""".stripMargin)

    val q = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
    q.processAllAvailable(); q.stop()
    val deltaPath = s"$dest/_delta/stream_key/clickstream"
    assert(spark.read.parquet(s"$dest/weblogs/clickstream").count() == 2)
    assert(graft.operators.TxLogTable.read(spark, deltaPath).count() == 2)
    val v0 = graft.operators.TxLogTable.currentVersion(deltaPath)
    assert(spark.read.parquet(s"$dest/_quarantine").count() == 1)

    // crash INSIDE the sink→marker window: all sinks landed, the marker
    // didn't. Simulate by deleting the markers; wiping the checkpoint
    // re-delivers the same file as batch id 0 — the replay re-runs every
    // sink over output that is already there.
    import scala.jdk.CollectionConverters._
    def wipe(dir: String): Unit =
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
        .toSeq.sortBy(-_.getNameCount).foreach(java.nio.file.Files.delete)
    wipe(s"$dest/_batch_commits")
    wipe(chk)

    val q2 = StreamingOps.startIngest(spark, src, cfgDir, dest, chk)
    q2.processAllAvailable(); q2.stop()
    // idempotent publish: lake + quarantine replaced their own files
    assert(spark.read.parquet(s"$dest/weblogs/clickstream").count() == 2)
    assert(spark.read.parquet(s"$dest/_quarantine").count() == 1)
    // SetTransaction idempotency: the replayed append did not commit a
    // second version, let alone duplicate rows
    assert(graft.operators.TxLogTable.read(spark, deltaPath).count() == 2)
    assert(graft.operators.TxLogTable.currentVersion(deltaPath) == v0)
  }
}
