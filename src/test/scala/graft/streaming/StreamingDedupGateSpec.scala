package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupGateSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup across batches and restarts against the durable hash index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("graft-gate-idx").toString
    val out = Files.createTempDirectory("graft-gate-out").toString
    val ckpt = Files.createTempDirectory("graft-gate-ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedupGate.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: two distinct docs plus an in-batch duplicate (id 3 of id 1)
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      q.processAllAvailable()
      val b1 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b1 == Set(1L, 2L), "min-id keeper within the batch")

      // batch 2: a cross-batch duplicate and a new doc
      mem.addData((4L, "alpha beta"), (5L, "epsilon zeta"))
      q.processAllAvailable()
      val b2 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b2 == Set(1L, 2L, 5L), "cross-batch duplicate dropped")
    } finally q.stop()

    // restart with a FRESH checkpoint: the index alone must carry the
    // dedup memory
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingDedupGate.start(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, Files.createTempDirectory("graft-gate-ckpt2").toString,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem2.addData((6L, "gamma delta"), (7L, "brand new content"))
      q2.processAllAvailable()
      val b3 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b3 == Set(1L, 2L, 5L, 7L), "restart-era duplicate dropped via the index")
      assert(spark.read.parquet(idx).count() == 4, "index holds one hash per admitted doc")
    } finally q2.stop()
  }
}
