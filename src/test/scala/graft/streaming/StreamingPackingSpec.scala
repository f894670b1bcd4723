package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Packing
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingPackingSpec extends SparkSpec {
  import spark.implicits._

  private type PackRow = (Long, Long, Long, Long, Long, Long)

  private def rows(path: String): Set[PackRow] =
    spark.read.parquet(path)
      .select("doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
      .as[PackRow].collect().toSet

  test("two batches pack identically to one batch of the union") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft-pack-out").toString
    val hwm = Files.createTempDirectory("graft-pack-hwm").toString
    val ckpt = Files.createTempDirectory("graft-pack-ckpt").toString

    val b1 = (1L to 40L).map(i => (i, 10 + (i % 7)))
    val b2 = (41L to 90L).map(i => (i, 5 + (i % 11)))

    val mem = MemoryStream[(Long, Long)]
    val q = StreamingPacking.start(
      mem.toDF().toDF("doc_id", "n_tokens"), "doc_id", "n_tokens",
      capacity = 128, out, hwm, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()

    val batch = Packing.assign(
      (b1 ++ b2).toDF("doc_id", "n_tokens"), "doc_id", "n_tokens", capacity = 128)
      .as[PackRow].collect().toSet
    assert(rows(out) == batch,
      "streamed packing must equal the batch job over the union")
  }

  test("replayed batch is idempotent; mark reads exclude the crashed batch's own publishes") {
    val out = Files.createTempDirectory("graft-packc-out").toString
    val hwm = Files.createTempDirectory("graft-packc-hwm").toString
    val ckpt = Files.createTempDirectory("graft-packc-ckpt").toString
    val scope = BatchCommits.scopeFor(ckpt)

    val b0 = (1L to 5L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
    StreamingPacking.processBatch(b0, 0L, "doc_id", "n_tokens", 128, out, hwm, ckpt)
    assert(StreamingPacking.highWaterMark(spark, hwm, scope, 1L) == 500L)

    // crash window: batch 1 published output AND mark but no marker —
    // the replay must reread start from batches < 1 only (500, not 800)
    val b1 = (6L to 8L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
    StreamingPacking.processBatch(b1, 1L, "doc_id", "n_tokens", 128, out, hwm, ckpt)
    // simulate the lost marker and replay
    val (fs, _) = BatchCommits.fileSystem(spark, ckpt)
    fs.delete(new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(ckpt, "graft_batch_commits"), "1"), false)
    StreamingPacking.processBatch(b1, 1L, "doc_id", "n_tokens", 128, out, hwm, ckpt)

    assert(StreamingPacking.highWaterMark(spark, hwm, scope, 2L) == 800L)
    val offsets = rows(out).toSeq.sortBy(_._1).map(_._3)
    assert(offsets == (0L until 800L by 100L).toSeq,
      s"offsets must stay contiguous after the replay: $offsets")
    // fully committed batch replays as a no-op
    StreamingPacking.processBatch(b1, 1L, "doc_id", "n_tokens", 128, out, hwm, ckpt)
    assert(rows(out).size == 8)

    // mark compaction: one file afterwards, continuation unchanged
    StreamingPacking.compactMarks(spark, hwm)
    val files = new java.io.File(hwm).listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    assert(files == 1, s"marks not compacted to one file: $files")
    assert(StreamingPacking.highWaterMark(spark, hwm, scope, 2L) == 800L,
      "compaction must preserve the continuation point")
    val b2 = (9L to 10L).map(i => (i, 100L)).toDF("doc_id", "n_tokens")
    StreamingPacking.processBatch(b2, 2L, "doc_id", "n_tokens", 128, out, hwm, ckpt)
    assert(rows(out).toSeq.sortBy(_._1).map(_._3) == (0L until 1000L by 100L).toSeq)
  }
}
