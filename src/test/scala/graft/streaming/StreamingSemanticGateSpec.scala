package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingSemanticGateSpec extends SparkSpec {
  import spark.implicits._

  // two fixed cells on the axes; near-dups inside cell 0, a distinct
  // vector in each cell
  private val book = Seq(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
  private val v1 = Array(1.0f, 0.05f)
  private val v2 = Array(1.0f, 0.06f) // cos(v1, v2) ≈ 0.99995
  private val v3 = Array(0.05f, 1.0f) // cell 1
  private val v5 = Array(0.3f, 1.0f)  // cell 1, cos(v3, v5) ≈ 0.971 < 0.99

  test("semantic gate: in-batch pairwise-greedy, cross-batch drop via the durable cell index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("graft-sgate-idx").toString
    val out = Files.createTempDirectory("graft-sgate-out").toString
    val ckpt = Files.createTempDirectory("graft-sgate-ckpt").toString

    val mem = MemoryStream[(Long, Array[Float])]
    val q = StreamingSemanticGate.start(
      mem.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      book, idx, out, ckpt, threshold = 0.99,
      trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: a semantic pair (greedy: larger id drops) + one distinct
      mem.addData((1L, v1), (2L, v2), (3L, v3))
      q.processAllAvailable()
      val b1 = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
      assert(b1 == Set(1L, 3L), s"in-batch semantic dup must drop the larger id: $b1")

      // batch 2: near-dup of an ADMITTED doc drops; same-cell-but-far admits
      mem.addData((4L, v2), (5L, v5))
      q.processAllAvailable()
      val b2 = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
      assert(b2 == Set(1L, 3L, 5L), s"cross-batch semantic dup must drop: $b2")
    } finally q.stop()

    // restart with a FRESH checkpoint: the index alone carries the memory
    val mem2 = MemoryStream[(Long, Array[Float])]
    val q2 = StreamingSemanticGate.start(
      mem2.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      book, idx, out, Files.createTempDirectory("graft-sgate-ckpt2").toString,
      threshold = 0.99, trigger = Trigger.ProcessingTime(0))
    try {
      mem2.addData((6L, v1), (7L, Array(1.0f, -0.4f)))
      q2.processAllAvailable()
      val b3 = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
      assert(b3 == Set(1L, 3L, 5L, 7L), s"restart-era semantic dup must drop via the index: $b3")
    } finally q2.stop()

    // index layout: cell partitions, EVERY seen doc resident (admitted
    // and dropped — what makes admission batch-boundary independent)
    val cellDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "index must be hive-partitioned by cell")
    val residents = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(residents == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      s"index must hold every seen doc: $residents")
  }

  test("admissions are batch-boundary independent and equal the batch operator over the union") {
    val rows = Seq((1L, v1), (2L, v2), (3L, v3), (4L, v2), (5L, v5))
    def run(batches: Seq[Seq[(Long, Array[Float])]]): Set[Long] = {
      val out = Files.createTempDirectory("graft-sgate-bout").toString
      val idx = Files.createTempDirectory("graft-sgate-bidx").toString
      val ckpt = Files.createTempDirectory("graft-sgate-bckpt").toString
      batches.zipWithIndex.foreach { case (rs, i) =>
        StreamingSemanticGate.processBatch(rs.toDF("vec_id", "embedding"),
          i.toLong, "vec_id", "embedding", book, idx, out, ckpt, 0.99, 100000)
      }
      spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
    }
    val together = run(Seq(rows))
    val split = run(Seq(rows.take(2), rows.slice(2, 4), rows.drop(4)))
    assert(together == split,
      s"batch boundaries changed the corpus: $together vs $split")
    // the gate's pairwise rule IS the batch operator's rule over fixed
    // cells, so the admitted set equals semDedupWith's kept set
    val batchKept = Dedup.semDedupWith(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", book, threshold = 0.99)
      .filter($"kept" === 1).select("corpus_id").as[Long].collect().toSet
    assert(together == batchKept,
      s"gate $together must equal batch semDedupWith $batchKept")
  }

  test("codebook stamp: a retrained codebook is refused, same codebook accepted") {
    val idx = Files.createTempDirectory("graft-sgate-sidx").toString
    val out = Files.createTempDirectory("graft-sgate-sout").toString
    val ckpt = Files.createTempDirectory("graft-sgate-sckpt").toString
    StreamingSemanticGate.processBatch(Seq((1L, v1)).toDF("vec_id", "embedding"),
      0L, "vec_id", "embedding", book, idx, out, ckpt, 0.99, 100000)
    // same codebook: fine
    StreamingSemanticGate.processBatch(Seq((2L, v3)).toDF("vec_id", "embedding"),
      1L, "vec_id", "embedding", book, idx, out, ckpt, 0.99, 100000)
    // drifted codebook: refused loudly before any publish
    val drifted = Seq(0L -> Array(0.9, 0.1), 1L -> Array(0.0, 1.0))
    val e = intercept[IllegalStateException] {
      StreamingSemanticGate.processBatch(Seq((3L, v5)).toDF("vec_id", "embedding"),
        2L, "vec_id", "embedding", drifted, idx, out, ckpt, 0.99, 100000)
    }
    assert(e.getMessage.contains("codebook"))
  }

  test("crash window: replay after the output marker re-derives the index; cap admits past maxCellSize") {
    val idx = Files.createTempDirectory("graft-sgate-cidx").toString
    val out = Files.createTempDirectory("graft-sgate-cout").toString
    val ckpt = Files.createTempDirectory("graft-sgate-cckpt").toString
    val scope = BatchCommits.scopeFor(ckpt)
    val batch = Seq((1L, v1), (2L, v3)).toDF("vec_id", "embedding")

    // simulate: output published + out marker, index publish crashed
    BatchCommits.publishBatch(batch, out, scope, 0L)
    BatchCommits.createMarker(spark, ckpt, "graft_out_commits", 0L)
    StreamingSemanticGate.processBatch(batch, 0L, "vec_id", "embedding",
      book, idx, out, ckpt, 0.99, 100000)
    assert(spark.read.parquet(out).count() == 2, "recovery must not touch the output")
    val ids = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"recovery must complete the index: $ids")

    // a semantic dup of doc 1 in the next batch is dropped against that index
    StreamingSemanticGate.processBatch(
      Seq((9L, v2)).toDF("vec_id", "embedding"), 1L, "vec_id", "embedding",
      book, idx, out, ckpt, 0.99, 100000)
    assert(spark.read.parquet(out).count() == 2, "recovered index must gate the next batch")

    // maxCellSize = 1: cell 0 already holds 2 residents (1 and 9), so
    // comparison is skipped and even an exact twin admits — guard, not
    // detonate (nCentroids at training time is the real knob)
    StreamingSemanticGate.processBatch(
      Seq((10L, v1)).toDF("vec_id", "embedding"), 2L, "vec_id", "embedding",
      book, idx, out, ckpt, 0.99, maxCellSize = 1)
    val admitted = spark.read.parquet(out).select("vec_id").as[Long].collect().toSet
    assert(admitted.contains(10L), s"over-cap cell must admit: $admitted")
  }
}
