package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingNearDupGateSpec extends SparkSpec {
  import spark.implicits._

  private val near1 = "the quick brown fox jumps over the lazy dog tonight"
  private val near2 = "the quick brown fox jumps over the lazy dog today" // ~0.83 Jaccard
  private val other = "completely different content about spark streaming gates"
  private val third = "yet another unrelated document concerning parquet indexes"

  test("near-dup gate: in-batch pairwise-greedy, cross-batch drop via the durable index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("graft-ngate-idx").toString
    val out = Files.createTempDirectory("graft-ngate-out").toString
    val ckpt = Files.createTempDirectory("graft-ngate-ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = StreamingNearDupGate.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, ckpt, threshold = 0.7, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: a near-dup pair (greedy: larger id drops) + one distinct
      mem.addData((1L, near1), (2L, near2), (3L, other))
      q.processAllAvailable()
      val b1 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b1 == Set(1L, 3L), s"in-batch near-dup must drop the larger id: $b1")

      // batch 2: near-dup of an ADMITTED doc drops; novel doc admitted
      mem.addData((4L, near2), (5L, third))
      q.processAllAvailable()
      val b2 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b2 == Set(1L, 3L, 5L), s"cross-batch near-dup must drop: $b2")
    } finally q.stop()

    // restart with a FRESH checkpoint: the index alone carries the memory
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingNearDupGate.start(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, Files.createTempDirectory("graft-ngate-ckpt2").toString,
      threshold = 0.7, trigger = Trigger.ProcessingTime(0))
    try {
      mem2.addData((6L, near1), (7L, "entirely novel text about nothing else"))
      q2.processAllAvailable()
      val b3 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b3 == Set(1L, 3L, 5L, 7L), s"restart-era near-dup must drop via the index: $b3")
    } finally q2.stop()

    // index layout: band-prefix partitions, EVERY seen doc resident
    // (admitted and dropped — that's what makes admissions independent
    // of batch boundaries)
    val bpDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("bp="))
    assert(bpDirs.nonEmpty, "index must be hive-partitioned by band prefix")
    val residents = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(residents == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L),
      s"index must hold every seen doc: $residents")
  }

  test("admissions are independent of micro-batch boundaries (chain A~B~C)") {
    // A~B and B~C but A and C distant: with ids in order, B drops
    // against A and C drops against B (seen, though dropped) — the SAME
    // decision whether the three arrive together or C arrives alone
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "alpha beta gamma delta epsilon zeta eta iota"    // ~A
    val cTxt = "kappa beta gamma delta epsilon zeta eta iota" // ~B, not ~A at 0.7
    def run(batches: Seq[Seq[(Long, String)]]): Set[Long] = {
      val out = Files.createTempDirectory("graft-ngate-bout").toString
      val idx = Files.createTempDirectory("graft-ngate-bidx").toString
      val ckpt = Files.createTempDirectory("graft-ngate-bckpt").toString
      batches.zipWithIndex.foreach { case (rows, i) =>
        // 8 bands x 2 rows: recall ~0.999 at J=0.78, so the chain's
        // pairs are found deterministically
        StreamingNearDupGate.processBatch(rows.toDF("doc_id", "text"),
          i.toLong, "doc_id", "text", idx, out, ckpt, 1, 16, 8, 2, 0.7, 1000)
      }
      spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    }
    val together = run(Seq(Seq((1L, a), (2L, b), (3L, cTxt))))
    val split = run(Seq(Seq((1L, a), (2L, b)), Seq((3L, cTxt))))
    assert(together == split,
      s"batch boundaries changed the corpus: $together vs $split")
    assert(together == Set(1L), s"chain must keep only the head: $together")
  }

  test("id column literally named \"id\" does not collide with the dup-id lineage") {
    // dupIds is lineage-derived from the same batch, so an unqualified
    // col("id") in the anti-join condition would be ambiguous at
    // analysis — the reserved __dup_id rename must keep this working
    val idx = Files.createTempDirectory("graft-ngate-ididx").toString
    val out = Files.createTempDirectory("graft-ngate-idout").toString
    val ckpt = Files.createTempDirectory("graft-ngate-idckpt").toString
    StreamingNearDupGate.processBatch(
      Seq((1L, near1), (2L, near2), (3L, other)).toDF("id", "text"),
      0L, "id", "text", idx, out, ckpt, 1, 16, 4, 4, 0.7, 1000)
    StreamingNearDupGate.processBatch(
      Seq((4L, near2), (5L, third)).toDF("id", "text"),
      1L, "id", "text", idx, out, ckpt, 1, 16, 4, 4, 0.7, 1000)
    val ids = spark.read.parquet(out).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L, 5L), s"admissions wrong with idCol=\"id\": $ids")
  }

  test("index scan prunes FILES by the batch's band set, not just its prefixes") {
    val idx = Files.createTempDirectory("graft-ngate-sidx").toString
    val ckpt = Files.createTempDirectory("graft-ngate-sckpt").toString
    // force every row into ONE bp partition: craft band strings whose
    // md5 shares the first two hex chars (bp is md5-derived, so the
    // only control is search)
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val samePrefix = Iterator.from(0).map(i => s"synband-$i")
      .filter(b => md5hex(b).startsWith("aa")).take(120).toSeq
    val rows = samePrefix.zipWithIndex.map { case (b, i) =>
      (b, i.toLong, Seq(s"w$i", s"x$i", s"y$i"), "aa")
    }
    BatchCommits.publishBatch(
      rows.toDF("band", "id", "sset", "bp"), idx,
      BatchCommits.scopeFor(ckpt), 0L, Seq("bp"))
    // range-sorted compaction: several files under bp=aa, each a tight
    // band interval
    StreamingNearDupGate.compactIndex(spark, idx, targetFiles = 8)
    val prefixFiles = new java.io.File(s"$idx/bp=aa").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(prefixFiles >= 4,
      s"range compaction should split bp=aa into several files: $prefixFiles")
    // a one-band batch: prefix pruning alone keeps ALL bp=aa files; the
    // batch-band file prune must open only the file(s) whose
    // [min band, max band] interval contains that band
    val probe = samePrefix.head
    val kept = StreamingNearDupGate.statsPrunedIndexFiles(
      spark, idx, Seq((probe, "aa")))
    assert(kept.nonEmpty && kept.size < prefixFiles,
      s"file pruning must beat prefix pruning: kept ${kept.size} of $prefixFiles")
    // exactness through the pruned read: an arriving doc sharing the
    // probe band with an identical shingle set is flagged, a stranger
    // band is not
    val arriving = Seq(
      (probe, 9001L, Seq("w0", "x0", "y0"), "aa"),
      ("unseen-band", 9002L, Seq("zz"), md5hex("unseen-band").take(2)))
      .toDF("band", "id", "sset", "bp")
    val dups = StreamingNearDupGate.crossBatchDupIds(
      spark, arriving, idx, 0.7, 1000)
      .select("__dup_id").as[Long].collect().toSet
    assert(dups == Set(9001L),
      s"stats-pruned candidate join must stay exact: $dups")
  }

  test("crash window: replay after the output marker re-derives the index from published docs") {
    val idx = Files.createTempDirectory("graft-ngate-cidx").toString
    val out = Files.createTempDirectory("graft-ngate-cout").toString
    val ckpt = Files.createTempDirectory("graft-ngate-cckpt").toString
    val scope = BatchCommits.scopeFor(ckpt)
    val batch = Seq((1L, near1), (2L, other)).toDF("doc_id", "text")

    // simulate: output published + out marker, index publish crashed
    BatchCommits.publishBatch(batch, out, scope, 0L)
    BatchCommits.createMarker(spark, ckpt, "graft_out_commits", 0L)
    StreamingNearDupGate.processBatch(batch, 0L, "doc_id", "text",
      idx, out, ckpt, 1, 16, 4, 4, 0.7, 1000)
    assert(spark.read.parquet(out).count() == 2, "recovery must not touch the output")
    val ids = spark.read.parquet(idx).select("id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L), s"recovery must complete the index: $ids")

    // a near-dup of doc 1 in the next batch is dropped against that index
    StreamingNearDupGate.processBatch(
      Seq((9L, near2)).toDF("doc_id", "text"), 1L, "doc_id", "text",
      idx, out, ckpt, 1, 16, 4, 4, 0.7, 1000)
    assert(spark.read.parquet(out).count() == 2, "recovered index must gate the next batch")
  }
}
