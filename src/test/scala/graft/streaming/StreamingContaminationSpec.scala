package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Contamination
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val passage =
    "the committee shall convene on the first monday of every month to " +
    "review all outstanding applications and publish its findings in full"

  test("ingest gate: contaminated arrivals detected across batches against a prebuilt index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = Files.createTempDirectory("graft-contam-idx").toString
    val hits = Files.createTempDirectory("graft-contam-hits").toString
    val ckpt = Files.createTempDirectory("graft-contam-ckpt").toString

    // eval/holdout corpus: doc 1 carries the passage, doc 2 does not
    val eval = Seq(
      (1L, s"unrelated preamble text here. $passage and a closing remark"),
      (2L, "entirely different content about river navigation and tides")
    ).toDF("doc_id", "text")
    val index = Contamination.buildIndex(eval, "doc_id", "text", idxDir)
    assert(index.count() > 0)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingContamination.guard(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, hits, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: one clean arrival, one that plagiarizes the passage
      mem.addData(
        (100L, "a clean training document about alpine weather patterns"),
        (101L, s"some new framing, but then: $passage verbatim"))
      q.processAllAvailable()
      val b1 = spark.read.parquet(hits)
      assert(b1.select("test_id").as[Long].collect().toSet == Set(101L))
      val row = b1.filter($"test_id" === 101L).head()
      assert(row.getAs[Long]("n_train_docs") == 1L) // matched doc 1 only
      assert(row.getAs[Long]("max_shared") >= 2L)

      // batch 2 (later arrival, same run): another contaminated doc
      mem.addData((102L, s"$passage copied wholesale"))
      q.processAllAvailable()
      val ids = spark.read.parquet(hits).select("test_id").as[Long].collect().toSet
      assert(ids == Set(101L, 102L))
    } finally q.stop()

    // restart with the same checkpoint + index: the durable index serves
    // the new run; previously committed batches are not re-emitted
    val before = spark.read.parquet(hits).count()
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingContamination.guard(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, hits, Files.createTempDirectory("graft-contam-ckpt2").toString,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem2.addData((103L, s"restart-era arrival with $passage inside"))
      q2.processAllAvailable()
      val after = spark.read.parquet(hits)
      assert(after.count() == before + 1)
      assert(after.select("test_id").as[Long].collect().toSet == Set(101L, 102L, 103L))
    } finally q2.stop()
  }

  test("df-pruned boilerplate in the index does not trigger the gate") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = Files.createTempDirectory("graft-contam-idx2").toString
    val hits = Files.createTempDirectory("graft-contam-hits2").toString
    val ckpt = Files.createTempDirectory("graft-contam-ckpt3").toString

    // the passage appears in EVERY eval doc -> boilerplate: with maxDf=2
    // its fingerprints are pruned at build time
    val eval = (1L to 3L).map(i => (i, s"doc $i header. $passage")).toDF("doc_id", "text")
    Contamination.buildIndex(eval, "doc_id", "text", idxDir, maxDf = 2)

    val mem = MemoryStream[(Long, String)]
    val q = StreamingContamination.guard(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, hits, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      mem.addData((200L, s"arrival that only shares the boilerplate: $passage"))
      q.processAllAvailable()
      // commit marker proves the batch ran; no hit rows were written
      assert(Files.exists(java.nio.file.Paths.get(ckpt, "graft_batch_commits", "0")))
      val hitCount =
        try spark.read.parquet(hits).count()
        catch { case _: org.apache.spark.sql.AnalysisException => 0L }
      assert(hitCount == 0)
    } finally q.stop()
  }

  test("bloom prefilter: identical hits to the plain gate, probe in the batch plan") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxDir = Files.createTempDirectory("graft-bloom-idx").toString
    val eval = Seq(
      (1L, s"holdout item embedding $passage within longer framing text"),
      (2L, "fully original holdout content sharing nothing with arrivals"))
      .toDF("doc_id", "text")
    Contamination.buildIndex(eval, "doc_id", "text", idxDir)

    def run(bloom: Boolean): Set[(Long, Long, Long, Long)] = {
      val hits = Files.createTempDirectory("graft-bloom-hits").toString
      val ckpt = Files.createTempDirectory("graft-bloom-ckpt").toString
      val mem = MemoryStream[(Long, String)]
      val q = StreamingContamination.guard(
        mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
        idxDir, hits, ckpt, trigger = Trigger.ProcessingTime(0),
        bloomPrefilter = bloom)
      try {
        mem.addData(
          (300L, s"contaminated arrival carrying $passage start to finish"),
          (301L, "clean arrival about glacier melt measurement methods"))
        q.processAllAvailable()
        mem.addData((302L, s"second-batch contamination: $passage again"))
        q.processAllAvailable()
        spark.read.parquet(hits)
          .select("test_id", "n_train_docs", "max_shared", "sum_shared")
          .as[(Long, Long, Long, Long)].collect().toSet
      } finally q.stop()
    }
    val plain = run(bloom = false)
    val bloomed = run(bloom = true)
    assert(bloomed == plain,
      s"bloom gate must emit identical hits: $bloomed vs $plain")
    assert(plain.map(_._1) == Set(300L, 302L))

    // the prefilter is really in the per-batch plan
    val index = Contamination.loadIndex(spark, idxDir)
    val b = Contamination.bloomOf(index)
    assert(b.nonEmpty)
    val batch = Seq((1L, "probe doc")).toDF("doc_id", "text")
    val plan = Contamination.checkAgainstIndex(batch, "doc_id", "text",
        index, bloom = b)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"))
  }
}
