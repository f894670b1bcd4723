package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.{Contamination, Dedup, IndexStore, Packing}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The chained gate (exact dedup → near-dup → decontamination → packing
  * in ONE foreachBatch) must equal the composed BATCH pipeline over the
  * union of its batches, and every crash window at a stage boundary
  * must replay to the same bytes. */
class StreamingCurationChainSpec extends SparkSpec {
  import spark.implicits._

  // deterministic-recall LSH recipe (the StreamingNearDupGateSpec one):
  // 8 bands x 2 rows at threshold 0.7 — recall ~0.999 at J≈0.8, and the
  // minhash functions are fixed, so found-or-not is stable run to run
  private val P = StreamingCurationChain.Params(
    numHashes = 16, bands = 8, rows = 2, threshold = 0.7)
  private val Cap = 50L

  private val evalText =
    "which roman emperor built the colosseum in the heart of ancient rome for gladiator games"

  private val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val nearA = "alpha beta gamma delta epsilon zeta eta theta iota lambda" // ~A, J=9/11
  private val nearA2 = "alpha beta gamma delta epsilon zeta eta theta iota mu"    // ~A and ~nearA
  private val textB = "totally unrelated prose regarding distributed query engines and storage"
  private val nearB = "totally unrelated prose regarding distributed query engines and medium" // ~B, J=8/10
  private val contam =
    s"students asked $evalText yesterday" // long shared winnowed run with the eval doc
  private val textC = "another clean document mentioning completely disjoint vocabulary items"
  private val textD = "fresh novel content unseen before in any earlier micro batch"
  private val textE = "independent sentences about machine learning evaluation strategy design"

  // ids monotone across batches (the near-dup + packing contract)
  private val batch0 = Seq(
    (1L, textA, 10L), (2L, textA, 20L), (3L, nearA, 30L),
    (4L, textB, 40L), (5L, contam, 50L), (6L, textC, 60L))
  private val batch1 = Seq(
    (7L, textA, 70L), (8L, nearB, 80L), (9L, textD, 90L),
    (10L, nearA2, 15L), (11L, textE, 25L), (12L, textD, 35L))

  private def df(rows: Seq[(Long, String, Long)]): DataFrame =
    rows.toDF("doc_id", "text", "n_tokens")

  private case class Dirs(exact: String, band: String, contam: String,
      out: String, hwm: String, ckpt: String)
  private def mkDirs(tag: String): Dirs = {
    def t(s: String) = Files.createTempDirectory(s"graft-chain-$tag-$s").toString
    val d = Dirs(t("exact"), t("band"), t("contam"), t("out"), t("hwm"), t("ckpt"))
    Contamination.buildIndex(Seq((100L, evalText)).toDF("id", "text"),
      "id", "text", d.contam, k = P.k, w = P.w)
    d
  }

  private def run(d: Dirs, batches: Seq[Seq[(Long, String, Long)]]): Unit =
    batches.zipWithIndex.foreach { case (rows, i) =>
      StreamingCurationChain.processBatch(df(rows), i.toLong,
        "doc_id", "text", "n_tokens", Cap, d.exact, d.band,
        Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, P)
    }

  private def packedRows(out: String): Set[(Long, Long, Long, Long, Long, Long)] =
    spark.read.parquet(out)
      .select("doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet

  /** The composed batch pipeline over one corpus — q100-style handoffs
    * with the exact operator semantics the chain's stages claim. */
  private def batchPipeline(rows: Seq[(Long, String, Long)], contamDir: String)
      : Set[(Long, Long, Long, Long, Long, Long)] = {
    val corpus = df(rows)
    // exact: min-id keeper per content hash
    val hashed = corpus.withColumn("__h", md5(col("text")))
    val keepers = hashed.groupBy(col("__h")).agg(min(col("doc_id")).as("__k"))
    val s1 = hashed.join(keepers,
        hashed("__h") === keepers("__h") && col("doc_id") === col("__k"))
      .drop(keepers("__h")).drop("__h", "__k")
    // near-dup: pairwise-against-history — id_b of any verified pair drops
    val pairs = Dedup.minhashLsh(s1, "doc_id", "text",
      shingleK = P.shingleK, numHashes = P.numHashes, bands = P.bands,
      rows = P.rows, threshold = P.threshold,
      maxBucketSize = P.maxBucketSize, index = IndexStore.NoStore)
    val s2 = s1.join(pairs.select(col("id_b").as("__d")).distinct(),
      col("doc_id") === col("__d"), "left_anti")
    // decontamination ACTION: offending docs drop
    val hits = Contamination.checkAgainstIndex(s2, "doc_id", "text",
        Contamination.loadIndex(spark, contamDir), P.minShared, P.k, P.w)
      .select(col("test_id").as("__c"))
    val s3 = s2.join(hits, col("doc_id") === col("__c"), "left_anti")
    Packing.assign(s3, "doc_id", "n_tokens", Cap, startOffset = 0L)
      .select("doc_id", "n_tokens", "tok_offset", "seq_id", "seq_offset", "seq_last")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
  }

  test("optional semantic stage: chain == text gates ∩ batch semDedup over the union") {
    val d = mkDirs("sem")
    val semDir = Files.createTempDirectory("graft-chain-sem-idx").toString
    val centroids = Seq(
      0L -> Array(1.0, 0.0, 0.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0))
    // cell-0 docs lean on axis 0, cell-1 docs on axis 1; within a cell
    // every doc rides its own distinct axis (pairwise cos 0.36) EXCEPT
    // the two intended semantic pairs: 9~3 (3 is near-dup-DROPPED — a
    // dropped doc must still block) and 11~6 (6 is admitted), plus 7≡1
    // (exact text dup carries the identical embedding)
    val emb: Map[Long, Seq[Double]] = Map(
      1L -> Seq(0.6, 0.0, 0.8, 0.0, 0.0, 0.0),
      2L -> Seq(0.6, 0.0, 0.0, 0.8, 0.0, 0.0),
      3L -> Seq(0.0, 0.6, 0.8, 0.0, 0.0, 0.0),
      4L -> Seq(0.6, 0.0, 0.0, 0.0, 0.8, 0.0),
      5L -> Seq(0.0, 0.6, 0.0, 0.8, 0.0, 0.0),
      6L -> Seq(0.0, 0.6, 0.0, 0.0, 0.8, 0.0),
      7L -> Seq(0.6, 0.0, 0.8, 0.0, 0.0, 0.0),
      8L -> Seq(0.6, 0.0, 0.0, 0.0, 0.0, 0.8),
      9L -> Seq(0.0, 0.6, 0.7997, 0.02, 0.0, 0.0),
      10L -> Seq(0.6, 0.0, 0.5657, 0.5657, 0.0, 0.0),
      11L -> Seq(0.0, 0.6, 0.02, 0.0, 0.7997, 0.0),
      12L -> Seq(0.0, 0.6, 0.0, 0.0, 0.0, 0.8))
    def dfv(rows: Seq[(Long, String, Long)]): DataFrame =
      rows.map { case (id, t, n) => (id, t, n, emb(id)) }
        .toDF("doc_id", "text", "n_tokens", "emb")
    val ss = StreamingCurationChain.SemanticStage(
      "emb", centroids, semDir, threshold = 0.95)
    Seq(batch0, batch1).zipWithIndex.foreach { case (rows, i) =>
      StreamingCurationChain.processBatch(dfv(rows), i.toLong, "doc_id",
        "text", "n_tokens", Cap, d.exact, d.band,
        Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, P,
        Some(ss))
    }
    val streamed = packedRows(d.out).map(_._1)
    // the contract: admitted = text-gate pipeline ∩ batch semDedupWith
    // kept set, both over the UNION of arrivals
    val textSurvivors = batchPipeline(batch0 ++ batch1, d.contam).map(_._1)
    val semKept = Dedup.semDedupWith(dfv(batch0 ++ batch1), "doc_id", "emb",
        centroids, 0.95, maxClusterSize = 100000, index = IndexStore.NoStore)
      .filter(col("kept") === 1).select(col("corpus_id"))
      .as[Long].collect().toSet
    assert(streamed == (textSurvivors intersect semKept),
      s"chain=$streamed text=$textSurvivors sem=$semKept")
    // hand-check: 9 dropped via the near-dup-DROPPED 3, 11 via the
    // admitted 6 — the text gates alone would have admitted both
    assert(streamed == Set(1L, 4L, 6L))
    // the semantic cell index holds EVERY seen doc's row (pure function
    // of the batch, like the exact and band slices)
    val semIds = spark.read.parquet(semDir).select("id").as[Long].collect().toSet
    assert(semIds == (batch0 ++ batch1).map(_._1).toSet,
      s"semantic index must hold every seen doc: $semIds")
    // replay after the final marker is a no-op (chain-level idempotence
    // with the semantic stage wired in)
    val before = packedRows(d.out)
    StreamingCurationChain.processBatch(dfv(batch1), 1L, "doc_id", "text",
      "n_tokens", Cap, d.exact, d.band,
      Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, P,
      Some(ss))
    assert(packedRows(d.out) == before)
  }

  test("semantic stage crash window: lost cell slice recovers; gating continues") {
    val d = mkDirs("semcrash")
    val semDir = Files.createTempDirectory("graft-chain-semcrash-idx").toString
    val centroids = Seq(
      0L -> Array(1.0, 0.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0, 0.0))
    // distinct axes (pairwise cos 0.36 in-cell); doc 13 (batch 2) is a
    // semantic twin of batch-0's doc 4 — the cross-batch drop to verify
    val emb: Map[Long, Seq[Double]] = Map(
      1L -> Seq(0.6, 0.0, 0.8, 0.0), 2L -> Seq(0.6, 0.0, 0.0, 0.8),
      3L -> Seq(0.0, 0.6, 0.8, 0.0), 4L -> Seq(0.6, 0.0, -0.8, 0.0),
      5L -> Seq(0.0, 0.6, 0.0, 0.8), 6L -> Seq(0.0, 0.6, -0.8, 0.0),
      7L -> Seq(0.6, 0.0, 0.8, 0.0), 8L -> Seq(0.6, 0.0, 0.4, 0.69),
      9L -> Seq(0.0, 0.6, 0.4, 0.69), 10L -> Seq(0.6, 0.0, -0.4, 0.69),
      11L -> Seq(0.0, 0.6, -0.4, 0.69), 12L -> Seq(0.0, 0.6, 0.69, 0.4),
      13L -> Seq(0.6, 0.0, -0.7997, 0.02),
      16L -> Seq(0.6, 0.0, 0.02, -0.7997))
    def dfv(rows: Seq[(Long, String, Long)]): org.apache.spark.sql.DataFrame =
      rows.map { case (id, t, n) => (id, t, n, emb(id)) }
        .toDF("doc_id", "text", "n_tokens", "emb")
    val ss = StreamingCurationChain.SemanticStage(
      "emb", centroids, semDir, threshold = 0.95)
    def runSem(dd: Dirs, batches: Seq[Seq[(Long, String, Long)]]): Unit =
      batches.zipWithIndex.foreach { case (rows, i) =>
        StreamingCurationChain.processBatch(dfv(rows), i.toLong, "doc_id",
          "text", "n_tokens", Cap, dd.exact, dd.band,
          Contamination.loadIndex(spark, dd.contam), dd.out, dd.hwm, dd.ckpt,
          P, Some(ss))
      }
    runSem(d, Seq(batch0, batch1))
    val expected = packedRows(d.out)
    // crash after the out marker: batch-1's SEMANTIC slice and final
    // marker lost — the recovery path must republish the cell rows
    val scope = BatchCommits.scopeFor(d.ckpt)
    val (fs, _) = BatchCommits.fileSystem(spark, d.ckpt)
    fs.delete(new org.apache.hadoop.fs.Path(d.ckpt, "graft_batch_commits/1"), false)
    BatchCommits.publishedFiles(spark, semDir, scope, 1L)
      .foreach(f => fs.delete(f, false))
    runSem(d, Seq(batch0, batch1))
    assert(packedRows(d.out) == expected,
      "semantic-stage recovery must not touch committed output")
    val semIds = spark.read.parquet(semDir).select("id").as[Long].collect().toSet
    assert(semIds == (batch0 ++ batch1).map(_._1).toSet,
      s"recovery must restore the full cell slice: $semIds")
    // the recovered index keeps gating: 13 semantically duplicates the
    // ADMITTED doc 4 across batches and drops; 16 is novel and admits
    val batch2 = Seq(
      (13L, "entirely novel words that no earlier document used at all", 9L),
      (16L, "yet another batch of wholly fresh closing vocabulary", 7L))
    StreamingCurationChain.processBatch(dfv(batch2), 2L, "doc_id", "text",
      "n_tokens", Cap, d.exact, d.band,
      Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, P,
      Some(ss))
    val ids = packedRows(d.out).map(_._1)
    assert(ids == expected.map(_._1) + 16L,
      s"cross-batch semantic gating after recovery failed: $ids")
  }

  test("two batches through the chain == the composed batch pipeline over the union") {
    val d = mkDirs("equiv")
    run(d, Seq(batch0, batch1))
    val streamed = packedRows(d.out)
    val batch = batchPipeline(batch0 ++ batch1, d.contam)
    assert(streamed == batch,
      s"chain != batch union:\n stream=$streamed\n batch=$batch")
    // semantics sanity: exact dups (2,7,12), near-dups (3,8,10 — 10
    // against the DROPPED 3, pairwise-against-history), contamination
    // (5) all gone; survivors packed contiguously in id order
    assert(streamed.map(_._1) == Set(1L, 4L, 6L, 9L, 11L))
    val byId = streamed.toSeq.sortBy(_._1)
    assert(byId.map(_._3) == byId.map(_._2).scanLeft(0L)(_ + _).dropRight(1),
      "token offsets must be the running prefix sum in id order")
    // both indexes hold EVERY seen doc's slice (pure function of batch)
    assert(spark.read.parquet(d.exact).select("h").distinct().count() ==
      (batch0 ++ batch1).map(_._2).distinct.size)
    val bandIds = spark.read.parquet(d.band).select("id").as[Long].collect().toSet
    assert(bandIds == (batch0 ++ batch1).map(_._1).toSet,
      s"band index must hold every seen doc: $bandIds")
  }

  test("quality stage 0: junk is neither admitted nor indexed; chain == filtered batch pipeline") {
    val pq = P.copy(minTokens = 5, repetitionFilter = true)
    val junkShort = "tiny doc"                                     // < 5 tokens
    val junkSpam = Seq.fill(30)("buy now").mkString(" ")           // repetition-flagged
    val b0 = batch0 ++ Seq((50L, junkShort, 2L), (51L, junkSpam, 60L))
    val b1 = batch1 :+ ((52L, junkSpam, 60L)) // junk twin in a later batch
    val d = mkDirs("quality")
    Seq(b0, b1).zipWithIndex.foreach { case (rows, i) =>
      StreamingCurationChain.processBatch(df(rows), i.toLong,
        "doc_id", "text", "n_tokens", Cap, d.exact, d.band,
        Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, pq)
    }
    val streamed = packedRows(d.out)
    // reference = the q127 ordering: filter first, then the batch pipeline
    val union = b0 ++ b1
    val kept = union.filterNot { case (_, t, _) =>
      t == junkShort || t == junkSpam }
    assert(streamed == batchPipeline(kept, d.contam),
      "chain with quality stage must equal filter-then-batch-pipeline")
    assert(!streamed.map(_._1).exists(Set(50L, 51L, 52L)),
      s"junk must never be admitted: ${streamed.map(_._1)}")
    // junk is not INDEXED either — the batch recipe where a filtered doc
    // never becomes a dedup keeper (and can't block later documents)
    val hs = spark.read.parquet(d.exact).select("h").as[String].collect().toSet
    val junkHashes = Seq(junkShort, junkSpam).map(t =>
      Seq(t).toDF("text").select(md5(col("text"))).as[String].head()).toSet
    assert(hs.intersect(junkHashes).isEmpty, "junk hashes must not reach the index")
    val bandIds = spark.read.parquet(d.band).select("id").as[Long].collect().toSet
    assert(bandIds.intersect(Set(50L, 51L, 52L)).isEmpty,
      "junk band rows must not reach the index")
  }

  test("learned-probe quality stage: frozen model gates at ingest; chain == filter-then-batch") {
    // train the q167-style probe on a crafted corpus: stopword-dense
    // docs are the positive class
    val trainDocs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the cat of the house and the dog in the yard is that it for w" + i)
      else (i.toLong, s"quantum flux capacitor $i spectral manifold tensor gradient warp")
    }.toDF("doc_id", "text")
    val label = when(col("doc_id") % 2 === 0, lit(1000000L)).otherwise(lit(0L))
    val model = graft.operators.TextAnalysis.linearProbeTrain(
      trainDocs, "text", label, nBuckets = 64, steps = 8, lrShift = 4)
    // threshold between the two classes' scores on the training corpus
    val scores = graft.operators.TextAnalysis
      .linearProbeScore(trainDocs, "doc_id", "text", model)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val thr = ((0 until 40 by 2).map(i => scores(i.toLong)).min +
      (1 until 40 by 2).map(i => scores(i.toLong)).max) / 2
    val pq = P.copy(probeModel = model, probeMinScoreMicro = thr)
    // batch0/batch1 prose scores BELOW the stopword-dense threshold?
    // craft instead: junk = content-only jargon doc, good = the
    // stopword-dense register the probe was trained to pass
    val good1 = "the cat of the house and the dog in the yard is that it for sure"
    val good2 = "it is the case that for the most part the house and the yard stand"
    val junk = "quantum flux capacitor spectral manifold tensor gradient warp nine"
    val b0 = Seq((1L, good1, 10L), (2L, junk, 20L), (3L, good2, 30L))
    val b1 = Seq((4L, junk, 40L), (5L, good1, 50L)) // junk twin + exact dup of 1
    val d = mkDirs("probe")
    Seq(b0, b1).zipWithIndex.foreach { case (rows, i) =>
      StreamingCurationChain.processBatch(df(rows), i.toLong,
        "doc_id", "text", "n_tokens", Cap, d.exact, d.band,
        Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, pq)
    }
    val streamed = packedRows(d.out)
    val kept = (b0 ++ b1).filterNot(_._2 == junk)
    assert(streamed == batchPipeline(kept, d.contam),
      "chain with the probe stage must equal filter-then-batch-pipeline")
    val ids = streamed.map(_._1)
    assert(!ids.exists(Set(2L, 4L)), s"low-score docs must never admit: $ids")
    assert(ids.contains(1L) && ids.contains(3L), s"high-score docs must admit: $ids")
    // the probe gate is index-coherent too: junk never becomes a keeper
    val bandIds = spark.read.parquet(d.band).select("id").as[Long].collect().toSet
    assert(bandIds.intersect(Set(2L, 4L)).isEmpty,
      "probe-dropped docs must not reach the band index")
  }

  test("rollingHash chain knob matches a rolling-hash-built contamination index") {
    // same hash family on BOTH sides — a mismatch shares zero
    // fingerprints and would silently admit the contaminated doc
    val d = mkDirs("roll")
    Contamination.buildIndex(Seq((100L, evalText)).toDF("id", "text"),
      "id", "text", d.contam, k = P.k, w = P.w, rollingHash = true)
    val pRoll = P.copy(rollingHash = true)
    StreamingCurationChain.processBatch(df(batch0), 0L,
      "doc_id", "text", "n_tokens", Cap, d.exact, d.band,
      Contamination.loadIndex(spark, d.contam), d.out, d.hwm, d.ckpt, pRoll)
    val ids = packedRows(d.out).map(_._1)
    assert(!ids.contains(5L), s"contaminated doc must drop under rollingHash: $ids")
    assert(ids.contains(6L), s"clean doc must survive: $ids")
  }

  test("crash windows at every stage boundary replay to the same bytes") {
    // reference: a clean two-batch run
    val ref = mkDirs("ref")
    run(ref, Seq(batch0, batch1))
    val expected = packedRows(ref.out)
    val expectedHwm = spark.read.parquet(ref.hwm)
      .select("batch_id", "end_offset").as[(Long, Long)].collect().toSet

    // window 1 — crash mid-output-publish (before the out marker):
    // partial batch-1 files exist, no markers, no index slices
    val w1 = mkDirs("w1")
    run(w1, Seq(batch0))
    val scope1 = BatchCommits.scopeFor(w1.ckpt)
    BatchCommits.publishBatch(
      df(batch1.take(2)).withColumn("tok_offset", lit(999L))
        .withColumn("seq_id", lit(999L)).withColumn("seq_offset", lit(999L))
        .withColumn("seq_last", lit(999L)).drop("text"),
      w1.out, scope1, 1L)
    run(w1, Seq(batch0, batch1)) // batch0 skips via marker; batch1 replays
    assert(packedRows(w1.out) == expected,
      "a replay must REPLACE the crashed batch's partial output")

    // window 2 — crash after the out marker with PARTIAL index/mark
    // publishes: band slice and high-water mark lost, exact slice kept
    val w2 = mkDirs("w2")
    run(w2, Seq(batch0, batch1))
    val scope2 = BatchCommits.scopeFor(w2.ckpt)
    val (fs, _) = BatchCommits.fileSystem(spark, w2.ckpt)
    fs.delete(new org.apache.hadoop.fs.Path(w2.ckpt, "graft_batch_commits/1"), false)
    BatchCommits.publishedFiles(spark, w2.band, scope2, 1L)
      .foreach(f => fs.delete(f, false))
    BatchCommits.publishedFiles(spark, w2.hwm, scope2, 1L)
      .foreach(f => fs.delete(f, false))
    run(w2, Seq(batch0, batch1)) // recovery path: republish slices + mark
    assert(packedRows(w2.out) == expected, "recovery must not touch committed output")
    val bandIds2 = spark.read.parquet(w2.band).select("id").as[Long].collect().toSet
    assert(bandIds2 == (batch0 ++ batch1).map(_._1).toSet,
      s"recovery must restore the full band slice: $bandIds2")
    assert(spark.read.parquet(w2.hwm).select("batch_id", "end_offset")
      .as[(Long, Long)].collect().toSet == expectedHwm,
      "recovery must restore the high-water mark from committed output")

    // window 3 — replay after the final marker is a pure no-op
    val before = fs.listStatus(new org.apache.hadoop.fs.Path(w2.out))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    run(w2, Seq(batch0, batch1))
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(w2.out))
      .map(s => (s.getPath.getName, s.getModificationTime)).toSet
    assert(after == before, "a committed batch must not be reprocessed")

    // and the recovered indexes keep gating: batch 2 sees exact dups,
    // near-dups of DROPPED docs, and fresh contamination — offsets
    // continue from the recovered high-water mark
    val batch2 = Seq((13L, textD, 11L), (14L, nearA2, 12L), (15L, contam, 13L),
      (16L, "wholly new closing words never used previously anywhere", 14L))
    StreamingCurationChain.processBatch(df(batch2), 2L,
      "doc_id", "text", "n_tokens", Cap, w2.exact, w2.band,
      Contamination.loadIndex(spark, w2.contam), w2.out, w2.hwm, w2.ckpt, P)
    val all = packedRows(w2.out)
    assert(all.map(_._1) == expected.map(_._1) + 16L,
      s"post-recovery gating failed: ${all.map(_._1)}")
    val t16 = all.find(_._1 == 16L).get._3
    val prevTotal = expected.toSeq.map(_._2).sum
    assert(t16 == prevTotal,
      s"batch-2 offsets must continue the recovered stream: $t16 != $prevTotal")
  }

  test("span excision is batch-only: duplicated spans pass through the chain intact") {
    // two otherwise-distinct docs sharing a 16-token span: not exact
    // dups, not near-dups (J = 16/48 < 0.7), not contaminated — the
    // chain admits both with their text unrewritten, and its output
    // equals the batch pipeline WITHOUT excision (the scaladoc
    // contract, stated rather than implied)
    val span = (1 to 16).map(i => f"shared$i%02d").mkString(" ")
    val headA = (1 to 16).map(i => f"alpha$i%02d").mkString(" ")
    val tailB = (1 to 16).map(i => f"omega$i%02d").mkString(" ")
    val b0 = Seq((21L, s"$headA $span", 32L))
    val b1 = Seq((22L, s"$span $tailB", 32L))
    val d = mkDirs("span")
    run(d, Seq(b0, b1))
    val streamed = packedRows(d.out)
    assert(streamed == batchPipeline(b0 ++ b1, d.contam),
      "the chain must equal the batch pipeline WITHOUT a span-excision stage")
    assert(streamed.map(r => (r._1, r._2)) == Set((21L, 32L), (22L, 32L)),
      s"both docs must be admitted with the shared span intact: $streamed")
    // ...and the contract is "batch-only", not "unnecessary": the batch
    // stage (q118's 1b) WOULD cut the non-canonical occurrence here, so
    // a chain with excision would pack different token counts
    val ex = Dedup.spanExcision(
        df(b0 ++ b1).select(col("doc_id"), col("text")),
        "doc_id", "text", n = 16)
      .select("doc_id", "removed_tokens").as[(Long, Long)].collect().toMap
    assert(ex(21L) == 0L && ex(22L) == 16L,
      s"batch excision must cut exactly the non-canonical occurrence: $ex")
  }
}
