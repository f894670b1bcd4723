package graft.streaming

import graft.operators.{Contamination, Dedup, IndexStore, Packing}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The streaming gates composed into ONE ingest-time function chain —
  * the A20 fold applied to curation, and the streaming twin of the
  * batch capstones' verified handoffs (q100/q107):
  *
  *   arriving docs → exact dedup (durable hash index)
  *                 → near-dup drop (durable band index)
  *                 → semantic drop (OPTIONAL [[SemanticStage]]: fixed
  *                   Lloyd codebook + durable cell index — the
  *                   [[StreamingSemanticGate]] semantics folded into
  *                   this chain's single commit)
  *                 → decontamination drop (prebuilt eval fingerprint
  *                   index — the q109 ACTION semantics: offending
  *                   arrivals are dropped, not just recorded)
  *                 → sequence packing (durable high-water mark)
  *
  * all inside a single `foreachBatch`, batch-commit-scoped END TO END:
  * one output publish, one pair of exactly-once markers for the whole
  * chain — not four independently-committing gates whose crash windows
  * could interleave.
  *
  * Exactly-once across the chain (the [[StreamingDedupGate]] two-marker
  * protocol, generalized):
  *
  *  1. packed survivors → `outDir`  via [[BatchCommits.publishBatch]]
  *  2. marker `graft_out_commits/<batchId>`
  *  3. index slices → `exactIndexDir` + `bandIndexDir`, high-water
  *     mark → `hwmDir` (all idempotent scoped publishes)
  *  4. marker `graft_batch_commits/<batchId>`
  *
  * The index slices are PURE FUNCTIONS OF THE BATCH — every arriving
  * doc's hash and band rows, not just the admitted ones — so the
  * recovery path between (2) and (4) simply republishes them from the
  * replayed batch, with no read-back and no dependence on partial index
  * state. Indexing dropped docs does not change any admission decision:
  * an exact duplicate shares its keeper's hash and shingle set, so any
  * later doc it would match, the keeper already matches (this is also
  * what makes admissions independent of where micro-batch boundaries
  * fall, the [[StreamingNearDupGate]] argument). A replay before (2)
  * recomputes the same survivors — neither index has any trace of the
  * batch, because slices publish only after (2) — and `publishBatch`
  * replaces partial output. The high-water-mark read is replay-immune
  * by construction (predecessor batches only, the [[StreamingPacking]]
  * design); its recovery value re-derives from the batch's own
  * committed output files.
  *
  * Contract: monotone ingest ids across batches (the near-dup +
  * packing contract) — batch N's ids all precede batch N+1's. The
  * contamination index is built once from the fixed eval side
  * ([[Contamination.buildIndex]]) and read-only here.
  *
  * ==Span excision is batch-only==
  *
  * The chain admits or drops WHOLE documents; it never rewrites
  * admitted text. Duplicated-span excision ([[graft.operators.Dedup
  * .spanExcision]], the q116/q118 ExactSubstr stage) therefore has no
  * streaming stage here, and the chain's output equals the batch
  * curation chain WITHOUT excision (q112's shape, spec-pinned) — a
  * corpus whose documents share long spans passes through with those
  * spans intact. A streaming approximation is constructible (a durable
  * span-hash index; monotone ids make arrival order the canonical
  * min-(id, pos) order), but it gives up three things the batch run
  * keeps: (a) durable state per document grows from one hash row
  * (exact) / `bands` rows (near-dup) to ~L overlapping span rows — two
  * to three orders more index republished inside every exactly-once
  * window; (b) published bytes become a function of arrival history —
  * any resharding or backfill that moves a batch boundary rewrites
  * text retroactively, which the append-only publish model cannot
  * express; (c) downstream gates (near-dup shingles, decontamination
  * fingerprints) would consume rewritten text, coupling their index
  * contents to excision decisions. Corpora that need span-level
  * excision run the batch chain (q118) over the landed output instead.
  */
object StreamingCurationChain {

  private val OutCommits = "graft_out_commits"
  private val Commits = "graft_batch_commits"

  /** Chain knobs: exact-index prefix length; the [[Dedup.minhashLsh]]
    * near-dup family; the [[Contamination]] winnowing family.
    * `minShared`/`k`/`w`/`rollingHash` must ALL match the
    * [[Contamination.buildIndex]] call that produced `contamIndexDir` —
    * a hash-family mismatch (rollingHash here vs the build) would share
    * zero fingerprints and silently admit every contaminated doc. */
  final case class Params(
      prefixLen: Int = 2,
      shingleK: Int = 1,
      numHashes: Int = 16,
      bands: Int = 4,
      rows: Int = 4,
      threshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      minShared: Int = 2,
      k: Int = 8,
      w: Int = 4,
      rollingHash: Boolean = false,
      minTokens: Int = 0,
      repetitionFilter: Boolean = false,
      probeModel: Seq[Long] = Seq.empty,
      probeMinScoreMicro: Long = 0L) {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    require(prefixLen >= 1 && prefixLen <= 8, "prefixLen in [1, 8]")
    require(minTokens >= 0, "minTokens must be >= 0")
    require(probeModel.isEmpty || probeModel.length >= 3,
      "probeModel must be TextAnalysis.linearProbeTrain output")
  }

  /** Optional SEMANTIC stage ([[StreamingSemanticGate]] folded into the
    * chain's single two-marker commit): arriving docs carrying `vecCol`
    * are cell-assigned by the FIXED `centroids` codebook and dropped
    * when within `threshold` cosine of any earlier-id same-cell doc —
    * in the batch or in the durable `indexDir`. The gate's codebook
    * fingerprint discipline applies unchanged (`_graft_codebook`
    * stamped on first publish, verified every batch).
    *
    * The semantic index slice — like the exact and band slices — is a
    * pure function of the quality-filtered batch (EVERY doc's cell row,
    * admitted or dropped), so recovery republishes it with no read-back,
    * and each gate's decisions stay independent of the other gates'
    * drops and of where micro-batch boundaries fall: the chain's
    * admitted set is the INTERSECTION of the four gates' standalone
    * admitted sets over the union of arrivals (spec-pinned).
    *
    * That equivalence inherits the chain's monotone-id contract (batch
    * N's ids all precede batch N+1's — the near-dup/packing contract
    * documented on the object): the cross-batch check drops an arrival
    * against ANY seen same-cell doc, which equals the batch operator's
    * smaller-id-wins rule only when earlier batches' ids really are
    * smaller. Feed out-of-order ids and the chain may keep the earlier
    * ARRIVAL where batch [[graft.operators.Dedup.semDedupWith]] keeps
    * the smaller ID. */
  final case class SemanticStage(
      vecCol: String,
      centroids: Seq[(Long, Array[Double])],
      indexDir: String,
      threshold: Double,
      maxCellSize: Int = 100000) {
    require(centroids.nonEmpty, "codebook must be non-empty")
    require(threshold > 0 && threshold <= 1, s"threshold $threshold out of (0,1]")
  }

  /** Stage 0 — the q96/q127 quality funnel (length floor + Gopher
    * repetition flags), applied BEFORE any hashing or indexing: junk is
    * neither admitted nor INDEXED, exactly like the batch recipe where
    * a filtered doc never becomes a dedup keeper. Safe for
    * batch-boundary independence precisely because the filter is a
    * deterministic per-row function of the text — a doc filtered in one
    * batching is filtered in every batching. Off by default
    * (`minTokens = 0`, `repetitionFilter = false` passes everything
    * through untouched, the pre-round-10 behavior). */
  private[streaming] def qualityFiltered(batch: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame = {
    // LEARNED quality stage (the q167 probe, frozen): a pure
    // shuffle-free filter column — the weights are plan literals, so
    // this adds zero joins and zero state to the gate. Train offline
    // with TextAnalysis.linearProbeTrain, enforce here at ingest.
    // No-token docs drop when the probe is on (the score is undefined
    // on them — training never saw one).
    val probed =
      if (p.probeModel.isEmpty) batch
      else {
        val t = graft.functions.TextFunctions.tokens(col(textCol))
        batch.filter(size(t) > 0 &&
          graft.operators.TextAnalysis.linearProbeScoreCol(
            t, p.probeModel.toIndexedSeq) >= lit(p.probeMinScoreMicro))
      }
    if (p.minTokens == 0 && !p.repetitionFilter) probed
    else {
      // metrics on a projected (id, text) frame, then a semi-join back:
      // the batch may itself carry an n_tokens column (the packing
      // contract), which repetition's metric column would shadow
      val keepIds = graft.operators.TextAnalysis
        .repetition(probed.select(col(idCol), col(textCol)), idCol, textCol)
        .filter(col("n_tokens") >= p.minTokens &&
          (if (p.repetitionFilter) col("flagged") === 0 else lit(true)))
        .select(col(idCol).as("__q_keep"))
      probed.join(keepIds, col(idCol) === col("__q_keep"), "left_semi")
    }
  }

  /** The batch's exact-index slice: every arriving doc's content hash,
    * distinct, prefix-partitioned — a pure function of the batch. */
  private[streaming] def exactSlice(batch: DataFrame, textCol: String,
      prefixLen: Int): DataFrame =
    batch.select(Dedup.contentKey(col(textCol)).as("h")).distinct()
      .withColumn("hp", substring(col("h"), 1, prefixLen))

  /** The batch's band-index slice: every arriving doc's band rows — a
    * pure function of the batch. */
  private[streaming] def bandSlice(batch: DataFrame, idCol: String,
      textCol: String, p: Params): DataFrame =
    StreamingNearDupGate.bandRows(batch, idCol, textCol,
      p.shingleK, p.numHashes, p.bands, p.rows)

  private def publishMark(spark: SparkSession, hwmDir: String, scope: String,
      batchId: Long, endOffset: Long): Unit =
    BatchCommits.publishBatch(
      spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(scope, batchId, endOffset)),
        StreamingPacking.hwmSchema),
      hwmDir, scope, batchId)

  /** One batch through the whole chain — the foreachBatch body, factored
    * out so specs can drive individual crash windows. */
  private[streaming] def processBatch(rawBatch: DataFrame, batchId: Long,
      idCol: String, textCol: String, nTokensCol: String, capacity: Long,
      exactIndexDir: String, bandIndexDir: String, contamIndex: DataFrame,
      outDir: String, hwmDir: String, checkpoint: String, p: Params,
      semantic: Option[SemanticStage] = None): Unit = {
    val spark = rawBatch.sparkSession
    // stage 0 first, on BOTH the live and the recovery path: every
    // downstream artifact (admissions AND index slices) is a pure
    // function of the FILTERED batch, so junk never blocks a later doc
    val batch = qualityFiltered(rawBatch, idCol, textCol, p)
    val scope = BatchCommits.scopeFor(checkpoint)
    if (BatchCommits.markerExists(spark, checkpoint, Commits, batchId)) return
    val (exactFs, _) = BatchCommits.fileSystem(spark, exactIndexDir)
    StreamingDedupGate.checkPrefixLen(exactFs, exactIndexDir, p.prefixLen)
    semantic.foreach { ss =>
      val (semFs, _) = BatchCommits.fileSystem(spark, ss.indexDir)
      StreamingSemanticGate.checkCodebook(semFs, ss.indexDir, ss.centroids)
    }
    if (BatchCommits.markerExists(spark, checkpoint, OutCommits, batchId)) {
      // recovery: output committed, index/mark publishes may be partial.
      // Slices are pure functions of the replayed batch — republish;
      // the mark's end offset re-derives from the committed output.
      BatchCommits.publishBatch(exactSlice(batch, textCol, p.prefixLen),
        exactIndexDir, scope, batchId, Seq("hp"))
      BatchCommits.publishBatch(bandSlice(batch, idCol, textCol, p),
        bandIndexDir, scope, batchId, Seq("bp"))
      semantic.foreach { ss =>
        BatchCommits.publishBatch(
          StreamingSemanticGate.cellRows(batch, idCol, ss.vecCol, ss.centroids),
          ss.indexDir, scope, batchId, Seq("cell"))
      }
      val files = BatchCommits.publishedFiles(spark, outDir, scope, batchId)
      val total =
        if (files.isEmpty) 0L
        else {
          val r = spark.read.parquet(files.map(_.toString): _*)
            .agg(sum(col("n_tokens"))).first()
          if (r.isNullAt(0)) 0L else r.getLong(0)
        }
      val start = StreamingPacking.highWaterMark(spark, hwmDir, scope, batchId)
      publishMark(spark, hwmDir, scope, batchId, start + total)
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
      return
    }

    // ---- stage 1: exact dedup (the StreamingDedupGate anti-join) ----
    // `hashed` is cached: it feeds both the admission chain and the
    // exact-index slice publish, and md5-over-text is a real per-batch
    // cost — one computation, two consumers
    val hashed = batch.withColumn("__h", Dedup.contentKey(col(textCol)))
      .cache()
    // the batch's full band rows likewise feed both the candidate join
    // (survivors' subset) and the band-index slice publish — minhash
    // signatures are the dominant per-batch CPU cost, computed ONCE here
    val allBands = bandSlice(batch, idCol, textCol, p).cache()
    try {
      val keepers = hashed.groupBy(col("__h"))
        .agg(min(col(idCol)).as("__keep_id"))
      val inBatchExact = hashed.join(keepers,
          hashed("__h") === keepers("__h") && col(idCol) === col("__keep_id"))
        .drop(keepers("__h")).drop("__keep_id")
        .withColumn("hp", substring(col("__h"), 1, p.prefixLen))
      val s1 = {
        val prefixes = inBatchExact.select(col("hp")).distinct()
          .collect().map(_.getString(0)).toSeq
        val seen = StreamingDedupGate.prunedIndex(spark, exactIndexDir, prefixes)
        inBatchExact.join(seen, inBatchExact("__h") === seen("h"), "left_anti")
          .drop("__h", "hp")
      }.cache()
      try {
        // ---- stage 2: near-dup drop (the StreamingNearDupGate shapes) ----
        val inPairs = Dedup.minhashLsh(s1, idCol, textCol,
          shingleK = p.shingleK, numHashes = p.numHashes, bands = p.bands,
          rows = p.rows, threshold = p.threshold,
          maxBucketSize = p.maxBucketSize, index = IndexStore.NoStore)
        val s1k = s1.join(inPairs.select(col("id_b").as("__drop")).distinct(),
          col(idCol).cast("long") === col("__drop"), "left_anti")
        // survivors' band rows = semi-join into the cached full set (no
        // second shingle/signature pass)
        val arr = allBands.join(
          s1k.select(col(idCol).cast("long").as("id")), Seq("id"), "left_semi")
        val dupIds = StreamingNearDupGate.crossBatchDupIds(spark, arr,
          bandIndexDir, p.threshold, p.maxBucketSize)
        val s2 = s1k.join(dupIds,
          col(idCol).cast("long") === col("__dup_id"), "left_anti")

        // ---- stage 2b (optional): semantic drop against the fixed
        // codebook — in-batch rule over the FULL filtered batch plus the
        // durable cell index, so the semantic decision is independent of
        // the other gates' drops and of batch boundaries (a doc the
        // exact gate dropped still blocks its semantic twins, exactly as
        // it blocks their shingle bands) ----
        val semCells = semantic.map { ss =>
          StreamingSemanticGate.cellRows(batch, idCol, ss.vecCol, ss.centroids)
            .cache()
        }
        val s2s = (semantic, semCells) match {
          case (Some(ss), Some(cells)) =>
            val inBatchSem = Dedup.semDedupWith(batch, idCol, ss.vecCol,
                ss.centroids, ss.threshold, maxClusterSize = ss.maxCellSize,
                index = IndexStore.NoStore)
              .filter(col("kept") === 0)
              .select(col("corpus_id").cast("long").as("__sem_drop"))
            val crossSem = StreamingSemanticGate.crossBatchDupIds(spark,
                cells, ss.indexDir, ss.threshold, ss.maxCellSize)
              .select(col("__dup_id").as("__sem_drop"))
            s2.join(inBatchSem.unionByName(crossSem).distinct(),
              col(idCol).cast("long") === col("__sem_drop"), "left_anti")
          case _ => s2
        }

        // ---- stage 3: decontamination ACTION (drop offending docs) ----
        val contamIds = Contamination.checkAgainstIndex(s2s, idCol, textCol,
            contamIndex, p.minShared, p.k, p.w, rollingHash = p.rollingHash)
          .select(col("test_id").as("__contam_id"))
        val s3 = s2s.join(contamIds,
          col(idCol).cast("long") === col("__contam_id"), "left_anti")

        // ---- stage 4: sequence packing off the durable high-water mark ----
        val start = StreamingPacking.highWaterMark(spark, hwmDir, scope, batchId)
        val packed = Packing.assign(s3, idCol, nTokensCol, capacity,
          startOffset = start).cache()
        try {
          val total = {
            val r = packed.agg(sum(col("n_tokens"))).first()
            if (r.isNullAt(0)) 0L else r.getLong(0)
          }
          BatchCommits.publishBatch(packed, outDir, scope, batchId)
          BatchCommits.createMarker(spark, checkpoint, OutCommits, batchId)
          // index slices from the CACHED intermediates (the recovery path
          // re-derives the same slices from scratch — pure functions of
          // the batch either way)
          BatchCommits.publishBatch(
            hashed.select(col("__h").as("h")).distinct()
              .withColumn("hp", substring(col("h"), 1, p.prefixLen)),
            exactIndexDir, scope, batchId, Seq("hp"))
          BatchCommits.publishBatch(allBands, bandIndexDir, scope, batchId, Seq("bp"))
          (semantic, semCells) match {
            case (Some(ss), Some(cells)) =>
              BatchCommits.publishBatch(cells, ss.indexDir, scope, batchId,
                Seq("cell"))
            case _ => ()
          }
          publishMark(spark, hwmDir, scope, batchId, start + total)
          BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
        } finally { packed.unpersist(); semCells.foreach(_.unpersist()) }
      } finally s1.unpersist()
    } finally { allBands.unpersist(); hashed.unpersist() }
  }

  /** Start the chained gate over streaming `docs` (carrying `idCol`,
    * `textCol`, `nTokensCol`): packed surviving assignments append to
    * `outDir`; the exact-hash and band indexes and the packing
    * high-water mark advance in the same batch commit. `contamIndexDir`
    * is a prebuilt [[Contamination.buildIndex]] directory (`k`/`w` in
    * `params` must match the build). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      nTokensCol: String, capacity: Long,
      exactIndexDir: String, bandIndexDir: String, contamIndexDir: String,
      outDir: String, hwmDir: String, checkpoint: String,
      params: Params = Params(),
      semantic: Option[SemanticStage] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = docs.sparkSession
    // resolved once; each micro-batch re-scans the (immutable) parquet
    val contamIndex = Contamination.loadIndex(spark, contamIndexDir)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, nTokensCol, capacity,
          exactIndexDir, bandIndexDir, contamIndex, outDir, hwmDir,
          checkpoint, params, semantic)
      }
      .start()
  }
}
