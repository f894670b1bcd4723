package graft.streaming

import graft.functions.TextFunctions._
import graft.operators.{Dedup, IndexStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** Ingest-time NEAR-duplicate gate: the MinHash-LSH analogue of
  * [[StreamingDedupGate]]. Every arriving micro-batch is checked against
  * a durable BAND INDEX of everything already admitted — a document that
  * near-duplicates (exact shingle-set Jaccard ≥ threshold, LSH-bucketed
  * candidates, the [[Dedup.minhashLsh]] contract) any admitted document
  * is dropped, within a batch or years later. Where
  * [[StreamingDedup.minhashLshStream]] DETECTS pairs with capped
  * in-memory state, this gate ADMITS/DROPS against durable parquet —
  * restart-proof with zero Spark streaming state.
  *
  * Dedup semantics, precisely: a document is dropped iff it
  * near-duplicates ANY earlier-id document — admitted or dropped —
  * "earlier" meaning a smaller id in the same batch or any id from a
  * previous batch (ids must arrive monotonically across batches, the
  * [[StreamingPacking]] contract). Because the index holds every SEEN
  * document, the decision for a given corpus is INDEPENDENT of how
  * micro-batch boundaries fall — the same documents split differently
  * admit identically. This is pairwise against history, not transitive
  * closure over the final pair graph (closure needs the whole graph —
  * the batch [[graft.operators.ConnectedComponents]] job, not a gate):
  * for the chain A~B, B~C, A≁C with ids in that order, A is admitted
  * and both B and C drop (each pairs an earlier doc).
  *
  * Index/scale design (the [[StreamingDedupGate]] pattern):
  *  - rows are (band, id, sset), hive-partitioned by `bp` = the first
  *    two hex chars of md5(band); the per-batch candidate join PRUNES
  *    the index scan to the arriving bands' prefixes, and within them
  *    to the FILES whose footer [min(band), max(band)] interval
  *    contains an arriving band (effective against a
  *    [[compactIndex]]-range-sorted layout — the
  *    [[StreamingDedupGate.statsPrunedIndexFiles]] discipline);
  *  - the index stores shingle SETS because admission verifies EXACT
  *    Jaccard (same row the batch operator's signature index carries);
  *    `maxBucketSize` caps pathological stop-shingle bands on both
  *    sides of the candidate join;
  *  - commits are the two-marker exactly-once protocol with idempotent
  *    scoped publishes. The index slice is a pure function of the BATCH
  *    (all seen docs, not just admitted ones), so the recovery path
  *    after the output marker simply republishes it from the replayed
  *    batch — no read-back, no dependence on partial index state.
  */
object StreamingNearDupGate {

  private val OutCommits = "graft_out_commits"
  private val Commits = "graft_batch_commits"

  /** Largest batch band set collected driver-side for per-file index
    * pruning (a micro-batch of d docs emits d×bands keys; 200k short
    * strings ≈ a few MB). Bigger batches fall back to prefix-only
    * pruning — a batch that large touches most files anyway. */
  private val MaxBandCollect = 200000L

  private val indexSchema: StructType = StructType(Seq(
    StructField("band", StringType),
    StructField("id", LongType),
    StructField("sset", ArrayType(StringType, containsNull = false)),
    StructField("bp", StringType)))

  /** The data-file schema inside a `bp=` dir (partition value lives in
    * the path, not the file). */
  private val fileSchema: StructType = StructType(Seq(
    StructField("band", StringType),
    StructField("id", LongType),
    StructField("sset", ArrayType(StringType, containsNull = false))))

  /** (id, sset, band, bp) rows for a document batch — the same shingle /
    * signature / banding expressions as [[Dedup.minhashLsh]]. Shared
    * with [[StreamingCurationChain]]'s near-dup stage. */
  private[streaming] def bandRows(docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int, bands: Int, rows: Int): DataFrame = {
    graft.functions.MinHashSig.register(docs.sparkSession)
    docs.select(
        col(idCol).cast("long").as("id"),
        array_distinct(shingles(tokens(col(textCol)), shingleK)).as("sset"))
      .filter(size(col("sset")) > 0)
      .withColumn("sig", minhashSignature(col("sset"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .withColumn("bp", substring(md5(col("band")), 1, 2))
      .select(col("band"), col("id"), col("sset"), col("bp"))
  }

  private[streaming] def prunedIndex(spark: SparkSession, indexDir: String,
      prefixes: Seq[String]): DataFrame = {
    val (fs, p) = BatchCommits.fileSystem(spark, indexDir)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
    else
      spark.read.schema(indexSchema).parquet(indexDir)
        .filter(col("bp").isin(prefixes: _*))
  }

  /** Per-batch FILE-level index pruning, layered under the bp=
    * partition prune — the [[StreamingDedupGate.statsPrunedIndexFiles]]
    * discipline applied to the band index: within each prefix the batch
    * can touch, a file is opened only if its footer's
    * [min(band), max(band)] interval contains at least one arriving
    * band (band keys are ASCII, so String ordering == the UTF-8 order
    * parquet stats use). Against a [[compactIndex]]-range-sorted index
    * a batch of k bands opens ≈ min(k, files-per-prefix) files instead
    * of every accrued file in its prefixes. Stats missing or interval
    * overlap ⇒ scan — admission exactness never depends on pruning.
    * `batchBands` are (band, bp) pairs; empty result when the index dir
    * does not exist. */
  private[streaming] def statsPrunedIndexFiles(spark: SparkSession,
      indexDir: String, batchBands: Seq[(String, String)])
      : Seq[org.apache.hadoop.fs.Path] = {
    val (fs, p) = BatchCommits.fileSystem(spark, indexDir)
    if (!fs.exists(p)) return Seq.empty
    val conf = fs.getConf
    // listing (cheap) stays serial; the footer reads (one parquet
    // footer parse per candidate file, ~ms each) fan out across a
    // parallel collection — a steady-state batch touching hundreds of
    // candidate files pays max(footer) not sum(footer)
    val candidates = batchBands.groupBy(_._2).toSeq.flatMap { case (pre, pairs) =>
      val sorted = pairs.map(_._1).distinct.sorted
      val dir = new org.apache.hadoop.fs.Path(p, s"bp=$pre")
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map(s => (s.getPath, sorted))
    }
    def anyBandIn(sorted: Seq[String], lo: String, hi: String): Boolean = {
      // first batch band >= lo; in-range iff it is also <= hi
      var a = 0; var b = sorted.length
      while (a < b) {
        val m = (a + b) >>> 1
        if (sorted(m) < lo) a = m + 1 else b = m
      }
      a < sorted.length && sorted(a) <= hi
    }
    import scala.collection.parallel.CollectionConverters._
    candidates.par
      .filter { case (f, sorted) =>
        graft.operators.TxLogTable.stringRange(conf, f, "band") match {
          case Some((lo, hi)) => anyBandIn(sorted, lo, hi)
          case None => true // no usable stats: the file scans
        }
      }
      .map(_._1).seq
  }

  /** The stats-pruned index read: bp partition prune by the batch's
    * prefixes, then [[statsPrunedIndexFiles]] file prune by its band
    * set. Reads (band, id, sset) — all the candidate join needs. */
  private[streaming] def statsPrunedIndex(spark: SparkSession,
      indexDir: String, batchBands: Seq[(String, String)]): DataFrame = {
    val kept = statsPrunedIndexFiles(spark, indexDir, batchBands)
    if (kept.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fileSchema)
    else spark.read.schema(fileSchema).parquet(kept.map(_.toString): _*)
  }

  /** Ids among `arrivingBands` that near-duplicate any previously SEEN
    * document: candidates from shared bands in the pruned index,
    * verified with exact Jaccard, bucket-capped on the index side.
    * Returns one `__dup_id` column (reserved name — see the join-site
    * comments). Shared with [[StreamingCurationChain]]. */
  private[streaming] def crossBatchDupIds(spark: SparkSession,
      arrivingBands: DataFrame, indexDir: String, threshold: Double,
      maxBucketSize: Int): DataFrame = {
    // prune the index scan to what this batch can touch: bp prefixes
    // always; per-FILE footer-range pruning too when the batch's band
    // set fits a driver-side list (micro-batches do; the cap guards a
    // backfill-sized batch, which falls back to prefix-only pruning)
    // ONE job decides the cap AND delivers the bands: collect
    // MaxBandCollect+1 rows — a full result means the batch fits and
    // the rows ARE the band set; an overflowing one falls back to
    // prefix pruning (only then does the extra prefix job run)
    val distinctBands = arrivingBands.select(col("band"), col("bp")).distinct()
    val collected = distinctBands.limit(MaxBandCollect.toInt + 1).collect()
    // bucket cap on the index side via mergeable groupBy + join-back
    // (same de-skewed shape as Dedup.minhashLsh): a hot band in the
    // durable index folds into partial-agg cells instead of one sorted
    // window task, and only bands within the cap re-enter via the join.
    val idx =
      if (collected.length <= MaxBandCollect) {
        val bands = collected.map(r => (r.getString(0), r.getString(1))).toSeq
        statsPrunedIndex(spark, indexDir, bands)
      } else {
        val prefixes = distinctBands.select(col("bp")).distinct()
          .collect().map(_.getString(0)).toSeq
        prunedIndex(spark, indexDir, prefixes)
      }
    val keepBands = idx.groupBy(col("band"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .select(col("band"))
    val seen = idx.join(keepBands, Seq("band"))
      .select(col("band"), col("id").as("seen_id"), col("sset").as("seen_sset"))
    arrivingBands.join(seen, Seq("band"))
      .withColumn("inter", size(array_intersect(col("sset"), col("seen_sset"))))
      .filter(col("inter") / (size(col("sset")) + size(col("seen_sset")) - col("inter"))
        >= threshold)
      .select(col("id").as("__dup_id")).distinct()
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, textCol: String, indexDir: String, outDir: String,
      checkpoint: String, shingleK: Int, numHashes: Int, bands: Int,
      rows: Int, threshold: Double, maxBucketSize: Int): Unit = {
    val spark = batch.sparkSession
    val scope = BatchCommits.scopeFor(checkpoint)
    if (BatchCommits.markerExists(spark, checkpoint, Commits, batchId)) return
    if (BatchCommits.markerExists(spark, checkpoint, OutCommits, batchId)) {
      // recovery: output committed, index publish may be partial. The
      // index slice is a pure function of the replayed batch (ALL seen
      // docs), so just republish it — idempotent, state-independent.
      BatchCommits.publishBatch(
        bandRows(batch, idCol, textCol, shingleK, numHashes, bands, rows),
        indexDir, scope, batchId, Seq("bp"))
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
      return
    }
    // in-batch: id_b of every verified pair drops (id_a < id_b by the
    // minhashLsh contract — "pairs an earlier doc", admitted or not)
    val inPairs = Dedup.minhashLsh(batch, idCol, textCol,
      shingleK = shingleK, numHashes = numHashes, bands = bands, rows = rows,
      threshold = threshold, maxBucketSize = maxBucketSize,
      index = IndexStore.NoStore)
    val inBatchKept = batch.join(
      inPairs.select(col("id_b").as("__drop")).distinct(),
      col(idCol).cast("long") === col("__drop"), "left_anti")
    // cross-batch: candidates from shared bands in the pruned index of
    // every previously SEEN doc, verified with exact Jaccard. Indexing
    // all seen docs (not just admitted) is what makes the admission set
    // independent of micro-batch boundaries: an in-batch drop against a
    // dropped doc and a cross-batch drop against the same doc agree.
    val arrivingAll = bandRows(batch, idCol, textCol,
      shingleK, numHashes, bands, rows).cache()
    try {
      val dupIds = crossBatchDupIds(spark, arrivingAll, indexDir,
        threshold, maxBucketSize)
      // reserved name (the __drop pattern above): an unqualified
      // col(idCol) against dupIds("id") is ambiguous at analysis when
      // the caller's id column is itself named "id" (dupIds is
      // lineage-derived from the same batch)
      val admitted = inBatchKept.join(dupIds,
        col(idCol).cast("long") === col("__dup_id"), "left_anti")
      BatchCommits.publishBatch(admitted, outDir, scope, batchId)
      BatchCommits.createMarker(spark, checkpoint, OutCommits, batchId)
      BatchCommits.publishBatch(arrivingAll, indexDir, scope, batchId, Seq("bp"))
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
    } finally arrivingAll.unpersist()
  }

  /** Offline compaction for the band index's per-batch file accrual:
    * rewrites the index RANGE-SORTED on `band` (each written file
    * covers a tight band interval inside its `bp=` dir — what makes the
    * per-file footer pruning in [[statsPrunedIndexFiles]] effective),
    * preserving the exact row set (every admission decision).
    * `targetFiles` sizes the total layout (0 = one sorted file per
    * prefix, the historical contract). Run while the gate is stopped. */
  def compactIndex(spark: SparkSession, indexDir: String,
      targetFiles: Int = 0): Unit =
    BatchCommits.compactPartitioned(spark, indexDir, indexSchema, "bp",
      sortCol = Some("band"), targetFiles = targetFiles)

  /** Start the gate: admitted documents append to `outDir`, their band
    * rows to `indexDir` (hive-partitioned by band-hash prefix). */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpoint: String,
      shingleK: Int = 1, numHashes: Int = 16, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, textCol, indexDir, outDir,
          checkpoint, shingleK, numHashes, bands, rows, threshold,
          maxBucketSize)
      }
      .start()
  }
}
