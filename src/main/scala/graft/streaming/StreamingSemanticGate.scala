package graft.streaming

import graft.operators.{Dedup, IndexStore, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType, StructField, StructType}

/** Ingest-time SEMANTIC duplicate gate: the [[Dedup.semDedup]] analogue
  * of [[StreamingNearDupGate]] — completes the durable-gate family
  * (exact / near-dup / contamination / semantic). Every arriving
  * micro-batch is assigned to a FIXED Lloyd cell and checked against a
  * durable per-cell vector index of everything already SEEN: a document
  * whose embedding sits at cosine ≥ `threshold` to any earlier document
  * in the same cell is dropped, within a batch or years later.
  *
  * The codebook is a caller-supplied artifact
  * ([[Similarity.trainCentroids]] on a reference sample, the SemDeDup
  * deployment posture). It MUST stay fixed for the life of the index:
  * retraining per batch would silently reshape cells and change which
  * documents are ever compared, making admission depend on batch
  * boundaries. The gate stamps `_graft_codebook` (an md5 fingerprint of
  * the rounded centroid coordinates) into the index dir on first
  * publish and refuses to run against a mismatched codebook — the
  * [[StreamingDedupGate]] `_graft_prefix_len` discipline.
  *
  * Dedup semantics, precisely: a document drops iff it sits within
  * `threshold` of ANY earlier-id SAME-CELL document — admitted or
  * dropped — "earlier" meaning a smaller id in the same batch or any id
  * from a previous batch (ids monotone across batches, the
  * [[StreamingPacking]] contract). Because [[Dedup.semDedupWith]]'s
  * batch rule is the same pairwise-against-smaller-ids rule over the
  * same fixed cells, the admitted set for a corpus is INDEPENDENT of
  * how micro-batch boundaries fall and equals the batch operator's
  * kept set over the union (spec-proven) — PROVIDED no cell exceeds
  * `maxCellSize` across the union. The cap is a local guard, not a
  * global invariant: the in-batch check counts the batch's rows, the
  * cross-batch check counts index residents, so a cell crossing the cap
  * mid-stream degrades to admitting (never to a quadratic join) and an
  * over-cap cell's admissions MAY then depend on where boundaries fell.
  * Size `nCentroids` at training time so cells stay far under the cap;
  * the cap exists for the degenerate corpus, not the designed one.
  *
  * Index/scale design (the [[StreamingNearDupGate]] pattern):
  *  - rows are (id, v, cell) hive-partitioned by `cell` (the Lloyd
  *    bucket as a string partition value); the per-batch join PRUNES
  *    the index scan to the arriving batch's cells;
  *  - per-cell counts come from a mergeable groupBy (≤ K rows,
  *    broadcast back) — never a window over an unbounded key; a cell
  *    past `maxCellSize` skips comparison (admits) rather than
  *    detonating the per-cell join, the [[Dedup.semDedup]] guard
  *    posture — `nCentroids` at training time is the real scale knob;
  *  - commits are the two-marker exactly-once protocol with idempotent
  *    scoped publishes; the index slice is a pure function of the
  *    BATCH (all seen docs), so recovery after the output marker
  *    republishes it from the replayed batch — no read-back.
  */
object StreamingSemanticGate {

  private val OutCommits = "graft_out_commits"
  private val Commits = "graft_batch_commits"

  private val indexSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("v", ArrayType(DoubleType, containsNull = false)),
    StructField("cell", StringType)))

  /** Deterministic fingerprint of a codebook: centroid ids + half-up-6
    * fixed-point coordinates, md5-hexed. Two codebooks that assign any
    * vector differently differ in some rounded coordinate. */
  private[streaming] def codebookFingerprint(
      centroids: Seq[(Long, Array[Double])]): String = {
    val canon = centroids.sortBy(_._1).map { case (cid, w) =>
      s"$cid:${w.map(x => math.floor(x * 1e6 + 0.5).toLong).mkString(",")}"
    }.mkString(";")
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** First publish stamps `_graft_codebook`; every later batch verifies
    * it — a gate restarted with a retrained codebook would assign cells
    * differently and silently re-admit semantic duplicates. */
  private[streaming] def checkCodebook(fs: org.apache.hadoop.fs.FileSystem,
      indexDir: String, centroids: Seq[(Long, Array[Double])]): Unit = {
    val fp = codebookFingerprint(centroids)
    val meta = new org.apache.hadoop.fs.Path(indexDir, "_graft_codebook")
    if (fs.exists(meta)) {
      val in = fs.open(meta)
      val stored = try new String(in.readAllBytes(), "UTF-8").trim
        finally in.close()
      if (stored != fp)
        throw new IllegalStateException(
          s"$indexDir was built with codebook $stored, gate started with " +
            s"$fp — cell assignment would drift and semantic duplicates " +
            "would be re-admitted; restart with the original codebook")
    } else {
      fs.mkdirs(new org.apache.hadoop.fs.Path(indexDir))
      val out = fs.create(meta, false)
      try out.write(fp.getBytes("UTF-8")) finally out.close()
    }
  }

  /** (id, v, cell) rows for a document batch — the index slice AND the
    * join probe side share this shape. */
  private[streaming] def cellRows(docs: DataFrame, idCol: String,
      vecCol: String, centroids: Seq[(Long, Array[Double])]): DataFrame =
    Similarity.ivfAssignWith(docs, idCol, vecCol, centroids)
      .select(col("corpus_id").cast("long").as("id"), col("cv").as("v"),
        col("bucket").cast("string").as("cell"))

  private[streaming] def prunedIndex(spark: SparkSession, indexDir: String,
      cells: Seq[String]): DataFrame = {
    val (fs, p) = BatchCommits.fileSystem(spark, indexDir)
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], indexSchema)
    else
      spark.read.schema(indexSchema).parquet(indexDir)
        .filter(col("cell").isin(cells: _*))
  }

  /** Ids among `arriving` within `threshold` of any previously SEEN
    * same-cell document. Cells past `maxCellSize` (counted on the
    * PRUNED index with a mergeable groupBy, broadcast back) skip
    * comparison. Returns one `__dup_id` column (reserved name — the
    * [[StreamingNearDupGate]] join-site contract). */
  private[streaming] def crossBatchDupIds(spark: SparkSession,
      arriving: DataFrame, indexDir: String, threshold: Double,
      maxCellSize: Int): DataFrame = {
    import graft.functions.VectorExpressions
    VectorExpressions.register(spark)
    val cells = arriving.select(col("cell")).distinct()
      .collect().map(_.getString(0)).toSeq
    val pruned = prunedIndex(spark, indexDir, cells)
    val smallCells = pruned.groupBy(col("cell"))
      .agg(count(lit(1)).as("__cn"))
      .filter(col("__cn") <= maxCellSize).select(col("cell"))
    val seen = pruned
      .join(broadcast(smallCells), Seq("cell"), "left_semi")
      .select(col("cell"), col("id").as("seen_id"), col("v").as("seen_v"))
    arriving.join(seen, Seq("cell"))
      .filter(VectorExpressions.dot(col("v"), col("seen_v")) >= threshold)
      .select(col("id").as("__dup_id")).distinct()
  }

  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Double])], indexDir: String,
      outDir: String, checkpoint: String, threshold: Double,
      maxCellSize: Int): Unit = {
    val spark = batch.sparkSession
    val scope = BatchCommits.scopeFor(checkpoint)
    val (fs, _) = BatchCommits.fileSystem(spark, indexDir)
    checkCodebook(fs, indexDir, centroids)
    if (BatchCommits.markerExists(spark, checkpoint, Commits, batchId)) return
    if (BatchCommits.markerExists(spark, checkpoint, OutCommits, batchId)) {
      // recovery: output committed, index publish may be partial. The
      // index slice is a pure function of the replayed batch (ALL seen
      // docs), so just republish it — idempotent, state-independent.
      BatchCommits.publishBatch(
        cellRows(batch, idCol, vecCol, centroids),
        indexDir, scope, batchId, Seq("cell"))
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
      return
    }
    // in-batch: the batch operator's pairwise rule over the same fixed
    // cells ("drops iff a smaller-id same-cell doc within threshold")
    val inBatchDrops = Dedup.semDedupWith(batch, idCol, vecCol, centroids,
        threshold, maxClusterSize = maxCellSize, index = IndexStore.NoStore)
      .filter(col("kept") === 0)
      .select(col("corpus_id").cast("long").as("__drop"))
    val inBatchKept = batch.join(inBatchDrops,
      col(idCol).cast("long") === col("__drop"), "left_anti")
    val arrivingAll = cellRows(batch, idCol, vecCol, centroids).cache()
    try {
      val dupIds = crossBatchDupIds(spark, arrivingAll, indexDir,
        threshold, maxCellSize)
      val admitted = inBatchKept.join(dupIds,
        col(idCol).cast("long") === col("__dup_id"), "left_anti")
      BatchCommits.publishBatch(admitted, outDir, scope, batchId)
      BatchCommits.createMarker(spark, checkpoint, OutCommits, batchId)
      BatchCommits.publishBatch(arrivingAll, indexDir, scope, batchId, Seq("cell"))
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
    } finally arrivingAll.unpersist()
  }

  /** Offline compaction for the cell index's per-batch file accrual —
    * one file per `cell=` partition afterwards, row set preserved. Run
    * while the gate is stopped. */
  def compactIndex(spark: SparkSession, indexDir: String): Unit =
    BatchCommits.compactPartitioned(spark, indexDir, indexSchema, "cell")

  /** Start the gate: admitted documents append to `outDir`, their
    * (id, v, cell) rows to `indexDir` (hive-partitioned by cell). */
  def start(docs: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Double])], indexDir: String,
      outDir: String, checkpoint: String, threshold: Double,
      maxCellSize: Int = 100000,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    require(centroids.nonEmpty, "codebook must be non-empty")
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, vecCol, centroids, indexDir,
          outDir, checkpoint, threshold, maxCellSize)
      }
      .start()
  }
}
