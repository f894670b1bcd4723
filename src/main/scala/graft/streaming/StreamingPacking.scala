package graft.streaming

import graft.operators.Packing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Ingest-time sequence packing: every arriving micro-batch of documents is
  * packed into the GLOBAL token stream as a continuation of everything
  * packed before it — [[Packing.assign]] run per batch with
  * `startOffset` taken from a durable high-water-mark table. Export
  * packing becomes an ingest-time stage instead of a corpus-wide batch
  * job: the stream's output is, row for row, what the batch job would
  * have produced over the union (spec-verified).
  *
  * State design (the [[StreamingDedupGate]] pattern): NO Spark streaming
  * state. The cross-batch memory is a narrow (scope, batch_id,
  * end_offset) parquet; each batch reads the mark of its PREDECESSOR
  * batches only (`batch_id < current`), so the read is replay-immune by
  * construction — a crashed batch's own partial publishes are invisible
  * to its retry, and no ordering of output-vs-mark writes can
  * double-count. Output and mark land via the idempotent
  * [[BatchCommits.publishBatch]], the final marker commits the batch.
  *
  * Contract: documents must arrive in `idCol` order across batches
  * (monotone ingest ids — batch N's ids all precede batch N+1's), which
  * is what makes per-batch packing equal global packing. Continuation
  * is scoped to one checkpoint (one logical stream); restarts with the
  * SAME checkpoint resume exactly, a fresh checkpoint starts a new
  * stream at offset 0.
  */
object StreamingPacking {

  private val Commits = "graft_batch_commits"

  private[streaming] val hwmSchema = StructType(Seq(
    StructField("scope", StringType),
    StructField("batch_id", LongType),
    StructField("end_offset", LongType)))

  /** Highest committed end_offset strictly BEFORE `batchId` in this
    * scope (0 for the first batch). Explicit existence check — an
    * unreadable mark table fails loudly, it never silently restarts the
    * stream at 0. */
  private[streaming] def highWaterMark(spark: SparkSession, hwmDir: String,
      scope: String, batchId: Long): Long = {
    val (fs, p) = BatchCommits.fileSystem(spark, hwmDir)
    if (!fs.exists(p)) return 0L
    val r = spark.read.schema(hwmSchema).parquet(hwmDir)
      .filter(col("scope") === scope && col("batch_id") < batchId)
      .agg(max(col("end_offset"))).first()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }

  /** One batch through the packer — factored out so specs can drive
    * crash windows directly. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      idCol: String, nTokensCol: String, capacity: Long,
      outDir: String, hwmDir: String, checkpoint: String): Unit = {
    val spark = batch.sparkSession
    val scope = BatchCommits.scopeFor(checkpoint)
    if (BatchCommits.markerExists(spark, checkpoint, Commits, batchId)) return
    val start = highWaterMark(spark, hwmDir, scope, batchId)
    val packed = Packing.assign(batch, idCol, nTokensCol, capacity,
      startOffset = start).cache()
    try {
      val total = {
        val r = packed.agg(sum(col("n_tokens"))).first()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      BatchCommits.publishBatch(packed, outDir, scope, batchId)
      val mark = spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(scope, batchId, start + total)), hwmSchema)
      BatchCommits.publishBatch(mark, hwmDir, scope, batchId)
      BatchCommits.createMarker(spark, checkpoint, Commits, batchId)
    } finally packed.unpersist()
  }

  /** Offline compaction of the one-file-per-batch mark accrual —
    * rewrites `hwmDir` to a single file, every (scope, batch_id) row
    * preserved (a replayed batch must still be able to exclude its own
    * mark). Run while the packer is stopped. */
  def compactMarks(spark: SparkSession, hwmDir: String): Unit =
    BatchCommits.compactFlat(spark, hwmDir, hwmSchema)

  /** Start the packer over a streaming `docs` (carrying `idCol` +
    * `nTokensCol`): packed assignment rows append to `outDir`, the
    * high-water mark to `hwmDir`. */
  def start(docs: DataFrame, idCol: String, nTokensCol: String,
      capacity: Long, outDir: String, hwmDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, idCol, nTokensCol, capacity,
          outDir, hwmDir, checkpoint)
      }
      .start()
  }
}
