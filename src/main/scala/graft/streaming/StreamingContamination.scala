package graft.streaming

import graft.operators.Contamination
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingest-time decontamination gate: every arriving micro-batch of
  * documents is checked against a prebuilt, durable winnowing-fingerprint
  * index of the evaluation/holdout corpus ([[Contamination.buildIndex]]),
  * and contaminated arrivals are recorded as they appear — the shape a
  * training pipeline actually wants: eval sets are small and fixed, the
  * training stream is huge and continuous, so the index is built once
  * from the fixed side and the stream is gated row-by-row. (The batch
  * [[Contamination.detect]] is the same check run after the fact over a
  * completed split.)
  *
  * State/scale design:
  *  - NO streaming state: the check is a per-batch dataflow
  *    (winnow → equi-join on fingerprint → rollup) inside `foreachBatch`;
  *    the only cross-batch artifact is the index parquet, which is
  *    read-only and shared by every batch — state is bounded by the
  *    index size regardless of how long the stream runs;
  *  - the arriving batch never joins the corpus behind the index, only
  *    its pruned (f, id) posting lists — at 100 TB-of-stream the per-
  *    batch cost is one map pass over the batch plus a join whose build
  *    side is the (typically broadcast-sized) eval index;
  *  - exactly-once hits: replayed batch ids (restart after a checkpoint
  *    write failure re-delivers the last batch) are skipped via commit
  *    markers, the [[StreamingOps]] A22 pattern. Markers live under the
  *    CHECKPOINT dir, not `hitsDir`: batch ids are only unique within a
  *    checkpoint, and several runs (each with its own checkpoint) may
  *    legitimately append to one hits dir — a marker scoped to the hits
  *    dir would make run 2's batch 0 look like a replay of run 1's.
  *    Markers resolve through Hadoop's FileSystem API so they live on
  *    the checkpoint's own filesystem, and the hits append itself is a
  *    [[BatchCommits.publishBatch]] — a replay REPLACES the crashed
  *    batch's partial hit files instead of appending a second copy, so
  *    the crash window between the append and the marker duplicates
  *    nothing.
  */
object StreamingContamination {

  /** Start the gate: checks each micro-batch of `docs` (a streaming
    * DataFrame carrying `idCol` + `textCol`) against the index at
    * `indexDir` and appends hit summaries — (test_id, n_train_docs,
    * max_shared, sum_shared, batch_id), the [[Contamination.detect]]
    * contract plus the batch id — as parquet under `hitsDir`. `k`/`w`
    * must match the index build. */
  def guard(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, hitsDir: String, checkpoint: String,
      minShared: Int = 2, k: Int = 8, w: Int = 4,
      trigger: Trigger = Trigger.AvailableNow(),
      bloomPrefilter: Boolean = false): StreamingQuery = {
    val spark = docs.sparkSession
    // resolved once; each micro-batch re-scans the (immutable) parquet
    val index = Contamination.loadIndex(spark, indexDir)
    // built ONCE per gate start, then a literal in every batch's plan:
    // arriving fingerprints that cannot be in the (immutable) index are
    // dropped before the join's exchange. No false negatives — hits are
    // identical to the plain path; the index being fixed for the life of
    // the query is what makes a start-time Bloom sound.
    val bloom = if (bloomPrefilter) Contamination.bloomOf(index) else None
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!BatchCommits.markerExists(spark, checkpoint,
            "graft_batch_commits", batchId)) {
          BatchCommits.publishBatch(
            Contamination.checkAgainstIndex(batch, idCol, textCol, index,
                minShared, k, w, bloom = bloom)
              .withColumn("batch_id", lit(batchId)),
            hitsDir, BatchCommits.scopeFor(checkpoint), batchId)
          BatchCommits.createMarker(spark, checkpoint,
            "graft_batch_commits", batchId)
        }
        ()
      }
      .start()
  }
}
