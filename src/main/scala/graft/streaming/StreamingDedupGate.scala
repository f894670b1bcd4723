package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Ingest-time exact dedup gate: every arriving micro-batch is checked
  * against a durable content-hash index of everything already admitted,
  * survivors are appended to the output AND their hashes to the index —
  * so a document admitted once is never admitted again, within a batch
  * or years later. This is the streaming face of [[graft.operators
  * .Dedup.exact]]: same md5 content hash, same min-id keeper inside a
  * batch.
  *
  * State design: NO Spark streaming state. The cross-batch memory is
  * the hash index parquet — narrow (h) rows, readable by any engine,
  * compactable offline, and shared by restarts. Per batch the work is
  * one anti-join of the batch's hashes against the index (at 100 TB of
  * history the index join is the cost — partition the index dir by a
  * hash prefix and this becomes a pruned join; the gate itself never
  * rescans admitted DOCUMENTS, only hashes).
  *
  * Exactly-once: batch ids are committed via checkpoint-scoped markers
  * AFTER both appends succeed (the [[StreamingContamination]] rule:
  * batch ids are only unique within a checkpoint). A crash between the
  * two appends can leave a hash indexed whose document was not written
  * — the replay then drops that document. The gate therefore appends
  * the OUTPUT FIRST, index second: the crash window instead leaves an
  * admitted document whose hash lands on replay (duplicate-admission
  * impossible, single-loss impossible; the replayed batch re-checks
  * against the index which does not yet contain the crashed hashes).
  */
object StreamingDedupGate {

  /** Start the gate: arriving `docs` (streaming, `idCol` + `textCol`)
    * are exact-deduped against `indexDir` and within the batch (min
    * `idCol` keeper); admitted rows append to `outDir` as parquet,
    * their hashes to `indexDir`. */
  def start(docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, outDir: String, checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spark = docs.sparkSession
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val commits = java.nio.file.Paths.get(checkpoint, "graft_batch_commits")
        java.nio.file.Files.createDirectories(commits)
        val marker = commits.resolve(batchId.toString)
        if (!java.nio.file.Files.exists(marker)) {
          val hashed = batch.withColumn("__h", md5(col(textCol).cast("string")))
          // in-batch keeper: min id per hash (aggregate, no window)
          val keepers = hashed.groupBy(col("__h"))
            .agg(min(col(idCol)).as("__keep_id"))
          val inBatch = hashed.join(keepers,
              hashed("__h") === keepers("__h") &&
                col(idCol) === col("__keep_id"))
            .drop(keepers("__h")).drop("__keep_id")
          // cross-batch: anti-join against the durable hash index
          val seen =
            try spark.read.parquet(indexDir)
            catch { case _: org.apache.spark.sql.AnalysisException =>
              spark.createDataFrame(
                spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField("h",
                    org.apache.spark.sql.types.StringType)))) }
          val admitted = inBatch.join(seen, inBatch("__h") === seen("h"),
            "left_anti").cache()
          // output first, hashes second — see the scaladoc crash analysis
          admitted.drop("__h").write.mode(SaveMode.Append).parquet(outDir)
          admitted.select(col("__h").as("h"))
            .write.mode(SaveMode.Append).parquet(indexDir)
          admitted.unpersist()
          java.nio.file.Files.createFile(marker)
        }
        ()
      }
      .start()
  }
}
