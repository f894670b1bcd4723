package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: lay the corpus's token stream end-to-end
  * in document order and cut it into fixed-`capacity` context windows —
  * the concatenate-then-split packing used to build pretraining batches
  * (every token is used, no padding; a document may straddle a window
  * boundary). Output is one narrow row per document telling the
  * downstream batch-builder exactly where its tokens land:
  * (doc_id, n_tokens, tok_offset, seq_id, seq_offset, seq_last).
  *
  * The global token offset is a prefix sum over a total order — the
  * textbook "needs a single sorted partition" trap. Here it is a
  * DISTRIBUTED two-phase prefix sum:
  *   1. rows are range-bucketed by a monotone function of the id
  *      (`floor(id / width)` — monotone for any positive width, so
  *      bucket order == id order; skewed ids cost balance, never
  *      correctness);
  *   2. per-bucket token totals aggregate map-side (one groupBy over
  *      #buckets rows);
  *   3. bucket START offsets are a running sum over the bucket totals —
  *      a single-partition window over #buckets rows (metadata-scale,
  *      thousands), never over the corpus;
  *   4. each row's offset = its bucket's start + a within-bucket running
  *      sum (window partitioned by bucket — every partition bounded by
  *      corpus/width, all partitions sort in parallel).
  * The bucket-offset table joins back via broadcast, so the corpus
  * itself is touched by exactly one shuffle (the within-bucket sort);
  * at 100 TB no single task ever sees more than one bucket.
  *
  * The reference has no packing (rtdl stops at the lake); extension
  * surface per the LLM-pipeline mandate.
  */
object Packing {

  /** Assign every document its place in the packed token stream.
    *
    * `idCol` must be a unique integer key (the total order); `nTokensCol`
    * a non-negative per-document token count (zero-token documents keep
    * a well-defined `seq_last = seq_id`). `bucketWidth = 0` derives a
    * width targeting 8 buckets per core from the id span (one bounded
    * min/max aggregate, driver-side metadata like the IVF codebook);
    * pass it explicitly to skip that pass.
    *
    * Returns (doc_id, n_tokens, tok_offset, seq_id, seq_offset,
    * seq_last): tokens `[tok_offset, tok_offset + n_tokens)` of the
    * packed stream, i.e. training sequence `seq_id` starting at
    * in-sequence position `seq_offset`, spilling into sequences up to
    * `seq_last`. Integer arithmetic throughout (`div`/`%`), so the
    * assignment replays bit-identically in any engine.
    *
    * `startOffset` shifts the whole packed stream: position 0 of this
    * df lands at `startOffset` of the global stream — the continuation
    * hook [[graft.streaming.StreamingPacking]] uses to pack an ingest
    * stream batch-by-batch against a durable high-water mark.
    */
  def assign(df: DataFrame, idCol: String, nTokensCol: String,
      capacity: Long, bucketWidth: Long = 0L,
      startOffset: Long = 0L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    require(startOffset >= 0, s"startOffset must be >= 0, got $startOffset")
    val spark = df.sparkSession
    val width = if (bucketWidth > 0) bucketWidth else {
      val mm = df.agg(min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi")).head()
      if (mm.isNullAt(0)) 1L
      else {
        val span = mm.getLong(1) - mm.getLong(0) + 1L
        val target = math.max(1, spark.sparkContext.defaultParallelism * 8)
        math.max(1L, span / target)
      }
    }
    val bucketed = df.select(
      col(idCol).cast("long").as("doc_id"),
      col(nTokensCol).cast("long").as("n_tokens"),
      expr(s"CAST(${idCol} AS BIGINT) div ${width}").as("bkt"))
    val bucketOffsets = bucketed
      .groupBy(col("bkt")).agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn("bkt_offset", coalesce(
        sum(col("bkt_tokens")).over(Window.orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bkt"), col("bkt_offset"))
    val within = Window.partitionBy(col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(broadcast(bucketOffsets), Seq("bkt"))
      .withColumn("tok_offset",
        lit(startOffset) + col("bkt_offset") +
          coalesce(sum(col("n_tokens")).over(within), lit(0L)))
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div ${capacity}").as("seq_id"),
        (col("tok_offset") % lit(capacity)).as("seq_offset"),
        expr(s"(tok_offset + greatest(n_tokens, 1L) - 1L) div ${capacity}")
          .as("seq_last"))
  }

  /** Per-GROUP packing: an independent packed token stream per value of
    * `groupCol` (per-language / per-source training streams — each
    * group's sequences are self-contained, `tok_offset`/`seq_id` count
    * within the group). Same distributed two-phase prefix sum as
    * [[assign]] with composite keys: per-(group, bucket) totals, bucket
    * start offsets via a window PARTITIONED BY GROUP over the bucket
    * totals (groups run in parallel — no global single-partition window
    * at any group count), and the within-bucket running sum keyed by
    * (group, bucket). The offset table has one row per (group, bucket)
    * PAIR — no broadcast hint here, unlike [[assign]]: at high group
    * counts it outgrows the driver, and Spark's auto-broadcast
    * threshold picks the join side correctly either way. Rows with a
    * NULL group are dropped (null is not a stream). */
  def assignPerGroup(df: DataFrame, groupCol: String, idCol: String,
      nTokensCol: String, capacity: Long, bucketWidth: Long = 0L): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val spark = df.sparkSession
    val rows = df.filter(col(groupCol).isNotNull)
    val width = if (bucketWidth > 0) bucketWidth else {
      val mm = rows.agg(min(col(idCol).cast("long")).as("lo"),
        max(col(idCol).cast("long")).as("hi")).head()
      if (mm.isNullAt(0)) 1L
      else {
        val span = mm.getLong(1) - mm.getLong(0) + 1L
        val target = math.max(1, spark.sparkContext.defaultParallelism * 8)
        math.max(1L, span / target)
      }
    }
    val bucketed = rows.select(
      col(groupCol).as("grp"),
      col(idCol).cast("long").as("doc_id"),
      col(nTokensCol).cast("long").as("n_tokens"),
      expr(s"CAST(${idCol} AS BIGINT) div ${width}").as("bkt"))
    val bucketOffsets = bucketed
      .groupBy(col("grp"), col("bkt")).agg(sum(col("n_tokens")).as("bkt_tokens"))
      .withColumn("bkt_offset", coalesce(
        sum(col("bkt_tokens")).over(Window.partitionBy(col("grp"))
          .orderBy(col("bkt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("grp"), col("bkt"), col("bkt_offset"))
    val within = Window.partitionBy(col("grp"), col("bkt")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .join(bucketOffsets, Seq("grp", "bkt"))
      .withColumn("tok_offset",
        col("bkt_offset") + coalesce(sum(col("n_tokens")).over(within), lit(0L)))
      .select(col("grp").as(groupCol), col("doc_id"), col("n_tokens"),
        col("tok_offset"),
        expr(s"tok_offset div ${capacity}").as("seq_id"),
        (col("tok_offset") % lit(capacity)).as("seq_offset"),
        expr(s"(tok_offset + greatest(n_tokens, 1L) - 1L) div ${capacity}")
          .as("seq_last"))
  }

  /** The inverse view of [[assign]] — the per-SEQUENCE slice map a batch
    * builder consumes: for every (sequence, document) incidence, which
    * token range of the document lands at which position of the
    * sequence. One row per non-empty slice:
    * (seq_id, doc_id, doc_start, doc_end, seq_pos, n) with
    * `[doc_start, doc_end)` in document token coordinates and `seq_pos`
    * the in-sequence start. A straddling document yields one row per
    * sequence it touches; zero-token documents yield none.
    *
    * Pure per-row projection over `assign`'s output (explode of
    * `sequence(seq_id, seq_last)` + integer clamps — a document touches
    * ⌈n/capacity⌉+1 sequences, so the fan-out is the token volume over
    * capacity, never quadratic). Invariants (spec-pinned): every
    * sequence except the last sums to exactly `capacity` tokens with
    * contiguous slices; every document's slices partition
    * [0, n_tokens). */
  def slices(assigned: DataFrame, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    assigned
      .filter(col("n_tokens") > 0)
      .select(col("doc_id"), col("n_tokens"), col("tok_offset"),
        explode(sequence(col("seq_id"), col("seq_last"))).as("seq_id"))
      .withColumn("__seq_start", col("seq_id") * lit(capacity))
      .select(
        col("seq_id"),
        col("doc_id"),
        greatest(lit(0L), col("__seq_start") - col("tok_offset")).as("doc_start"),
        least(col("n_tokens"),
          col("__seq_start") + lit(capacity) - col("tok_offset")).as("doc_end"),
        greatest(lit(0L), col("tok_offset") - col("__seq_start")).as("seq_pos"))
      .withColumn("n", col("doc_end") - col("doc_start"))
      .filter(col("n") > 0)
  }
}
