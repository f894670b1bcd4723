package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join — points joined to enclosing intervals, the
  * second classic time-series operator the reference lacks (SURVEY §2.C).
  *
  * Naive formulation is an equi-key theta join (l.ts BETWEEN r.start AND
  * r.end) — per key that's a cross product, which dies at scale. The
  * bucketized plan: intervals explode into the fixed-width time buckets
  * they cover, points map to their single bucket, and the join is a plain
  * hash equi-join on (key, bucket) with the BETWEEN as a cheap residual
  * filter. Join cost is |points| + Σ interval-spans — linear, shuffle on
  * (key, bucket), AQE-splittable. A point lands in exactly one bucket so
  * no pair dedup is needed.
  *
  * `bucketSeconds` trades shuffle fan-out (long intervals explode into
  * more buckets) against bucket selectivity; set it near the typical
  * interval length. Pass 0 (the default) to DERIVE it from the data:
  * one metadata-scale aggregate takes the median interval length, so
  * the fan-out stays near one bucket per interval no matter how the
  * interval mix scales or skews — a fixed width that looked right at
  * sf0.1 grows superlinear in-bucket pair work at 10× data (the round-7
  * q74 finding). Results are identical for ANY width (the BETWEEN
  * residual is exact); only the plan shape changes.
  */
object RangeJoin {

  /** Median interval length in seconds — the derived bucket width.
    * One aggregate over (end - start), intervals-side only, never the
    * (typically much larger) points side; percentile_approx keeps it a
    * single mergeable pass (no sort) however large the interval table —
    * the width only needs to be NEAR the median, any value is correct. */
  private[operators] def medianIntervalSeconds(intervals: DataFrame,
      startCol: String, endCol: String): Long = {
    val r = intervals.select(
      percentile_approx(
        unix_timestamp(col(endCol)) - unix_timestamp(col(startCol)),
        lit(0.5), lit(10000)).cast("long").as("m")).first()
    if (r.isNullAt(0)) 3600L else math.max(1L, r.getLong(0))
  }

  /** @param points        left side, one timestamp per row
    * @param intervals     right side with [startCol, endCol) half-open spans
    * @param keyCol        equi-key on both sides
    * @param tsCol         point timestamp column
    * @param startCol      interval start column
    * @param endCol        interval end column (exclusive)
    * @param bucketSeconds bucket width; 0 = derive (median interval length)
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 0L): DataFrame = {
    require(bucketSeconds >= 0, s"bucketSeconds must be >= 0, got $bucketSeconds")
    val width =
      if (bucketSeconds > 0) bucketSeconds
      else medianIntervalSeconds(intervals, startCol, endCol)

    val pB = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / width))

    val iB = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / width),
        // end is exclusive: a span ending exactly on a bucket edge does
        // not cover that bucket
        floor((unix_timestamp(col(endCol)) - 1) / width))))

    pB.join(iB, Seq(keyCol, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
