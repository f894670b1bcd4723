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
  * interval length.
  */
object RangeJoin {

  /** @param points    left side, one timestamp per row
    * @param intervals right side with [startCol, endCol) half-open spans
    * @param keyCol    equi-key on both sides
    * @param tsCol     point timestamp column
    * @param startCol  interval start column
    * @param endCol    interval end column (exclusive)
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keyCol: String,
      tsCol: String, startCol: String, endCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {

    val pB = points.withColumn("__bucket",
      floor(unix_timestamp(col(tsCol)) / bucketSeconds))

    val iB = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(startCol)) / bucketSeconds),
        // end is exclusive: a span ending exactly on a bucket edge does
        // not cover that bucket
        floor((unix_timestamp(col(endCol)) - 1) / bucketSeconds))))

    pB.join(iB, Seq(keyCol, "__bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("__bucket")
  }
}
