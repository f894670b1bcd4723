package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the classic time-series operator the
  * reference lacks (SURVEY §2.C): for every left row, the latest right row
  * with the same key and right.ts <= left.ts (optionally within a
  * tolerance).
  *
  * Spark-first implementation: NOT a per-row range probe. Both sides are
  * tagged and unioned, then one window pass per key ordered by (ts, side)
  * carries the last right payload forward (last_value ignoreNulls). That
  * is a single shuffle on the key + one sort — the sort-merge shape that
  * scales linearly, where a naive theta-join (l.ts >= r.ts) would be a
  * per-key cross product.
  *
  * Right rows sort before left rows at equal timestamps, so equality
  * matches (right.ts == left.ts) are included — same semantics as
  * DuckDB/kdb ASOF JOIN with >=.
  */
object AsOfJoin {

  /** @param left       left (probe) side
    * @param right      right (reference) side
    * @param keyCol     equi-key column name present on both sides
    * @param leftTs     left timestamp column name
    * @param rightTs    right timestamp column name
    * @param payload    right-side columns to carry (renamed as given)
    * @param tolerance  optional max age (seconds): matches older than
    *                   left.ts - tolerance are dropped (null payload)
    */
  def asof(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String,
      payload: Seq[String],
      tolerance: Option[Long] = None): DataFrame = {

    val leftCols = left.columns
    val payType = right.select(payload.map(col): _*).schema
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__pay", lit(null).cast(payType))
      .select((Seq(col(keyCol).as("__k"), col("__ts"), col("__side"), col("__pay")) ++
        leftCols.map(c => col(c).as(s"__l_$c"))): _*)

    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__pay", struct(payload.map(col): _*)) // typed struct survives last_value
      .select(Seq(col(keyCol).as("__k"), col("__ts"), col("__side"), col("__pay")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .withColumn("__match_ts", last(
        when(col("__side") === 0, col("__ts")), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val bounded = tolerance match {
      case Some(sec) => carried.withColumn("__match",
        when(col("__match_ts") >= col("__ts") - expr(s"INTERVAL $sec SECONDS"), col("__match")))
      case None => carried
    }

    val out = leftCols.map(c => col(s"__l_$c").as(c)) ++
      payload.map(p => col(s"__match.$p").as(p))
    bounded.select(out.toIndexedSeq: _*)
  }
}
