package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts, lexicographic
  * min/max, and the modal value — the ANALYZE-style statistics pass a
  * pipeline runs before planning joins, partitioning, or skew handling
  * over unfamiliar data (the reference ingests blind; at 100 TB you
  * profile before you plan).
  *
  * Shape: columns MELT into narrow (col_name, value) rows via one
  * explode — a single scan regardless of column count — then two
  * aggregations: per-column stats (one shuffle keyed by column name,
  * partial aggs map-side) and the per-column mode (shuffle keyed by
  * (column, value) — the wide key carries the skew, which is the point:
  * a hot value aggregates map-side before it travels). Values profile
  * as strings so one plan serves every column type; numeric-specific
  * profiling (quantiles) belongs to q76/q79's percentile operators.
  */
object Profile {

  /** Profile `cols` of `df`: one output row per column —
    * (col_name, n_rows, n_null, n_distinct, min_value, max_value,
    * top_value, top_count). `n_distinct` and min/max are over the
    * string form; the modal value breaks count ties by value asc. */
  def columns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val melted = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("value"))): _*))
        .as("kv"))
      .select(col("kv.col_name").as("col_name"), col("kv.value").as("value"))
    val stats = melted.groupBy(col("col_name")).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
      count_distinct(col("value")).as("n_distinct"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name"))
      .orderBy(col("cnt").desc, col("value").asc)
    val top = melted.filter(col("value").isNotNull)
      .groupBy(col("col_name"), col("value")).agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("col_name"), col("value").as("top_value"),
        col("cnt").as("top_count"))
    stats.join(top, Seq("col_name"), "left")
  }
}
