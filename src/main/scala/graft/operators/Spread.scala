package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Opt-in parallelism floor for raw-text map passes.
  *
  * On a real cluster the parquet scan's input splits already spread a
  * corpus across executors, and repartitioning a raw-text column ships
  * the whole corpus through the wire for nothing. On local[n] over a
  * handful of parquet files, the scan can plan fewer partitions than
  * cores and a per-row CPU-heavy pass (winnowing, tokenization)
  * single-threads — there the exchange is a measured win. `byKey`
  * repartitions by the id column ONLY when the scan provides fewer
  * partitions than the requested floor, so passing
  * `spark.sparkContext.defaultParallelism` gives the local win without
  * ever paying the exchange where input splits suffice. The default at
  * every call site is 0 = never repartition.
  */
private[graft] object Spread {

  def byKey(df: DataFrame, key: String, minParallelism: Int): DataFrame =
    // toRdd, not .rdd: the partition count is the same, but .rdd plans an
    // extra row-deserializer stage per call — measurable at bench scale
    if (minParallelism > 0 &&
        df.queryExecution.toRdd.getNumPartitions < minParallelism)
      df.repartition(col(key))
    else df
}
