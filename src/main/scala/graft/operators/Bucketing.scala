package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-partition-persisted) tables: pay a table's shuffle ONCE
  * at write time so every later join or aggregation on the bucket key
  * runs exchange-free.
  *
  * At 100 TB the repeated cost in a fact⋈fact workload is re-shuffling
  * the same table on the same key for every query. Spark's bucketing
  * persists the hash partitioning in the catalog (`bucketBy` +
  * `saveAsTable`; bucketing only exists through the session catalog):
  * a scan of a bucketed table reports its `HashPartitioning(key)` output
  * partitioning, so Catalyst drops the Exchange under any join or
  * aggregation keyed on it — both sides of an equi-join with EQUAL bucket
  * counts sort-merge with zero shuffle (see PlanSpec "bucketed join").
  *
  * Bucket-count guidance at scale: pick `buckets` so one bucket of the
  * LARGEST table at target scale fits an executor core's working set
  * (~128-512 MB parquet per bucket); all co-joined tables must share the
  * bucket count, so size it for the biggest and let the small ones carry
  * more, smaller files. Too few buckets caps join parallelism at
  * `buckets`; too many makes small files at write.
  *
  * The reference has no analogue (its lake is write-once parquet read by
  * an external engine); this is part of the 100 TB query posture.
  */
object Bucketing {

  /** Ensure a bucketed, `sortBy`-clustered managed copy of `df` exists as
    * `table` and return the bucketed relation. Idempotent per table name
    * within a catalog: an existing table is reused without rewriting (the
    * session catalog is in-memory, so a fresh JVM re-materializes on
    * first touch). Callers must tag `table` by source dataset — a name
    * collision across datasets would silently reuse the other dataset's
    * copy. `overwrite = true` forces a rebuild. */
  def ensure(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, buckets: Int, overwrite: Boolean = false): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    if (overwrite || !spark.catalog.tableExists(table)) {
      if (!spark.catalog.tableExists(table)) {
        // The in-memory catalog forgets tables at JVM exit but the managed
        // location survives on disk, and managed CTAS refuses to reuse an
        // existing location (LOCATION_ALREADY_EXISTS). The bucketed copy is
        // a rebuildable cache of `df`, so clear the orphaned location.
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          table.toLowerCase(java.util.Locale.ROOT))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(table)
    }
    spark.table(table)
  }

  /** Catalog-safe table-name tag for a dataset directory (bucketed copies
    * of different sf dirs must never collide). */
  def dirTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]+", "_")
}
