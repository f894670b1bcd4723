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

  /** Mandatory namespace for bucketed-cache table names: orphan cleanup
    * (below) recursively deletes the table's warehouse location, so it is
    * only ever allowed to target directories graft itself owns. */
  val Prefix = "graft_bkt_"

  /** Stamped into the table location after every successful build so a
    * later JVM can prove an orphaned location is a rebuildable graft
    * cache before clearing it (underscore-prefixed = invisible to
    * Spark's file listing). */
  private val Marker = "_GRAFT_BUCKETED"

  /** Ensure a bucketed, `sortBy`-clustered managed copy of `df` exists as
    * `table` and return the bucketed relation. Idempotent per table name
    * within a catalog: an existing table is reused without rewriting (the
    * session catalog is in-memory, so a fresh JVM re-materializes on
    * first touch). Callers must tag `table` by source dataset — a name
    * collision across datasets would silently reuse the other dataset's
    * copy. `overwrite = true` forces a rebuild.
    *
    * Single-writer assumption: concurrent `ensure` calls for the SAME
    * table name (across sessions sharing a warehouse dir) race the
    * clear-then-write below and are not coordinated — serialize per
    * table name, as q80 and the specs do. Distinct table names never
    * interfere.
    *
    * `table` must be an unqualified (default-database) name carrying
    * [[Prefix]]: orphan cleanup maps name→location by the default-db
    * warehouse convention, so a qualified `db.table` could mis-target,
    * and a non-namespaced name could point the delete at foreign data.
    * Both are rejected up front. */
  def ensure(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, buckets: Int, overwrite: Boolean = false): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(!table.contains("."),
      s"unqualified (default-database) table name required, got '$table': " +
        "orphan cleanup resolves the location by the default-db warehouse " +
        "convention, which a qualified name would not match")
    require(table.toLowerCase(java.util.Locale.ROOT).startsWith(Prefix),
      s"bucketed-cache tables must be namespaced '$Prefix*', got '$table': " +
        "cleanup of an orphaned location must never target a directory " +
        "graft does not own")
    if (overwrite || !spark.catalog.tableExists(table)) {
      if (!spark.catalog.tableExists(table)) {
        // The in-memory catalog forgets tables at JVM exit but the managed
        // location survives on disk, and managed CTAS refuses to reuse an
        // existing location (LOCATION_ALREADY_EXISTS). The bucketed copy is
        // a rebuildable cache of `df`, so clear the orphaned location —
        // but only once it proves to be one of ours (marker file, or the
        // pure Spark-table shape of pre-marker copies). A foreign
        // directory squatting on the name fails loudly instead of being
        // silently destroyed.
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"),
          table.toLowerCase(java.util.Locale.ROOT))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) {
          require(isGraftBucketedCopy(fs, loc),
            s"refusing to clear $loc: it exists but is not recognizable as " +
              s"a graft bucketed copy (no $Marker marker, contents are not " +
              "a plain Spark table dir) — remove it manually or choose " +
              "another table name")
          fs.delete(loc, true)
        }
      }
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(buckets, bucketCol)
        .sortBy(bucketCol)
        .saveAsTable(table)
      // Stamp the marker at the CATALOG-resolved location (not the name
      // convention) so the next JVM's cleanup check is grounded in where
      // the table actually landed.
      val resolved = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.getTableMetadata(
          org.apache.spark.sql.catalyst.TableIdentifier(table)).location)
      val rfs = resolved.getFileSystem(spark.sparkContext.hadoopConfiguration)
      rfs.create(new org.apache.hadoop.fs.Path(resolved, Marker), true).close()
    }
    spark.table(table)
  }

  /** An orphaned location is clearable iff it carries the marker, or
    * (legacy copies written before the marker existed) every visible
    * entry is a Spark table artifact (`part-*` data file / `_SUCCESS`). */
  private def isGraftBucketedCopy(fs: org.apache.hadoop.fs.FileSystem,
      loc: org.apache.hadoop.fs.Path): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(loc, Marker)) ||
      fs.listStatus(loc).forall { st =>
        val n = st.getPath.getName
        n == "_SUCCESS" || (st.isFile && n.startsWith("part-"))
      }

  /** Catalog-safe table-name tag for a dataset directory (bucketed copies
    * of different sf dirs must never collide). */
  def dirTag(dir: String): String = dir.replaceAll("[^A-Za-z0-9]+", "_")
}
