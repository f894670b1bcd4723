package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Multi-dimensional data-clustered layout (Z-order / Morton curve) for
  * the lake write path — the data-skipping complement to
  * [[LakeWriter]]'s time partitioning.
  *
  * Hive partitioning prunes on ONE dimension (the time bucket,
  * ingester.go:522-548 semantics). At 100 TB the queries that hurt are
  * the ones filtering on the OTHER columns: a linear sort clusters one
  * of them, and every remaining predicate reads the whole table.
  * Interleaving the bits of several bucketized columns into one sort
  * key (the Morton/Z space-filling curve — public technique, used by
  * Delta/Iceberg OPTIMIZE ZORDER) gives every written file a tight
  * hyper-rectangle in ALL interleaved dimensions at once, so parquet
  * min/max stats skip files/row-groups for predicates on any of them.
  *
  * Everything here is built-in-function arithmetic (shift/and/add) —
  * whole-stage-codegen'd, no UDF, and exactly replayable by the DuckDB
  * oracle (q113): bucketization is affine min-max scaling in IEEE
  * double (exact for integral inputs below 2^53), interleaving is
  * integer bit surgery.
  *
  * Skew: min-max bucketization is value-space — a heavily skewed
  * column wastes curve resolution around its outliers. The `bounds`
  * override clamps to known-good ranges, and [[zColumnRank]] /
  * `zorderWrite(rankSpace = true)` switches to equi-depth buckets from
  * a GK percentile grid (the [[Sampling.topKPerGroup]] machinery) so
  * the curve spends resolution on row mass instead.
  */
object Layout {

  /** Affine min-max bucketization of `c` into [0, 2^bits): data range
    * [lo, hi] inclusive, values outside clamp to the edge buckets,
    * degenerate range (lo == hi) maps to bucket 0. Double math by
    * design — exact for integral inputs, and byte-identical between
    * Spark and DuckDB because both run the same IEEE ops in the same
    * order. */
  def bucket(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bucket bits in [1,20], got $bits")
    val size = 1L << bits
    if (hi <= lo) lit(0L)
    else least(lit(size - 1), greatest(lit(0L),
      floor(c.cast("double").minus(lit(lo)).divide(lit(hi - lo)) * lit(size.toDouble))
        .cast("long")))
  }

  /** Morton code: interleave the low `bits` of each (already
    * bucketized, in [0, 2^bits)) column — bit b of column i lands at
    * position b*n+i, so all columns contribute equally at every scale
    * of the curve. Pure shift/mask/add term tree: disjoint bit
    * positions make + equal to |, and the whole thing codegens. */
  def zValue(bucketed: Seq[Column], bits: Int): Column = {
    val n = bucketed.size
    require(n >= 1, "zValue needs at least one column")
    require(bits * n <= 62, s"$n cols x $bits bits overflows a long")
    val terms = for {
      b <- 0 until bits
      (c, i) <- bucketed.zipWithIndex
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_ + _)
  }

  /** Per-column [min, max] over `cols` — ONE metadata aggregate (2xN
    * doubles to the driver), the data-derived-literals pattern
    * ([[Sampling.temperature]]'s rates): the curve parameters become
    * plan literals, nothing global-windows over the data. */
  def columnBounds(df: DataFrame, cols: Seq[String]): Map[String, (Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__lo_$c"),
      max(col(c).cast("double")).as(s"__hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).first()
    cols.zipWithIndex.map { case (c, i) =>
      val lo = if (r.isNullAt(2 * i)) 0.0 else r.getDouble(2 * i)
      val hi = if (r.isNullAt(2 * i + 1)) 0.0 else r.getDouble(2 * i + 1)
      c -> (lo, hi)
    }.toMap
  }

  /** The z-value column for `df` over `zcols`, bounds data-derived
    * unless overridden. NULLs clamp to the low edge (bucket 0). */
  def zColumn(df: DataFrame, zcols: Seq[String], bits: Int = 8,
      bounds: Map[String, (Double, Double)] = Map.empty): Column = {
    val eff = if (zcols.forall(bounds.contains)) bounds
      else bounds ++ columnBounds(df, zcols.filterNot(bounds.contains))
    zValue(zcols.map { c =>
      val (lo, hi) = eff(c)
      bucket(coalesce(col(c).cast("double"), lit(lo)), lo, hi, bits)
    }, bits)
  }

  /** Equi-depth cut points per column: the 2^bits − 1 interior
    * percentile-grid edges from ONE `approx_percentile` aggregate (the
    * GK sketch — bounded error, mergeable, metadata-sized result).
    * This is the skew fix the min-max path documents: a zipf column
    * collapses value-space buckets onto its head, while rank-space
    * edges put ~equal row mass in every bucket regardless of the value
    * distribution. */
  def rankBounds(df: DataFrame, cols: Seq[String], bits: Int,
      accuracy: Int = 10000): Map[String, Array[Double]] = {
    require(bits >= 1 && bits <= 10, s"rank-space bits in [1,10], got $bits")
    val n = 1 << bits
    val grid = array((1 until n).map(i => lit(i.toDouble / n)): _*)
    val aggs = cols.map(c =>
      approx_percentile(col(c).cast("double"), grid, lit(accuracy)).as(s"__e_$c"))
    val r = df.agg(aggs.head, aggs.tail: _*).first()
    cols.zipWithIndex.map { case (c, i) =>
      c -> (if (r.isNullAt(i)) Array.empty[Double]
            else r.getSeq[Double](i).toArray)
    }.toMap
  }

  /** Rank-space bucket: how many edges lie at or below the value — a
    * codegen'd fold over the literal edge array (2^bits − 1 compares
    * per row; bits ≤ 10 keeps the term count sane). NULLs and rows
    * below every edge land in bucket 0. */
  def rankBucket(c: Column, edges: Array[Double]): Column =
    if (edges.isEmpty) lit(0L)
    else aggregate(
      array(edges.map(lit(_)).toIndexedSeq: _*), lit(0L),
      (acc, e) => acc + when(c.cast("double") >= e, lit(1L)).otherwise(lit(0L)))

  /** [[zColumn]] in rank space: equi-depth buckets from the percentile
    * grid, then the same Morton interleave. The curve spends its
    * resolution on row mass, not value range — the right choice for
    * skewed keys (ids, counts, power-law scores). */
  def zColumnRank(df: DataFrame, zcols: Seq[String], bits: Int = 6,
      accuracy: Int = 10000): Column = {
    val edges = rankBounds(df, zcols, bits, accuracy)
    zValue(zcols.map(c => rankBucket(col(c), edges(c))), bits)
  }

  /** Z-order-clustered write: range-partition on the z-value into
    * `targetFiles` output files, sort within each partition by it, and
    * write parquet WITHOUT the helper column. Each file then covers a
    * compact curve segment — a tight bounding box in every interleaved
    * dimension — so footer min/max stats skip it for selective
    * predicates on ANY of `zcols`, not just the first. The range
    * exchange is the one shuffle; the sort is per-partition. */
  def zorderWrite(df: DataFrame, path: String, zcols: Seq[String],
      bits: Int = 8, targetFiles: Int = 0,
      bounds: Map[String, (Double, Double)] = Map.empty,
      codec: String = "zstd", rankSpace: Boolean = false): Unit = {
    val parts = if (targetFiles > 0) targetFiles
      else df.sparkSession.sparkContext.defaultParallelism
    val z = if (rankSpace) zColumnRank(df, zcols, bits)
            else zColumn(df, zcols, bits, bounds)
    df.withColumn("__z", z)
      .repartitionByRange(parts, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite)
      .option("compression", codec)
      .parquet(path)
  }
}
