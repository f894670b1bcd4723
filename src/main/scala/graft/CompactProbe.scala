package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scoped-vs-full OPTIMIZE cost probe — the number incremental
  * compaction exists for: `OPTIMIZE … WHERE <one partition>` on an
  * N-partition table must cost ~1/N of the blanket rewrite (wall clock
  * AND bytes staged), because every out-of-scope file carries into the
  * rebase by reference. Builds a date-bucket-partitioned lineitem
  * TxLogTable with many small files per partition, then times (a) a
  * full OPTIMIZE, (b) a single-partition `where` OPTIMIZE, and (c) a
  * `minFileMB` small-files-only pass on a mixed layout, reporting
  * wall-clock and log-recorded bytes rewritten per form.
  *
  * Run: java … graft.CompactProbe [sfDir]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-compact-probe")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLogTable

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"),
        (col("l_orderkey") % 8).cast("string").as("bucket"))

    def build(path: String): Unit = {
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(root, true)
      // 6 appends × 8 partitions = 48 small files
      for (i <- 0 until 6)
        TxLogTable.append(spark,
          li.filter(col("l_partkey") % 6 === i).repartition(1),
          path, partitionBy = Seq("bucket"))
    }

    def rewrittenBytes(path: String, v: Long): Long = {
      val before = TxLogTable.filesAt(path, v - 1).toSet
      val (files, sizes) = TxLogTable.snapshotWithSizes(path, v)
      files.filterNot(before).map(f => sizes.getOrElse(f, 0L)).sum
    }

    def time[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"  $what: $dt%.2f s")
      (r, dt)
    }

    // (a) blanket OPTIMIZE — the round-16 posture
    val full = "/tmp/graft_cprobe_full"
    build(full)
    val (fv, fullS) = time("full OPTIMIZE (rewrite everything)") {
      TxLogTable.compact(spark, full, targetFiles = 8,
        partitionBy = Seq("bucket"))
    }
    val fullBytes = rewrittenBytes(full, fv)

    // (b) one-partition scoped OPTIMIZE on an identical table
    val scoped = "/tmp/graft_cprobe_scoped"
    build(scoped)
    val (sv, scopedS) = time("scoped OPTIMIZE WHERE bucket = '3'") {
      TxLogTable.compact(spark, scoped, targetFiles = 1,
        where = Some(col("bucket") === "3"))
    }
    val scopedBytes = rewrittenBytes(scoped, sv)
    val carried = TxLogTable.filesAt(scoped, sv - 1)
      .filterNot(_.contains("bucket=3"))
      .forall(TxLogTable.filesAt(scoped, sv).contains)
    require(carried, "out-of-scope files must carry by reference")

    // (c) small-files-only pass over a mixed layout: a few big
    // already-compacted files plus fresh small appends — only the
    // small ones may rewrite
    val mixed = "/tmp/graft_cprobe_mixed"
    val mixedRoot = new org.apache.hadoop.fs.Path(mixed)
    mixedRoot.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(mixedRoot, true)
    TxLogTable.append(spark, li.drop("bucket").coalesce(4), mixed)
    for (i <- 0 until 4)
      TxLogTable.append(spark,
        li.drop("bucket").filter(col("l_partkey") % 479 === i)
          .repartition(1), mixed)
    val headBefore = TxLogTable.currentVersion(mixed)
    val bigFiles = {
      val (files, sizes) = TxLogTable.snapshotWithSizes(mixed, headBefore)
      files.filter(f => sizes.getOrElse(f, 0L) >= (1L << 20))
    }
    require(bigFiles.nonEmpty, "fixture needs >=1MB files")
    val (mv, minS) = time("small-files-only OPTIMIZE (minFileMB = 1)") {
      TxLogTable.compact(spark, mixed, targetFiles = 1, minFileMB = 1)
    }
    val minBytes = if (mv < 0) 0L else rewrittenBytes(mixed, mv)
    val bigCarried = mv < 0 ||
      bigFiles.forall(TxLogTable.filesAt(mixed, mv).contains)
    require(bigCarried, "over-target files must carry by reference")

    println(f"full:   ${fullS}%.2f s, ${fullBytes / 1e6}%.1f MB rewritten")
    println(f"scoped: ${scopedS}%.2f s, ${scopedBytes / 1e6}%.1f MB rewritten " +
      f"(${fullBytes.toDouble / math.max(1, scopedBytes)}%.1fx less data)")
    println(f"minFileMB: ${minS}%.2f s, ${minBytes / 1e6}%.1f MB rewritten " +
      "(big files carried by reference)")

    // (d) per-bin overhead flatness: compactIncremental carries the
    // post-commit state forward locally, so 8x the bin count must cost
    // ~8x the wall clock (flat per-bin), not 8x-and-growing log replay
    def buildBins(path: String, parts: Int): Unit = {
      val r = new org.apache.hadoop.fs.Path(path)
      r.getFileSystem(spark.sessionState.newHadoopConf()).delete(r, true)
      for (i <- 0 until 2)
        TxLogTable.append(spark,
          li.withColumn("pb", (col("l_orderkey") % parts).cast("string"))
            .filter(col("l_partkey") % 50 === i).drop("bucket")
            .repartition(1), path, partitionBy = Seq("pb"))
    }
    val bins8 = "/tmp/graft_cprobe_bins8"
    buildBins(bins8, 8)
    val (v8, t8) = time("compactIncremental, 8 bins") {
      TxLogTable.compactIncremental(spark, bins8, minFileMB = 1)
    }
    require(v8.size == 8, s"expected 8 bin commits, got ${v8.size}")
    val bins64 = "/tmp/graft_cprobe_bins64"
    buildBins(bins64, 64)
    val (v64, t64) = time("compactIncremental, 64 bins") {
      TxLogTable.compactIncremental(spark, bins64, minFileMB = 1)
    }
    require(v64.size == 64, s"expected 64 bin commits, got ${v64.size}")
    println(f"per-bin: ${t8 / 8}%.3f s at 8 bins vs " +
      f"${t64 / 64}%.3f s at 64 bins " +
      f"(${(t64 / 64) / (t8 / 8)}%.2fx — flat is the target)")
    spark.stop()
  }
}
