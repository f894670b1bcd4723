package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deletion-vector vs copy-on-write DELETE cost probe — the number the
  * feature exists for: a k-row delete scattered through a large table
  * should cost O(k) dv rows written (plus the pruned probe scan), while
  * copy-on-write re-stages every touched file's bytes. Builds twin
  * lineitem-backed TxLogTables, deletes the same sparse predicate from
  * both, and reports per-path commit latency, bytes written by the
  * commit, and the post-delete read cost (the dv table pays the
  * anti-join until purge).
  *
  * Run: java … graft.DvProbe [sfDir] [runs]
  */
object DvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-dv-probe")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TxLogTable

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_returnflag"))
    val maxK = li.agg(max(col("l_orderkey"))).first().getLong(0)
    val step = maxK / 8 + 1

    def build(path: String): Unit = {
      val root = new org.apache.hadoop.fs.Path(path)
      root.getFileSystem(spark.sessionState.newHadoopConf())
        .delete(root, true)
      for (i <- 0 until 8)
        TxLogTable.append(spark,
          li.filter(col("l_orderkey") >= i * step &&
            col("l_orderkey") < (i + 1) * step).coalesce(1), path)
    }

    // one matching row per ~40k: sparse, every file touched — the
    // worst case for copy-on-write, the design case for dv
    val pred = col("l_orderkey") % 4001 === 0 && col("l_suppkey") % 10 === 3
    val matchRows = li.filter(pred).count()

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val results = (1 to runs).map { _ =>
      val cowPath = "/tmp/graft_dvprobe_cow"
      val dvPath = "/tmp/graft_dvprobe_dv"
      build(cowPath); build(dvPath)

      val t0 = System.nanoTime()
      TxLogTable.deleteWhere(spark, cowPath, pred)
      val cowSec = (System.nanoTime() - t0) / 1e9
      // bytes the COW commit wrote = files in the new head absent from
      // the pre-delete snapshot (log-recorded sizes, no FS stats)
      val cowWritten = {
        val (f0, _) = TxLogTable.snapshotWithSizes(cowPath, 7)
        val (f1, s1) = TxLogTable.snapshotWithSizes(cowPath,
          TxLogTable.currentVersion(cowPath))
        f1.diff(f0).map(s1.getOrElse(_, 0L)).sum
      }

      val t1 = System.nanoTime()
      TxLogTable.deleteWhereDv(spark, dvPath, pred)
      val dvSec = (System.nanoTime() - t1) / 1e9
      // bytes the dv commit wrote = the dv sidecar dir(s)
      val dvWritten = {
        val dvs = TxLogTable.deletionVectors(dvPath,
          TxLogTable.currentVersion(dvPath))
        val hconf = spark.sessionState.newHadoopConf()
        dvs.values.map(_._1).toSeq.distinct.map { d =>
          val p = new org.apache.hadoop.fs.Path(s"$dvPath/$d")
          p.getFileSystem(hconf).getContentSummary(p).getLength
        }.sum
      }

      def readSec(path: String): Double = {
        val t = System.nanoTime()
        TxLogTable.read(spark, path).agg(sum(col("l_quantity"))).first()
        (System.nanoTime() - t) / 1e9
      }
      val cowRead = readSec(cowPath)
      val dvRead = readSec(dvPath)
      // concentrated delete: masks land in ONE of the 8 files — the
      // split read scans the other 7 plain, so the anti-join penalty
      // is proportional to MASKED-file bytes, not table bytes
      val dv1Path = "/tmp/graft_dvprobe_dv1"
      build(dv1Path)
      TxLogTable.deleteWhereDv(spark, dv1Path,
        col("l_orderkey") < step && col("l_orderkey") % 1001 === 0)
      val dv1Read = readSec(dv1Path)
      // LARGE mask (~a third of the table, typically ≥1M rows at
      // sf0.1+): the build side overflows the byte budget, so the
      // anti-join must take the shuffled path with the
      // dictionary-encoded (int, long) keys — the read should degrade
      // gracefully, not OOM an executor on a broadcast of path strings
      val dvBigPath = "/tmp/graft_dvprobe_dvbig"
      build(dvBigPath)
      val bigDeleted = li.filter(col("l_suppkey") % 3 === 0).count()
      TxLogTable.deleteWhereDv(spark, dvBigPath,
        col("l_suppkey") % 3 === 0)
      val dvBigRead = readSec(dvBigPath)
      // UPDATE through dvs vs copy-on-write: same sparse predicate —
      // the dv path writes O(k) masks + O(k) image rows; c-o-w
      // re-stages every touched file's bytes
      val cowUpPath = "/tmp/graft_dvprobe_cowup"
      val dvUpPath = "/tmp/graft_dvprobe_dvup"
      build(cowUpPath); build(dvUpPath)
      val upSet = Map("l_quantity" -> (col("l_quantity") + lit(1.0)))
      val tu0 = System.nanoTime()
      TxLogTable.updateWhere(spark, cowUpPath, upSet, pred)
      val cowUpSec = (System.nanoTime() - tu0) / 1e9
      val cowUpWritten = {
        val (f0, _) = TxLogTable.snapshotWithSizes(cowUpPath, 7)
        val (f1, s1) = TxLogTable.snapshotWithSizes(cowUpPath,
          TxLogTable.currentVersion(cowUpPath))
        f1.diff(f0).map(s1.getOrElse(_, 0L)).sum
      }
      val tu1 = System.nanoTime()
      TxLogTable.updateWhereDv(spark, dvUpPath, upSet, pred)
      val dvUpSec = (System.nanoTime() - tu1) / 1e9
      val dvUpWritten = {
        val (f0, _) = TxLogTable.snapshotWithSizes(dvUpPath, 7)
        val (f1, s1) = TxLogTable.snapshotWithSizes(dvUpPath,
          TxLogTable.currentVersion(dvUpPath))
        val images = f1.diff(f0).map(s1.getOrElse(_, 0L)).sum
        val hconf = spark.sessionState.newHadoopConf()
        val dvBytes = TxLogTable.deletionVectors(dvUpPath,
            TxLogTable.currentVersion(dvUpPath))
          .values.map(_._1).toSeq.distinct.map { d =>
            val p = new org.apache.hadoop.fs.Path(s"$dvUpPath/$d")
            p.getFileSystem(hconf).getContentSummary(p).getLength
          }.sum
        images + dvBytes
      }
      (cowSec, dvSec, cowWritten, dvWritten, cowRead, dvRead, dv1Read,
        dvBigRead, bigDeleted, cowUpSec, dvUpSec, cowUpWritten,
        dvUpWritten)
    }

    val cowSec = median(results.map(_._1))
    val dvSec = median(results.map(_._2))
    val cowRead = median(results.map(_._5))
    val dvRead = median(results.map(_._6))
    val dv1Read = median(results.map(_._7))
    val dvBigRead = median(results.map(_._8))
    val cowUpSec = median(results.map(_._10))
    val dvUpSec = median(results.map(_._11))
    println(f"""{"probe":"dv_delete","sf_dir":"$sfDir","rows_deleted":$matchRows,""" +
      f""""cow_delete_sec":$cowSec%.3f,"dv_delete_sec":$dvSec%.3f,""" +
      f""""cow_bytes_written":${results.head._3},""" +
      f""""dv_bytes_written":${results.head._4},""" +
      f""""cow_read_sec":$cowRead%.3f,"dv_read_sec_all_masked":$dvRead%.3f,""" +
      f""""dv_read_sec_one_masked":$dv1Read%.3f,""" +
      f""""big_mask_rows":${results.head._9},""" +
      f""""dv_read_sec_big_mask":$dvBigRead%.3f,""" +
      f""""cow_update_sec":$cowUpSec%.3f,"dv_update_sec":$dvUpSec%.3f,""" +
      f""""cow_update_bytes":${results.head._12},""" +
      f""""dv_update_bytes":${results.head._13}}""")
    spark.stop()
  }
}
