package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Read-path throughput probe for the `graftlog` connector: the same
  * aggregation over the same rows through (a) a raw parquet scan — the
  * ceiling, Spark's native vectorized reader with nothing in between —
  * and (b) the connector. With the log-backed-FileIndex architecture
  * the two plans are the SAME physical operator (`FileSourceScanExec`),
  * so (b) should sit at the ceiling; the retired V1
  * `PrunedFilteredScan` shape paid an external-Row round-trip per row
  * here. Also times a selective filtered read, where the connector
  * should BEAT raw parquet: the log-level stats skipping prunes files
  * before any footer opens.
  *
  * Run: java … graft.ConnectorProbe [sfDir] [runs]
  */
object ConnectorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val runs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-connector-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val path = "/tmp/graft_connector_probe"
    val root = new org.apache.hadoop.fs.Path(path)
    root.getFileSystem(spark.sessionState.newHadoopConf()).delete(root, true)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // 16 commits of disjoint orderkey ranges → file-level skipping has
    // something to skip on the selective read
    val maxK = li.agg(max(col("l_orderkey"))).first().getLong(0)
    val step = maxK / 16 + 1
    for (i <- 0 until 16)
      graft.operators.TxLogTable.append(spark,
        li.filter(col("l_orderkey") >= i * step &&
          col("l_orderkey") < (i + 1) * step).coalesce(2), path)
    val n = li.count()

    def time(label: String)(f: => Long): Double = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val r = f
        val dt = (System.nanoTime() - t0) / 1e9
        require(r > 0, s"$label returned $r")
        dt
      }
      val best = ts.min
      println(f"[connector-probe] $label%-28s min=${best}%6.3f s " +
        f"(${ts.map(t => f"$t%.2f").mkString(", ")})  rows=$n")
      best
    }

    val full = time("parquet full-agg") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))
        .collect().head.get(0).toString.toDouble.toLong
    }
    val conn = time("graftlog full-agg") {
      spark.read.format("graftlog").load(path)
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")))
        .collect().head.get(0).toString.toDouble.toLong
    }
    val selRaw = time("parquet selective") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .filter(col("l_orderkey") >= 3 * step && col("l_orderkey") < 4 * step)
        .agg(count(lit(1))).collect().head.getLong(0)
    }
    val selConn = time("graftlog selective") {
      spark.read.format("graftlog").load(path)
        .filter(col("l_orderkey") >= 3 * step && col("l_orderkey") < 4 * step)
        .agg(count(lit(1))).collect().head.getLong(0)
    }
    println(f"[connector-probe] full-scan ratio conn/parquet = ${conn / full}%.2fx")
    println(f"[connector-probe] selective ratio conn/parquet = ${selConn / selRaw}%.2fx")

    // ---- many-file FIRST-PLAN listing: the metadata storm probe ----
    // A wide table (many small files over many commits): time the cost
    // of a FRESH relation's first plan — schema + sizeInBytes + split
    // listing — which the log now serves without statting or opening
    // any data file. Compare against raw parquet's InMemoryFileIndex
    // listing + mergeSchema-style footer path over the same files.
    val widePath = "/tmp/graft_connector_probe_wide"
    val wroot = new org.apache.hadoop.fs.Path(widePath)
    wroot.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(wroot, true)
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("user_id"), col("event_type"))
    for (_ <- 0 until 8)
      graft.operators.TxLogTable.append(spark, events.limit(20000)
        .repartition(32), widePath)
    val wideFiles = graft.operators.TxLogTable.snapshotWithSizes(widePath,
      graft.operators.TxLogTable.currentVersion(widePath))._1
    val nFiles = wideFiles.size
    def timePlan(label: String)(f: => Unit): Double = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[connector-probe] $label%-28s min=${ts.min}%6.3f s " +
        f"(${ts.map(t => f"$t%.2f").mkString(", ")})  files=$nFiles")
      ts.min
    }
    val planRaw = timePlan("parquet first-plan (wide)") {
      // the pre-log-metadata cost: an explicit-file-list read (the
      // scanFiles shape) stats every path and mergeSchema opens every
      // footer before the first plan
      spark.read.option("mergeSchema", true)
        .parquet(wideFiles.map(f => s"$widePath/$f"): _*)
        .filter(col("event_id") >= 0).rdd.getNumPartitions
    }
    val planConn = timePlan("graftlog first-plan (wide)") {
      spark.read.format("graftlog").load(widePath)
        .filter(col("event_id") >= 0).rdd.getNumPartitions
    }
    println(f"[connector-probe] first-plan ratio conn/parquet = " +
      f"${planConn / planRaw}%.2fx (log metadata vs listing+footers)")
    spark.stop()
  }
}
