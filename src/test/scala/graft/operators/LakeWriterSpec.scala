package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LakeWriterSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = StreamConfig("s-1", "", active = true, "metric", 1,
    "lakespec", TimePartitions.Daily, 1, Seq("ingester"))

  private def writeTwoDays(dest: String): String = {
    val mkBatch = (day: String, v: Int) => Seq(
      s"""{"stream_id":"s-1","type":"metric","v":$v,"day":"$day"}""").toDF("json")
    IngestPipeline.runBatch(spark, mkBatch("d1", 1), "json", Seq(cfg), dest,
      tsCol = to_timestamp(lit("2026-08-10 10:00:00")), registerTables = false)
    IngestPipeline.runBatch(spark, mkBatch("d2", 2), "json", Seq(cfg), dest,
      tsCol = to_timestamp(lit("2026-08-11 10:00:00")), registerTables = false)
    s"$dest/lakespec/metric"
  }

  test("partition pruning: a filter on the time bucket prunes partitions at scan") {
    val path = writeTwoDays(Files.createTempDirectory("graft-lw").toString)
    val df = spark.read.parquet(path).filter(col("part") === "2026-08-11")
    assert(df.select("v").as[Double].collect().toSeq == Seq(2.0))
    val scan = df.queryExecution.executedPlan.toString
    // partition filter must land in PartitionFilters, not a post-scan Filter
    assert(scan.contains("PartitionFilters: [isnotnull(part"), scan.take(1500))
  }

  test("compression codec per config reaches the files") {
    val dest = Files.createTempDirectory("graft-lw").toString
    IngestPipeline.runBatch(spark,
      Seq("""{"stream_id":"s-1","type":"metric","v":9}""").toDF("json"), "json",
      Seq(cfg.copy(compressionTypeId = 2)), dest,
      tsCol = to_timestamp(lit("2026-08-10 10:00:00")), registerTables = false)
    val files = new java.io.File(s"$dest/lakespec/metric/part=2026-08-10").listFiles()
    assert(files.exists(_.getName.contains(".gz.parquet")), files.map(_.getName).mkString(","))
  }

  test("compact: rewrites to fewer files, preserves rows and partition column") {
    val dest = Files.createTempDirectory("graft-lw").toString
    // ten tiny appends → ten+ small files
    (1 to 10).foreach { i =>
      IngestPipeline.runBatch(spark,
        Seq(s"""{"stream_id":"s-1","type":"metric","v":$i}""").toDF("json"), "json",
        Seq(cfg), dest, tsCol = to_timestamp(lit("2026-08-10 10:00:00")),
        registerTables = false)
    }
    val path = s"$dest/lakespec/metric"
    val before = spark.read.parquet(path)
    val filesBefore = before.inputFiles.length
    val rowsBefore = before.count()
    LakeWriter.compact(spark, path)
    val after = spark.read.parquet(path)
    assert(after.count() == rowsBefore)
    assert(after.inputFiles.length < filesBefore)
    assert(after.columns.contains("part"))
  }

  test("compact with zorderBy re-clusters: same rows, y-band skips files") {
    val dir = Files.createTempDirectory("graft-lake-zorder").toString
    // x-striped appends: the worst layout for y predicates
    (0 until 4).foreach { stripe =>
      val rows = for (x <- stripe * 16 until (stripe + 1) * 16; y <- 0 until 64)
        yield (x.toLong, y.toLong)
      rows.toDF("x", "y").write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    LakeWriter.compact(spark, dir, zorderBy = Seq("x", "y"), zorderBits = 6,
      targetFiles = 16)
    val after = spark.read.parquet(dir)
    assert(after.as[(Long, Long)].collect().toSet == before)
    val hit = after.groupBy(input_file_name().as("f"))
      .agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
      .filter(col("lo") <= 15 && col("hi") >= 8)
      .count()
    val files = after.select(input_file_name()).distinct().count()
    assert(files >= 8, s"expected multiple output files, got $files")
    assert(hit * 2 <= files, s"y-band should skip half the files: $hit of $files")
  }

  test("analyzeTable: catalog stats feed the CBO (row count + column stats visible)") {
    val dir = Files.createTempDirectory("graft-lake-stats").toString
    spark.range(0, 1000).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(dir)
    val table = "rtdl_stats_spec"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    LakeWriter.registerTable(spark, table, dir)
    LakeWriter.analyzeTable(spark, table, columns = Seq("id", "k"))
    // the optimizer only CONSUMES catalog stats under CBO
    val saved = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    try {
      val stats = spark.table(table).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(1000)),
        s"row count must reach the optimizer: ${stats.rowCount}")
    } finally spark.conf.set("spark.sql.cbo.enabled", saved)
    val described = spark.sql(s"DESCRIBE EXTENDED $table k").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(described.get("distinct_count").exists(_.toLong >= 6),
      s"column NDV must be collected: $described")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
