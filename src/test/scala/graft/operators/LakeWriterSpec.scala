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
}
