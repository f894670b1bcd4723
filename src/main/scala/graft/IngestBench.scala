package graft

import graft.operators.{IngestPipeline, StreamConfig, TimePartitions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ingest hot-path throughput (SURVEY §3.1): raw JSON → envelope →
  * routing → pii masking → time-partitioned parquet lake, measured
  * end-to-end in messages/second. The reference's model is one message =
  * one Kafka round-trip + one parquet file (ingester.go:568-606) through
  * six process boundaries; this is the single-plan equivalent.
  *
  * Usage: IngestBench [sfDir] — builds realistic JSON payloads from the
  * events table, runs one warmup + one timed batch, prints a JSON line.
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cfg = StreamConfig("s-bench", "bench-key", active = true, "event", 1,
      "benchlake", TimePartitions.Daily, 1, Seq("pii-detection", "ingester"))

    def messages(dir: String) = Tables.events(spark, dir)
      .select(to_json(struct(
        lit("bench-key").as("projectId"),
        lit("event").as("type"),
        col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))).as("json"))

    def run(dir: String): (Long, Double) = {
      val raw = messages(dir)
      val n = raw.count()
      val dest = java.nio.file.Files.createTempDirectory("graft-ingest-bench").toString
      val t0 = System.nanoTime()
      IngestPipeline.runBatch(spark, raw, "json", Seq(cfg), dest,
        registerTables = false)
      val secs = (System.nanoTime() - t0) / 1e9
      // correctness floor: everything routable landed
      val landed = spark.read.parquet(s"$dest/benchlake/event").count()
      require(landed == n, s"landed $landed of $n")
      (n, secs)
    }

    run("/root/testdata/sf0.001") // warmup: codegen + classloading
    val (n, secs) = run(sfDir)
    println(f"""{"metric":"ingest_msgs_per_sec","value":${n / secs}%.0f,"messages":$n,"sec":$secs%.2f}""")
    spark.stop()
  }
}
