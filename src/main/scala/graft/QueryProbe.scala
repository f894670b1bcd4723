package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one named query and optionally dump its formatted plan.
  * Usage: QueryProbe <sfDir> <queryName> [runs] [explain]. */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val explain = args.contains("explain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup at the smallest SF (JIT, codegen, classloading);
    // overridable so the tool works on any layout (ADVICE r18)
    SparkEntry.queries(name)(spark,
        sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001"))
      .write.format("noop").mode("overwrite").save()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    if (explain)
      println(SparkEntry.queries(name)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
