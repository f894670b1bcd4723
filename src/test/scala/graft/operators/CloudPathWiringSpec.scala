package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A13-A16 analysis-level checks. No cloud connector jars exist in this
  * environment (documented divergence), so these assert the wiring up to
  * Hadoop FileSystem resolution: the scheme-agnostic `destRoot` flows
  * through LakeWriter's path construction untouched and fails at the
  * scheme lookup (the exact point where a deployment with hadoop-aws /
  * gcs-connector / hadoop-azure jars succeeds), not in our code. */
class CloudPathWiringSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = StreamConfig("s-cloud", "", active = true, "pageview", 2,
    "web", TimePartitions.Daily, 1, Seq("ingester"))

  private def schemeUnresolved(t: Throwable, hint: String): Boolean = {
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ").toLowerCase
    msgs.contains(hint) &&
      (msgs.contains("no filesystem for scheme") ||
        msgs.contains("classnotfound") || msgs.contains("not found"))
  }

  test("s3a/gs/wasbs destRoots reach Hadoop FileSystem scheme resolution") {
    val msgs = Seq(("""{"url":"/a"}""", "pageview"))
      .toDF("payload", "message_type_resolved")
    // hint = scheme or the provider class family Hadoop names in the error
    Seq("s3a" -> "s3a://bucket/root", "gs" -> "gs://bucket/root",
        "azure" -> "wasbs://c@a.blob.core.windows.net/root").foreach {
      case (hint, root) =>
        val e = intercept[Throwable] {
          LakeWriter.writeStreamTable(spark, msgs, cfg, root,
            tsCol = to_timestamp(lit("2026-08-12 10:00:00")), registerTables = false)
        }
        assert(schemeUnresolved(e, hint), s"$hint: $e")
    }
  }
}
