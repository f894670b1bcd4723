package graft.streaming

import graft.SparkSpec

/** A5/A6 analysis-level checks. The connector jar is absent in this
  * environment (documented divergence, SURVEY §7.3), so these assert the
  * wiring is correct up to DataSource resolution: the entry points reach
  * Spark's provider lookup asking for "kafka" — the registered name of
  * spark-sql-kafka — and fail there with the provider-not-found error,
  * not with an option/plan-construction error. With the jar on the
  * classpath the same calls resolve and run. */
class KafkaWiringSpec extends SparkSpec {

  private def providerNotFound(t: Throwable): Boolean = {
    val msgs = Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    msgs.contains("kafka") &&
      (msgs.contains("Failed to find data source") ||
        msgs.contains("Failed to find the data source") ||
        msgs.contains("DATA_SOURCE_NOT_FOUND") ||
        msgs.contains("ClassNotFound"))
  }

  test("kafkaSource resolves the 'kafka' DataSource (provider-not-found without the jar)") {
    val e = intercept[Throwable] {
      StreamingOps.kafkaSource(spark, "broker:9092", "ingress-topic")
    }
    assert(providerNotFound(e), e.toString)
  }

  test("kafkaSink resolves the 'kafka' sink provider at start") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("m1")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-kafka-ckpt").toString
    val e = intercept[Throwable] {
      StreamingOps.kafkaSink(mem.toDF().selectExpr("value"),
        "broker:9092", "egress-topic", ckpt).start()
    }
    assert(providerNotFound(e), e.toString)
  }
}
