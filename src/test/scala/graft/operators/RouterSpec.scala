package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RouterSpec extends SparkSpec {
  import spark.implicits._

  private val configs = Seq(
    StreamConfig("id-1", "", active = true, "t1", 1, "", 2, 1, Seq("ingester")),
    StreamConfig("id-2", "alt-2", active = true, "t2", 1, "", 2, 1, Seq("pii-detection", "ingester")),
    StreamConfig("id-3", "alt-3", active = false, "t3", 1, "", 2, 1, Seq()))

  private def msgs(rows: (String, String)*) =
    rows.toDF("stream_id", "stream_alt_id")
      .withColumn("message_type", lit(""))
      .withColumn("payload", lit("{}"))

  test("A3: stream_alt_id matched before stream_id") {
    // message claims alt-2 but stream_id id-1: alt match must win
    val r = Router.route(spark, msgs(("id-1", "alt-2")), configs)
    assert(r.head().getAs[String]("cfg_stream_id") == "id-2")
  }

  test("A3: falls back to stream_id when alt unmatched") {
    val r = Router.route(spark, msgs(("id-1", "no-such-alt")), configs)
    assert(r.head().getAs[String]("cfg_stream_id") == "id-1")
  }

  test("A4: topic = first function + -ingress; default ingester-ingress") {
    val r = Router.route(spark, msgs(("id-2", null), ("id-3", null)), configs)
      .select("stream_id", "route_topic").as[(String, String)].collect().toMap
    assert(r("id-2") == "pii-detection-ingress")
    assert(r("id-3") == "ingester-ingress") // empty chain → default
  }

  test("activeOnly drops inactive and unmatched streams") {
    val r = Router.activeOnly(Router.route(spark,
      msgs(("id-1", null), ("id-3", null), ("unknown", null)), configs))
    assert(r.select("stream_id").as[String].collect().toSeq == Seq("id-1"))
  }

  test("routing join stays broadcast (no shuffle of the message side)") {
    val plan = Router.route(spark, msgs(("id-1", null)), configs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
