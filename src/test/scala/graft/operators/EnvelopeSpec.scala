package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  private def env(docs: String*) =
    Envelope.project(docs.toDF("json"))

  test("A2: projectId wins over writeKey for stream_alt_id") {
    val r = env("""{"projectId":"p1","writeKey":"w1","stream_id":"s1"}""").head()
    assert(r.getAs[String]("stream_alt_id") == "p1")
    assert(r.getAs[String]("stream_id") == "s1")
  }

  test("A2: writeKey used when projectId absent or empty") {
    assert(env("""{"writeKey":"w1"}""").head().getAs[String]("stream_alt_id") == "w1")
    assert(env("""{"projectId":"","writeKey":"w1"}""").head().getAs[String]("stream_alt_id") == "w1")
  }

  test("A2: payload preserves the original message verbatim") {
    val doc = """{"stream_id":"s","name":"user1","array":[1,2,3],"properties":{"age":20}}"""
    assert(env(doc).head().getAs[String]("payload") == doc)
  }

  test("A8: payload.type > message_type > config message_type > rtdl_default") {
    val df = Seq(
      ("""{"type":"pt"}""", "mt", "ct"),
      ("""{}""", "mt", "ct"),
      ("""{}""", "", "ct"),
      ("""{}""", "", ""),
      ("""{"type":""}""", "", null.asInstanceOf[String])
    ).toDF("payload", "message_type", "cfg_message_type")
      .select(Envelope.resolvedMessageType(
        col("payload"), col("message_type"), col("cfg_message_type")).as("t"))
    assert(df.as[String].collect().toSeq == Seq("pt", "mt", "ct", "rtdl_default", "rtdl_default"))
  }

  test("A7: rtdl_205 control messages split from the data path") {
    val df = Seq("normal", "rtdl_205", "other").toDF("message_type")
    assert(Envelope.filterControl(df).count() == 2)
    assert(Envelope.controlMessages(df).count() == 1)
  }
}
