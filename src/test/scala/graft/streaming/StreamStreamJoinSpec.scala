package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream equi-join with watermarks on both sides + a time-range
  * condition bounding join state — the remaining Structured Streaming
  * join surface. */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-stream inner join within a 10-minute event-time band") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val imp = impressions.toDF().toDF("ad_id", "imp_ts")
      .withWatermark("imp_ts", "20 minutes")
    val clk = clicks.toDF().toDF("ad_id", "clk_ts")
      .withWatermark("clk_ts", "20 minutes")

    val q = imp.as("i").join(clk.as("c"),
        expr("i.ad_id = c.ad_id AND c.clk_ts >= i.imp_ts AND c.clk_ts <= i.imp_ts + INTERVAL 10 MINUTES"))
      .select(col("i.ad_id"), col("imp_ts"), col("clk_ts"))
      .writeStream.outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      impressions.addData((1L, ts("2026-01-01 10:00:00")), (2L, ts("2026-01-01 10:00:00")))
      clicks.addData((1L, ts("2026-01-01 10:05:00")))   // in band → joins
      clicks.addData((2L, ts("2026-01-01 10:30:00")))   // out of band → dropped
      q.processAllAvailable()
      val rows = spark.table("ssj_out").select("ad_id").as[Long].collect().toSeq
      assert(rows == Seq(1L))
    } finally q.stop()
  }
}
