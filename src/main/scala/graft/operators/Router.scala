package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A3/A4 — config-lookup routing.
  *
  * Reference (ingest-service.go:216-242, ingester.go:1565-1590): linear scan
  * of in-memory configs, matching stream_alt_id FIRST, falling back to
  * stream_id; target topic = first entry of the config's function chain +
  * "-ingress", defaulting to "ingester-ingress" (ingest-service.go:244-257).
  *
  * Spark-first: two broadcast hash joins (alt-id pass, then id pass for the
  * unmatched remainder via coalesce) — configs are O(100s), messages are the
  * 100 TB side, so the fact side never shuffles.
  */
object Router {
  val DefaultFunction = "ingester"

  /** Join envelope messages to their matching config. Adds all cfg_*
    * columns plus `route_topic` and the resolved `message_type_resolved`. */
  def route(spark: SparkSession, messages: DataFrame, configs: Seq[StreamConfig]): DataFrame = {
    val cfg = StreamConfig.toDataFrame(spark, configs)

    val byAlt = cfg.filter(col("cfg_stream_alt_id") =!= "")
      .select(col("cfg_stream_alt_id").as("alt_key"),
        struct(cfg.columns.toIndexedSeq.map(col): _*).as("cfg_alt"))
    val byId = cfg.filter(col("cfg_stream_id") =!= "")
      .select(col("cfg_stream_id").as("id_key"),
        struct(cfg.columns.toIndexedSeq.map(col): _*).as("cfg_id"))

    val joined = messages
      .join(broadcast(byAlt), messages("stream_alt_id") === byAlt("alt_key"), "left")
      .join(broadcast(byId), messages("stream_id") === byId("id_key"), "left")
      // alt-id match takes precedence over stream-id match (ingester.go:1569-1590)
      .withColumn("cfg", coalesce(col("cfg_alt"), col("cfg_id")))
      .drop("alt_key", "id_key", "cfg_alt", "cfg_id")

    val withCfg = StreamConfig.toDataFrame(spark, configs).columns
      .foldLeft(joined)((df, c) => df.withColumn(c, col("cfg").getField(c)))
      .drop("cfg")

    withCfg
      .withColumn("message_type_resolved",
        Envelope.resolvedMessageType(col("payload"), col("message_type"), col("cfg_message_type")))
      .withColumn("route_function",
        coalesce(nullif(element_at(split(col("cfg_functions"), ","), 1), lit("")),
          lit(DefaultFunction)))
      .withColumn("route_topic", concat(col("route_function"), lit("-ingress")))
  }

  /** Only messages whose matched config is active (inactive and unmatched
    * streams are dropped, mirroring ingester.go:1592-1597 error-drop). */
  def activeOnly(routed: DataFrame): DataFrame =
    routed.filter(col("cfg_active") === true)
}
