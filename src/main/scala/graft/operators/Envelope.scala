package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ingest envelope + message-type semantics.
  *
  * A2 (ingest-service.go:167-206): wrap arbitrary JSON in the envelope
  * {stream_id, stream_alt_id, message_type, payload}. Identity precedence:
  * payload.projectId → stream_alt_id, else payload.writeKey
  * (ingest-service.go:179-189).
  *
  * A8 (ingester.go:1492-1517): message-type precedence
  * payload.type > envelope message_type > config message_type > "rtdl_default".
  * Empty strings count as absent (the reference checks != "").
  *
  * A7 (ingester.go:1551-1561): message_type == "rtdl_205" is the config-
  * reload control message — filtered out of the data path.
  *
  * All pure column expressions → codegen'd, no UDFs, scale-free.
  */
object Envelope {
  val ControlMessageType = "rtdl_205"
  val DefaultMessageType = "rtdl_default"

  private def nonEmpty(c: Column): Column = when(c.isNotNull && c =!= "", c)

  /** A2: raw JSON documents (one per row in `jsonCol`) → envelope columns.
    * The full original message is preserved verbatim as `payload`.
    * json_tuple extracts all four fields in ONE parse of the document
    * (4 separate get_json_object calls parse the JSON 4×). */
  def project(raw: DataFrame, jsonCol: String = "json"): DataFrame = {
    val j = col(jsonCol)
    raw.select(
        json_tuple(j, "stream_id", "projectId", "writeKey", "type")
          .as(Seq("__sid", "__pid", "__wk", "__type")),
        j.as("payload"))
      .select(
        nonEmpty(col("__sid")).as("stream_id"),
        coalesce(nonEmpty(col("__pid")), nonEmpty(col("__wk"))).as("stream_alt_id"),
        nonEmpty(col("__type")).as("message_type"),
        col("payload"))
  }

  /** A8: resolved message type; `cfgMessageType` is the matched config's
    * message_type column (nullable after routing join). */
  def resolvedMessageType(
      payload: Column, messageType: Column, cfgMessageType: Column): Column =
    coalesce(
      nonEmpty(get_json_object(payload, "$.type")),
      nonEmpty(messageType),
      nonEmpty(cfgMessageType),
      lit(DefaultMessageType))

  /** A7: drop control messages from the data path. */
  def filterControl(df: DataFrame, messageTypeCol: String = "message_type"): DataFrame =
    df.filter(col(messageTypeCol).isNull || col(messageTypeCol) =!= ControlMessageType)

  /** A7 dual: the control messages themselves (trigger config reload). */
  def controlMessages(df: DataFrame, messageTypeCol: String = "message_type"): DataFrame =
    df.filter(col(messageTypeCol) === ControlMessageType)
}
