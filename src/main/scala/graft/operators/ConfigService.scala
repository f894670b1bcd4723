package graft.operators

import java.nio.file.{Files, Path, Paths}
import java.util.UUID
import scala.jdk.CollectionConverters._

/** A25 — stream-config CRUD (config-service.go:59-76, 228-641).
  *
  * Same persistence model as the reference: one JSON file per stream under
  * a config directory, file named <stream_id>.json. The REST transport is
  * out of scope (SURVEY §2.A A25) — these are the same operations as plain
  * Scala calls; validation mirrors validateStream (config-service.go:
  * 670-697: file_store_type_id ∈ 1..5). Cache refresh (the rtdl_205
  * fan-out protocol, §3.2) is unnecessary: batch/streaming jobs re-read
  * the directory per batch.
  */
final class ConfigService(dir: String) {
  Files.createDirectories(Paths.get(dir))

  private def fileOf(id: String): Path = Paths.get(dir, s"$id.json")

  private def render(c: StreamConfig): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{
       |  "stream_id": ${q(c.streamId)},
       |  "stream_alt_id": ${q(c.streamAltId)},
       |  "active": ${c.active},
       |  "message_type": ${q(c.messageType)},
       |  "file_store_type_id": ${c.fileStoreTypeId},
       |  "folder_name": ${q(c.folderName)},
       |  "partition_time_id": ${c.partitionTimeId},
       |  "compression_type_id": ${c.compressionTypeId},
       |  "functions": ${q(c.functions.mkString(","))}
       |}""".stripMargin
  }

  def validate(c: StreamConfig): Unit = {
    require(c.fileStoreTypeId >= 1 && c.fileStoreTypeId <= 5,
      s"file_store_type_id must be 1..5, got ${c.fileStoreTypeId}")
    require(c.partitionTimeId >= 1 && c.partitionTimeId <= 5,
      s"partition_time_id must be 1..5, got ${c.partitionTimeId}")
    require(c.compressionTypeId >= 1 && c.compressionTypeId <= 3,
      s"compression_type_id must be 1..3, got ${c.compressionTypeId}")
  }

  /** Create: server-generates the stream_id (config-service.go:260-261). */
  def create(c: StreamConfig): StreamConfig = {
    val withId = c.copy(streamId = UUID.randomUUID().toString)
    validate(withId)
    Files.writeString(fileOf(withId.streamId), render(withId))
    withId
  }

  def update(c: StreamConfig): StreamConfig = {
    require(c.streamId.nonEmpty, "update requires stream_id")
    validate(c)
    Files.writeString(fileOf(c.streamId), render(c))
    c
  }

  def delete(id: String): Boolean = Files.deleteIfExists(fileOf(id))

  def get(spark: org.apache.spark.sql.SparkSession, id: String): Option[StreamConfig] =
    getAll(spark).find(_.streamId == id)

  def getAll(spark: org.apache.spark.sql.SparkSession): Seq[StreamConfig] = {
    val files = Files.list(Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq
    if (files.isEmpty) Seq.empty
    else StreamConfig.loadDir(spark, dir)
  }

  def getAllActive(spark: org.apache.spark.sql.SparkSession): Seq[StreamConfig] =
    getAll(spark).filter(_.active)

  def setActive(spark: org.apache.spark.sql.SparkSession, id: String, active: Boolean): Option[StreamConfig] =
    get(spark, id).map(c => update(c.copy(active = active)))
}
