package graft.streaming

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.operators.{ConfigService, StreamConfig}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.SparkSession

/** HTTP transports for the two reference front doors, on the JDK's
  * built-in server (no new dependencies; Jackson rides in with Spark).
  *
  *  - A1  ingest endpoint  (ingest-service.go:152-279): `POST /ingest`
  *    accepts an arbitrary JSON message and spools it — compacted to one
  *    line — into a drop directory consumed by
  *    [[StreamingOps.startIngest]]. The reference wraps the message in the
  *    {stream_id, stream_alt_id, message_type, payload} envelope at the
  *    transport; here the transport stays dumb and the SAME wrap runs
  *    inside the Spark plan ([[graft.operators.Envelope.project]]) — the
  *    dataflow is identical, the work just happens where it scales.
  *    `POST /refreshCache` (processingType "cache-refresh",
  *    ingest-service.go:259-273) spools the rtdl_205 control line; config
  *    reload is per-batch in startIngest, and A7 filters the control row.
  *
  *  - A25 config CRUD      (config-service.go:59-76): the reference's
  *    eleven routes over [[graft.operators.ConfigService]], same paths,
  *    same methods, same JSON field names; enum listings serve the values
  *    of /root/reference/constants/{file_store_types,partition_times,
  *    compression_types}.json.
  */
object HttpTransports {

  private val mapper = new ObjectMapper()

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), UTF_8)

  private def err(msg: String): String =
    mapper.createObjectNode().put("error", msg).toString

  /** Base for both servers: ephemeral-port bind, sequential executor
    * (config CRUD is metadata-rate traffic; ingest spool is append-only
    * and benefits from single-writer ordering). */
  abstract class Server(port: Int) {
    // disable Nagle on the server's sockets — must be set before the JDK
    // reads it (once per JVM, at ServerConfig class load inside the first
    // HttpServer.create): without it every small response pays a ~40ms
    // Nagle/delayed-ACK stall under concurrent load, capping ANY client
    // mix near ~360 req/s (measured 16-client: 360 → 11.8k req/s)
    System.setProperty("sun.net.httpserver.nodelay", "true")
    protected val server: HttpServer =
      HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.setExecutor(null)

    def start(): this.type = { server.start(); this }
    def stop(): Unit = server.stop(0)
    /** Bound port (use port=0 to let the OS pick). */
    def boundPort: Int = server.getAddress.getPort
  }

  /** A1 — `POST /ingest` + `POST /refreshCache` writing one-line JSON
    * into `spoolDir`, the drop-directory source of startIngest.
    *
    * The spool is SHARDED BY STREAM IDENTITY across `shards` append
    * files: all messages of one stream land in one file in arrival order
    * (the ordering the reference's per-stream Kafka partition gives,
    * ingest-service.go:214-236), while different streams append in
    * parallel — a single append file serializes every request through
    * one lock and caps single-node ingress. Each shard holds its channel
    * open (no per-message open/close); when a message's HTTP 200 is sent
    * its line is in the OS page cache (process-crash durable; pass
    * `fsync = true` for power-crash durability at per-message syscall
    * cost — see [[ShardedSpool]]). */
  final class IngestServer(spoolDir: String, port: Int = 0, shards: Int = 8,
      poolThreads: Int = 8, fsync: Boolean = false) extends Server(port) {
    private val pool = java.util.concurrent.Executors.newFixedThreadPool(poolThreads)
    server.setExecutor(pool)
    private val spool = new ShardedSpool(spoolDir, shards, fsyncOnAppend = fsync)
    /** Orderly shutdown: let in-flight exchanges finish (stop(1) blocks up
      * to 1s), drain the handler pool, THEN close the spool — so no
      * handler races a closed spool (ClosedChannel / lazily-reopened fd). */
    override def stop(): Unit = {
      server.stop(1)
      pool.shutdown()
      val drained = pool.awaitTermination(5, java.util.concurrent.TimeUnit.SECONDS)
      if (!drained) {
        // A handler outlived the drain window; closing the spool under it
        // would fail its request silently. Surface the condition and cut
        // the stragglers off before the spool goes away.
        System.err.println(
          "[graft] IngestServer.stop: handler pool did not drain in 5s; " +
            "forcing shutdown — in-flight requests at this point are dropped")
        pool.shutdownNow()
      }
      spool.close()
    }

    private def append(shardKey: String, line: String): Unit =
      spool.append(shardKey, line)

    server.createContext("/ingest", (ex: HttpExchange) =>
      if (ex.getRequestMethod != "POST") respond(ex, 405, err("method not allowed"))
      else {
        val body = readBody(ex)
        val parsed: Either[String, JsonNode] =
          try Right(mapper.readTree(body))
          catch { case e: Exception => Left(e.getMessage) }
        parsed match {
          case Left(m) => respond(ex, 400, err(s"invalid JSON: $m"))
          case Right(node) if !node.isObject =>
            respond(ex, 400, err("body must be a JSON object"))
          case Right(node) =>
            // reference requires a routable identity up front
            // (ingest-service.go:179-189); same check, same precedence —
            // the winning identity is also the spool shard key
            val identity = Seq("stream_id", "projectId", "writeKey")
              .map(f => if (node.hasNonNull(f)) node.get(f).asText() else "")
              .find(_.nonEmpty)
            identity match {
              case None =>
                respond(ex, 400, err("one of stream_id, projectId, writeKey required"))
              case Some(id) =>
                append(id, node.toString) // compact single line for the text source
                respond(ex, 200, """{"status":"message written"}""")
            }
        }
      })

    server.createContext("/refreshCache", (ex: HttpExchange) =>
      if (ex.getRequestMethod != "POST") respond(ex, 405, err("method not allowed"))
      else {
        // rtdl_205 control fan-out (ingest-service.go:259-273); startIngest
        // reloads configs per batch, and Envelope.filterControl drops this row
        append("rtdl_205", """{"stream_id":"","message_type":"rtdl_205","payload":{}}""")
        respond(ex, 200, """{"status":"cache refresh queued"}""")
      })
  }

  /** A25 — config-service REST transport over [[ConfigService]]. */
  final class ConfigServer(spark: SparkSession, configDir: String, port: Int = 0)
      extends Server(port) {
    private val svc = new ConfigService(configDir)

    private def render(c: StreamConfig): String = {
      val n = mapper.createObjectNode()
      n.put("stream_id", c.streamId)
      n.put("stream_alt_id", c.streamAltId)
      n.put("active", c.active)
      n.put("message_type", c.messageType)
      n.put("file_store_type_id", c.fileStoreTypeId)
      n.put("folder_name", c.folderName)
      n.put("partition_time_id", c.partitionTimeId)
      n.put("compression_type_id", c.compressionTypeId)
      n.put("functions", c.functions.mkString(","))
      n.toString
    }

    private def renderAll(cs: Seq[StreamConfig]): String =
      cs.map(render).mkString("[", ",", "]")

    /** Parse a request-body config; ids default to the reference defaults
      * (local store, daily partitions, snappy) when absent, active=true. */
    private def parse(body: String): Either[String, StreamConfig] =
      try {
        val n = mapper.readTree(body)
        if (!n.isObject) Left("body must be a JSON object")
        else {
          def str(f: String) = if (n.hasNonNull(f)) n.get(f).asText() else ""
          def int(f: String, d: Int) = if (n.hasNonNull(f)) n.get(f).asInt(d) else d
          val fns = str("functions").split(",").map(_.trim).filter(_.nonEmpty).toSeq
          Right(StreamConfig(
            streamId = str("stream_id"),
            streamAltId = str("stream_alt_id"),
            active = if (n.hasNonNull("active")) n.get("active").asBoolean(true) else true,
            messageType = str("message_type"),
            fileStoreTypeId = int("file_store_type_id", 1),
            folderName = str("folder_name"),
            partitionTimeId = int("partition_time_id", 2),
            compressionTypeId = int("compression_type_id", 1),
            functions = fns))
        }
      } catch { case e: Exception => Left(e.getMessage) }

    private def streamIdOf(body: String): Option[String] =
      try {
        val n = mapper.readTree(body)
        if (n.hasNonNull("stream_id") && n.get("stream_id").asText().nonEmpty)
          Some(n.get("stream_id").asText()) else None
      } catch { case _: Exception => None }

    private def route(path: String, method: String)(f: HttpExchange => Unit): Unit =
      server.createContext(path, (ex: HttpExchange) =>
        if (ex.getRequestMethod != method) respond(ex, 405, err("method not allowed"))
        else try f(ex)
        catch { case e: Exception => respond(ex, 500, err(e.getMessage)) })

    // config-service.go:62-72, same paths and methods
    route("/getStream", "POST") { ex =>
      streamIdOf(readBody(ex)) match {
        case None => respond(ex, 400, err("stream_id required"))
        case Some(id) => svc.get(spark, id) match {
          case Some(c) => respond(ex, 200, render(c))
          case None => respond(ex, 404, err(s"no stream $id"))
        }
      }
    }
    route("/getAllStreams", "GET") { ex =>
      respond(ex, 200, renderAll(svc.getAll(spark)))
    }
    route("/getAllActiveStreams", "GET") { ex =>
      respond(ex, 200, renderAll(svc.getAllActive(spark)))
    }
    route("/createStream", "POST") { ex =>
      parse(readBody(ex)) match {
        case Left(m) => respond(ex, 400, err(m))
        case Right(c) =>
          // route comment config-service.go:65: message_type + folder_name required
          if (c.messageType.isEmpty || c.folderName.isEmpty)
            respond(ex, 400, err("message_type and folder_name required"))
          else
            try respond(ex, 200, render(svc.create(c)))
            catch { case e: IllegalArgumentException => respond(ex, 400, err(e.getMessage)) }
      }
    }
    route("/updateStream", "PUT") { ex =>
      parse(readBody(ex)) match {
        case Left(m) => respond(ex, 400, err(m))
        case Right(c) if c.streamId.isEmpty => respond(ex, 400, err("stream_id required"))
        case Right(c) =>
          try respond(ex, 200, render(svc.update(c)))
          catch { case e: IllegalArgumentException => respond(ex, 400, err(e.getMessage)) }
      }
    }
    route("/deleteStream", "DELETE") { ex =>
      streamIdOf(readBody(ex)) match {
        case None => respond(ex, 400, err("stream_id required"))
        case Some(id) =>
          if (svc.delete(id)) respond(ex, 200, """{"status":"deleted"}""")
          else respond(ex, 404, err(s"no stream $id"))
      }
    }
    def setActiveRoute(path: String, active: Boolean): Unit =
      route(path, "PUT") { ex =>
        streamIdOf(readBody(ex)) match {
          case None => respond(ex, 400, err("stream_id required"))
          case Some(id) => svc.setActive(spark, id, active) match {
            case Some(c) => respond(ex, 200, render(c))
            case None => respond(ex, 404, err(s"no stream $id"))
          }
        }
      }
    setActiveRoute("/activateStream", active = true)
    setActiveRoute("/deactivateStream", active = false)

    // enum listings: same values as /root/reference/constants/*.json
    private def enumBody(pairs: (String, Int)*): String = {
      val n = mapper.createObjectNode()
      pairs.foreach { case (k, v) => n.put(k, v) }
      n.toString
    }
    route("/getAllFileStoreTypes", "GET") { ex =>
      respond(ex, 200, enumBody(
        "file_store_local" -> 1, "file_store_aws" -> 2, "file_store_gcp" -> 3,
        "file_store_azure" -> 4, "file_store_hdfs" -> 5))
    }
    route("/getAllPartitionTimes", "GET") { ex =>
      respond(ex, 200, enumBody(
        "partition_time_hourly" -> 1, "partition_time_daily" -> 2,
        "partition_time_weekly" -> 3, "partition_time_monthly" -> 4,
        "partition_time_quarterly" -> 5))
    }
    route("/getAllCompressionTypes", "GET") { ex =>
      respond(ex, 200, enumBody(
        "compression_type_snappy" -> 1, "compression_type_gzip" -> 2,
        "compression_type_lzo" -> 3))
    }
  }
}
