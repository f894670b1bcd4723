package graft

import graft.streaming.{HttpTransports, ShardedSpool}
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** HTTP ingest front-door throughput (SURVEY §3.1, the layer ABOVE
  * [[IngestBench]]'s Spark pipeline), in two measurements:
  *
  *  1. spool append path in isolation (the lock the shard count is
  *     supposed to spread): concurrent writer threads driving
  *     [[ShardedSpool.append]] directly, 1 shard vs 8 — this isolates
  *     the single-append-file ceiling from HTTP client/socket effects.
  *  2. end-to-end HTTP: concurrent keep-alive clients posting small
  *     JSON messages; a message counts only after its 200 (i.e. after
  *     its spool append completed).
  *
  * Usage: HttpIngestBench [clients] [msgsPerClient]
  */
object HttpIngestBench {

  private val line =
    """{"stream_id":"stream-%d","seq":%d,"type":"e","payload":{"v":1,"url":"/a/b","ms":120}}"""

  private def spoolRate(shards: Int, writers: Int, perWriter: Int): Double = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-spool-$shards").toString
    val spool = new ShardedSpool(dir, shards)
    val t0 = System.nanoTime()
    val threads = (0 until writers).map { t =>
      new Thread(() => (0 until perWriter).foreach { i =>
        spool.append(s"stream-${t % 16}", line.format(t % 16, i))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val secs = (System.nanoTime() - t0) / 1e9
    spool.close()
    import scala.jdk.CollectionConverters._
    val landed = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(p => java.nio.file.Files.readAllLines(p).size().toLong).sum
    require(landed == writers.toLong * perWriter, s"landed $landed")
    writers.toLong * perWriter / secs
  }

  private def httpRate(clients: Int, perClient: Int): Double = {
    val spoolDir = java.nio.file.Files.createTempDirectory("graft-httpbench").toString
    val srv = new HttpTransports.IngestServer(spoolDir,
      poolThreads = math.max(8, clients)).start()
    try {
      val base = URI.create(s"http://127.0.0.1:${srv.boundPort}/ingest")
      val t0 = System.nanoTime()
      val threads = (0 until clients).map { t =>
        new Thread(() => {
          val client = HttpClient.newHttpClient()
          (0 until perClient).foreach { i =>
            val req = HttpRequest.newBuilder(base)
              .POST(HttpRequest.BodyPublishers.ofString(line.format(t % 16, i)))
              .build()
            val rc = client.send(req, HttpResponse.BodyHandlers.discarding()).statusCode()
            require(rc == 200, s"status $rc")
          }
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val secs = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val landed = java.nio.file.Files.list(java.nio.file.Paths.get(spoolDir))
        .iterator().asScala.map(p => java.nio.file.Files.readAllLines(p).size().toLong).sum
      require(landed == clients.toLong * perClient, s"landed $landed")
      clients.toLong * perClient / secs
    } finally srv.stop()
  }

  def main(args: Array[String]): Unit = {
    val clients = args.lift(0).map(_.toInt).getOrElse(16)
    val perClient = args.lift(1).map(_.toInt).getOrElse(10000)
    spoolRate(8, clients, perClient) // warmup: JIT
    val spool1 = spoolRate(1, clients, perClient * 10)
    val spool8 = spoolRate(8, clients, perClient * 10)
    httpRate(clients, perClient / 10) // warmup: connections + JIT
    val http = httpRate(clients, perClient)
    println(f"""{"metric":"http_ingest_msgs_per_sec","value":$http%.0f,"spool_1shard":$spool1%.0f,"spool_8shard":$spool8%.0f,"clients":$clients,"messages":${clients * perClient}}""")
  }
}
