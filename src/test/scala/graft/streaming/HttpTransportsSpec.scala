package graft.streaming

import graft.SparkSpec
import java.io.IOException
import java.net.{HttpURLConnection, URL}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** A1 + A25 REST transports: POST JSON → queryable table, and config
  * CRUD round-trip over HTTP (the reference's front doors,
  * ingest-service.go:152-279 / config-service.go:59-76). */
class HttpTransportsSpec extends SparkSpec {

  private def http(method: String, url: String, body: Option[String] = None): (Int, String) = {
    val conn = new URL(url).openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val status = conn.getResponseCode
    val stream = try conn.getInputStream catch { case _: IOException => conn.getErrorStream }
    val text = if (stream == null) "" else new String(stream.readAllBytes(), UTF_8)
    conn.disconnect()
    (status, text)
  }

  test("config CRUD round-trip over HTTP; enum listings match the reference constants") {
    val dir = Files.createTempDirectory("graft-cfg-http").toString
    val srv = new HttpTransports.ConfigServer(spark, dir).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"

      // create: server generates the id; missing required fields → 400
      val (badStatus, _) = http("POST", s"$base/createStream", Some("""{"folder_name":"x"}"""))
      assert(badStatus == 400)
      val (cs, created) = http("POST", s"$base/createStream",
        Some("""{"message_type":"pageview","folder_name":"web","stream_alt_id":"k1","functions":"ingester"}"""))
      assert(cs == 200 && created.contains("\"stream_id\""))
      val id = created.split("\"stream_id\":\"")(1).split("\"")(0)
      assert(id.nonEmpty)

      val (gs, got) = http("POST", s"$base/getStream", Some(s"""{"stream_id":"$id"}"""))
      assert(gs == 200 && got.contains("\"folder_name\":\"web\"") && got.contains("\"active\":true"))

      val (ds, allActive) = http("GET", s"$base/getAllActiveStreams")
      assert(ds == 200 && allActive.contains(id))

      val (ps, _) = http("PUT", s"$base/deactivateStream", Some(s"""{"stream_id":"$id"}"""))
      assert(ps == 200)
      val (_, nowInactive) = http("GET", s"$base/getAllActiveStreams")
      assert(!nowInactive.contains(id))
      val (_, stillAll) = http("GET", s"$base/getAllStreams")
      assert(stillAll.contains(id))

      // update replaces all fields (config-service.go:66)
      val (us, updated) = http("PUT", s"$base/updateStream",
        Some(s"""{"stream_id":"$id","message_type":"click","folder_name":"web2","active":true,"file_store_type_id":1,"partition_time_id":2,"compression_type_id":2}"""))
      assert(us == 200 && updated.contains("\"folder_name\":\"web2\""))
      // invalid enum id rejected (validateStream, config-service.go:670-697)
      val (vs, _) = http("PUT", s"$base/updateStream",
        Some(s"""{"stream_id":"$id","message_type":"x","folder_name":"y","file_store_type_id":9}"""))
      assert(vs == 400)

      val (es, enums) = http("GET", s"$base/getAllFileStoreTypes")
      assert(es == 200 && enums.contains("\"file_store_hdfs\":5"))
      assert(http("GET", s"$base/getAllPartitionTimes")._2.contains("\"partition_time_quarterly\":5"))
      assert(http("GET", s"$base/getAllCompressionTypes")._2.contains("\"compression_type_lzo\":3"))

      val (del, _) = http("DELETE", s"$base/deleteStream", Some(s"""{"stream_id":"$id"}"""))
      assert(del == 200)
      assert(http("POST", s"$base/getStream", Some(s"""{"stream_id":"$id"}"""))._1 == 404)
      assert(http("DELETE", s"$base/deleteStream", Some(s"""{"stream_id":"$id"}"""))._1 == 404)
    } finally srv.stop()
  }

  test("concurrent POSTs: every message lands as one intact spool line") {
    val spool = Files.createTempDirectory("graft-spool-conc").toString
    val srv = new HttpTransports.IngestServer(spool).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      val threads = (0 until 4).map { t =>
        new Thread(() => (0 until 25).foreach { i =>
          val (status, _) = http("POST", s"$base/ingest",
            Some(s"""{"projectId":"k$t","type":"e","seq":${t * 1000 + i}}"""))
          assert(status == 200)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val lines = Files.list(java.nio.file.Paths.get(spool)).iterator().asScala
        .flatMap(p => Files.readAllLines(p).asScala).toSeq
      assert(lines.size == 100)
      // every line parses and the full sequence set survived interleaving
      val seqs = lines.map { l =>
        assert(l.startsWith("{") && l.endsWith("}"), l)
        l.split("\"seq\":")(1).stripSuffix("}").toInt
      }.toSet
      assert(seqs == (0 until 4).flatMap(t => (0 until 25).map(t * 1000 + _)).toSet)
    } finally srv.stop()
  }

  test("sharded spool: streams spread across files, per-stream order preserved") {
    val spool = Files.createTempDirectory("graft-spool-shard").toString
    val srv = new HttpTransports.IngestServer(spool, shards = 4).start()
    try {
      val base = s"http://127.0.0.1:${srv.boundPort}"
      // 8 streams posted concurrently, each with an in-stream sequence
      val threads = (0 until 8).map { t =>
        new Thread(() => (0 until 20).foreach { i =>
          val (status, _) = http("POST", s"$base/ingest",
            Some(s"""{"stream_id":"stream-$t","seq":$i}"""))
          assert(status == 200)
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      val files = Files.list(java.nio.file.Paths.get(spool)).iterator().asScala.toSeq
      assert(files.size > 1, "sharding produced a single spool file")
      files.foreach { f =>
        val byStream = Files.readAllLines(f).asScala.toSeq
          .map { l =>
            (l.split("\"stream_id\":\"")(1).split("\"")(0),
              l.split("\"seq\":")(1).stripSuffix("}").toInt)
          }.groupBy(_._1)
        byStream.foreach { case (s, msgs) =>
          // a stream never splits across files...
          assert(files.count(g => Files.readAllLines(g).asScala.exists(
            _.contains(s""""stream_id":"$s""""))) == 1, s"$s split across shards")
          // ...and its messages appear in arrival (sequence) order
          assert(msgs.map(_._2) == msgs.map(_._2).sorted, s"$s out of order")
        }
      }
      val total = files.map(f => Files.readAllLines(f).size).sum
      assert(total == 160)
    } finally srv.stop()
  }

  test("stop() under fire: every acked message is in the spool, no post-stop appends") {
    val spool = Files.createTempDirectory("graft-spool-stop").toString
    val srv = new HttpTransports.IngestServer(spool).start()
    val base = s"http://127.0.0.1:${srv.boundPort}"
    val acks = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        var alive = true
        var i = 0
        while (alive) {
          try {
            val (status, _) = http("POST", s"$base/ingest",
              Some(s"""{"stream_id":"s$t","seq":$i}"""))
            if (status == 200) acks.incrementAndGet() else alive = false
          } catch { case _: IOException => alive = false }
          i += 1
        }
      })
    }
    threads.foreach(_.start())
    Thread.sleep(300) // let the hammer run, then stop mid-flight
    srv.stop() // must drain in-flight handlers BEFORE closing the spool
    threads.foreach(_.join(10000))
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(spool)).iterator().asScala
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(acks.get() > 0, "hammer never landed a message")
    // the ack invariant: a 200 means the line is in the file (append happens
    // before respond, and stop() closes the spool only after the drain)
    assert(lines.size >= acks.get(),
      s"${acks.get()} acked but only ${lines.size} lines spooled")
    // at most one unacked in-flight line per client thread
    assert(lines.size - acks.get() <= threads.size,
      s"${lines.size - acks.get()} spooled-but-unacked lines")
    lines.foreach(l => assert(l.startsWith("{") && l.endsWith("}"), l))
  }

  test("e2e: POST /ingest → spool → streaming ingest → queryable lake table") {
    val spool = Files.createTempDirectory("graft-spool").toString
    val cfgDir = Files.createTempDirectory("graft-cfg").toString
    val dest = Files.createTempDirectory("graft-dest").toString
    val ckpt = Files.createTempDirectory("graft-ckpt").toString

    val cfgSrv = new HttpTransports.ConfigServer(spark, cfgDir).start()
    val ingSrv = new HttpTransports.IngestServer(spool).start()
    try {
      val cfgBase = s"http://127.0.0.1:${cfgSrv.boundPort}"
      val ingBase = s"http://127.0.0.1:${ingSrv.boundPort}"

      val (cs, _) = http("POST", s"$cfgBase/createStream",
        Some("""{"message_type":"pageview","folder_name":"web","stream_alt_id":"seg-1","functions":"ingester"}"""))
      assert(cs == 200)

      // two routable messages, one control refresh, two rejects
      assert(http("POST", s"$ingBase/ingest",
        Some("""{"projectId":"seg-1","type":"pageview","url":"/a","ms":120}"""))._1 == 200)
      assert(http("POST", s"$ingBase/ingest",
        Some("""{"writeKey":"seg-1","url":"/b","ms":80}"""))._1 == 200)
      assert(http("POST", s"$ingBase/refreshCache")._1 == 200)
      assert(http("POST", s"$ingBase/ingest", Some("""not json"""))._1 == 400)
      assert(http("POST", s"$ingBase/ingest", Some("""{"no":"identity"}"""))._1 == 400)
      assert(http("GET", s"$ingBase/ingest")._1 == 405)

      val q = StreamingOps.startIngest(spark, spool, cfgDir, dest, ckpt)
      q.awaitTermination(60000)

      val lake = spark.read.parquet(s"$dest/web/pageview")
      assert(lake.count() == 2)
      import spark.implicits._
      assert(lake.select("url").as[String].collect().toSet == Set("/a", "/b"))
    } finally { cfgSrv.stop(); ingSrv.stop() }
  }
}
