package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming heavy hitters: guarantees hold across batches, state stays O(k)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 4
    val mem = MemoryStream[(String, String)]
    val out = StreamingSketch.heavyHittersStream(
      spark, mem.toDF().toDF("key", "tok"), "key", "tok", k = k)
    val q = out.writeStream.format("memory").queryName("hh_out")
      .outputMode("update").start()
    try {
      // batch 1: alpha dominates
      val b1 = Seq.fill(30)("alpha") ++ Seq.fill(6)("beta") ++
        (0 until 10).map(i => s"x$i")
      mem.addData(b1.map(("g1", _)): _*)
      q.processAllAvailable()
      // batch 2: beta surges; noise continues
      val b2 = Seq.fill(40)("beta") ++ Seq.fill(10)("alpha") ++
        (0 until 14).map(i => s"y$i")
      mem.addData(b2.map(("g1", _)): _*)
      q.processAllAvailable()

      val all = b1 ++ b2
      val n = all.size.toLong
      val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      // latest update row for the group
      val row = spark.table("hh_out").filter($"key" === "g1")
        .orderBy($"n_tokens".desc).limit(1)
        .as[(String, Long, Map[String, Long])].head()
      val (_, nSeen, summary) = row
      assert(nSeen == n, s"counted $nSeen of $n tokens")
      assert(summary.size <= k, s"state exceeded k: ${summary.size}")
      // MG guarantees over the WHOLE stream seen so far
      summary.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c && c - est <= n / k, s"$t est=$est true=$c n/k=${n / k}")
      }
      exact.filter(_._2 > n.toDouble / k).keys.foreach { t =>
        assert(summary.contains(t), s"heavy '$t' missing from streaming summary")
      }
      // both true heavies are the dominant survivors
      assert(summary.contains("alpha") && summary.contains("beta"))
    } finally q.stop()
  }

  test("null tokens are dropped at the source instead of failing the query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val out = StreamingSketch.heavyHittersStream(
      spark, mem.toDF().toDF("key", "tok"), "key", "tok", k = 8)
    val q = out.writeStream.format("memory").queryName("hh_nulls")
      .outputMode("update").start()
    try {
      mem.addData(("g", "a"), ("g", null), ("g", "a"), ("g", null), ("g", "b"))
      q.processAllAvailable()
      val (nSeen, summary) = spark.table("hh_nulls").filter($"key" === "g")
        .orderBy($"n_tokens".desc).limit(1)
        .as[(String, Long, Map[String, Long])].head() match {
        case (_, n, s) => (n, s)
      }
      assert(nSeen == 3, s"null tokens must not count, got n=$nSeen")
      assert(summary == Map("a" -> 2L, "b" -> 1L))
    } finally q.stop()
  }
}
