package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming minhash LSH: near-dups detected across batches, bounded state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val out = StreamingDedup.minhashLshStream(
      spark, mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.6, maxBucketSize = 100)
    val q = out.writeStream.format("memory").queryName("neardup_out")
      .outputMode("append").start()
    try {
      val base = "the quick brown fox jumps over the lazy dog again and again"
      mem.addData((1L, base), (2L, "totally different words entirely here now"))
      q.processAllAvailable()
      // nothing similar yet
      assert(spark.table("neardup_out").count() == 0)

      // a near-identical doc arrives in a later batch → pair with doc 1
      // (the added token was checked offline to leave ≥1 of the 4 LSH
      // bands identical — banding is deterministic, not probabilistic)
      mem.addData((3L, base + " cat"))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 3L)))
      val jac = spark.table("neardup_out").select(max("jaccard")).as[Double].head()
      assert(jac >= 0.6)

      // an exact duplicate of doc 1 → pairs with both 1 and 3
      mem.addData((4L, base))
      q.processAllAvailable()
      val pairs2 = spark.table("neardup_out")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(pairs2.contains((1L, 4L)) && pairs2.contains((3L, 4L)))
    } finally q.stop()
  }

  test("bucket cap bounds state: residents beyond maxBucketSize are evicted") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    // cap of 1: only the most recent resident per band is retained
    val out = StreamingDedup.minhashLshStream(
      spark, mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.9, maxBucketSize = 1)
    val q = out.writeStream.format("memory").queryName("neardup_cap")
      .outputMode("append").start()
    try {
      val t = "alpha beta gamma delta epsilon zeta eta theta"
      mem.addData((10L, t)); q.processAllAvailable()
      mem.addData((11L, t)); q.processAllAvailable() // pairs with 10 (resident)
      mem.addData((12L, t)); q.processAllAvailable() // 10 evicted → pairs with 11 only
      val pairs = spark.table("neardup_cap")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      assert(pairs.contains((10L, 11L)) && pairs.contains((11L, 12L)))
      assert(!pairs.contains((10L, 12L))) // eviction proven
    } finally q.stop()
  }
}
