package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("buffer semantics: sorted distinct k-minima, dedup, eviction, merge") {
    val sk = KmvSketch(4)
    var buf = sk.zero
    Seq(50L, 10L, 30L, 10L, 70L, 20L).foreach(h => buf = sk.reduce(buf, h))
    assert(buf.toSeq == Seq(10L, 20L, 30L, 50L)) // 70 evicted, 10 dedup'd
    val other = Seq(5L, 20L, 60L).foldLeft(sk.zero)(sk.reduce)
    val merged = sk.merge(buf, other)
    assert(merged.toSeq == Seq(5L, 10L, 20L, 30L)) // global 4 minima, distinct
    assert(sk.finish(merged) == ((4, 30L)))
    assert(sk.finish(sk.zero) == ((0, 0L)))
  }

  test("estimate is within 3x of exact on real cardinalities (k=64)") {
    import graft.functions.TextFunctions.h60
    val kmv = udaf(KmvSketch(64))
    val df = (1 to 5000).map(i => (i % 7, i.toLong)).toDF("g", "v")
      .select(col("g"), col("v"), h60(col("v")).as("h"))
      .groupBy(col("g"))
      .agg(kmv(col("h")).as("sk"), countDistinct(col("v")).as("exact"))
      .withColumn("est",
        when(col("sk._1") < 64, col("sk._1").cast("double"))
          .otherwise(lit(63.0) * lit(1152921504606846976.0) / col("sk._2")))
      .select("exact", "est").as[(Long, Double)].collect()
    df.foreach { case (exact, est) =>
      assert(est > exact / 3.0 && est < exact * 3.0, s"exact=$exact est=$est")
    }
  }
}
