package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedCountSum equals the unsalted groupBy exactly") {
    val ev = Tables.events(spark, sf)
      .withColumn("k", when(col("user_id") % 5 === 0, 0L).otherwise(col("user_id")))
    val salted = Skew.saltedCountSum(ev, "k", "value", salt = 8)
      .select(col("k"), col("n"), round(col("total"), 6).as("t"))
      .as[(Long, Long, Double)].collect().map { case (k, n, t) => k -> (n, t) }.toMap
    val plain = ev.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("t"))
      .as[(Long, Long, Double)].collect().map { case (k, n, t) => k -> (n, t) }.toMap
    assert(salted == plain)
  }

  test("saltedJoin returns exactly the unsalted inner join rows") {
    val big = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "v")
    val small = Seq((1L, "x"), (2L, "y")).toDF("k", "w")
    val salted = Skew.saltedJoin(big, small, "k", salt = 4)
      .select("k", "v", "w").as[(Long, String, String)].collect().sorted.toSeq
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "w").as[(Long, String, String)].collect().sorted.toSeq
    assert(salted == plain && salted.size == 4)
  }
}
