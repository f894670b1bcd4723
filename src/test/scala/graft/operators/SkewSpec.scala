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

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // salting (above) covers shapes AQE can't; this proves the shape AQE
    // DOES cover works in this engine's configuration — the default skew
    // answer at 100 TB is AQE's runtime split, salting is the fallback
    val conf = spark.conf
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
    try {
      val pad = "x" * 64
      // one pathological key holds a third of the rows, padded PER ROW
      // (a constant pad would be constant-folded out of the shuffle) so
      // its shuffle partition dwarfs the median
      val big = spark.range(0, 30000).select(
        when(col("id") % 3 === 0, 0L).otherwise(col("id")).as("k"),
        concat(lit(pad), col("id")).as("pad"))
      val right = spark.range(0, 30000).select(col("id").as("k"), lit(1).as("w"))
      val joined = big.join(right, "k")
      // collect() (not count()) so THIS df's adaptive plan executes and
      // finalizes — count() would run a separate query execution
      assert(joined.collect().length == 30000) // every big row matches exactly one right key
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed partition:\n${p.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
