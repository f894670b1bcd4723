package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — salting for hot keys (SURVEY §4 / the 100 TB
  * posture). AQE's skew-join handling covers sort-merge joins at runtime;
  * these helpers cover the two shapes AQE doesn't: a skewed aggregation
  * (one giant key overwhelms a single reducer) and a skewed broadcast-less
  * equi-join against a small-but-not-tiny side.
  */
object Skew {

  /** Two-phase salted aggregation: count/sum per key where some keys are
    * hot. Phase 1 aggregates (key, salt) over `salt` sub-groups spreading
    * each hot key across reducers; phase 2 merges the partials. Results
    * are exactly the unsalted groupBy (count/sum are associative). */
  def saltedCountSum(df: DataFrame, keyCol: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    salted.groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Salted equi-join: the big (skewed) side gets a random-ish salt in
    * [0, salt); the small side is replicated `salt` times. Join key becomes
    * (key, salt) so a hot key's rows spread over `salt` reducers. Exact
    * same rows as the unsalted inner join. */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCol: String,
      salt: Int = 16): DataFrame = {
    val b = big.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)).cast("int"))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, Seq(keyCol, "__salt")).drop("__salt")
  }
}
