package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.{call_function, lit, xxhash64}

/** Column-API surface over Spark's native Bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind runtime row-level filtering, reference: Spark's
  * InjectRuntimeFilter rule). Spark registers neither in the public SQL
  * function registry, so this object exposes them the same way the
  * engine's own codegen'd expressions are exposed (the SimHash60
  * pattern): a per-session temp-function registration plus typed Column
  * wrappers.
  *
  * Why these and not `DataFrameStatFunctions.bloomFilter`: the stat API
  * builds a JVM-side sketch that can only be probed from a Scala UDF
  * (boxed, codegen-opaque); the aggregate/probe expression pair keeps
  * both the build and the probe inside whole-stage codegen, and the
  * probe's input is a plain `xxhash64` long — exactly what a 100 TB
  * prefilter wants in its hot path.
  *
  * Both sides MUST hash identically: [[bloomAgg]] inserts
  * `xxhash64(value)` and [[mightContain]] probes `xxhash64(value)` — use
  * the wrappers, never hand-roll one side.
  */
object BloomFunctions {
  private val AggName = "graft_bloom_agg"
  private val ProbeName = "graft_bloom_might_contain"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      AggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ProbeName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** Aggregate `value` (any orderable type — hashed through xxhash64)
    * into a serialized Bloom filter sized for `numItems` distinct values
    * in `numBits` bits. Returns one BINARY cell of `numBits/8` bytes. */
  def bloomAgg(value: Column, numItems: Long, numBits: Long): Column =
    call_function(AggName, xxhash64(value), lit(numItems), lit(numBits))

  /** Probe a serialized Bloom filter (a literal or any BINARY column)
    * for `value`. False positives at the built fpp; NEVER false
    * negative — safe as a pre-shuffle prefilter in front of an exact
    * verify join. */
  def mightContain(bloom: Column, value: Column): Column =
    call_function(ProbeName, bloom, xxhash64(value))

  /** Standard optimal sizing: bits = −n·ln(p) / ln(2)², floored at 64. */
  def optimalNumBits(numItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp $fpp out of (0,1)")
    val ln2sq = math.log(2) * math.log(2)
    math.max(64L, math.ceil(-numItems * math.log(fpp) / ln2sq).toLong)
  }
}
