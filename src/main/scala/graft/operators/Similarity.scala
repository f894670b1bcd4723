package graft.operators

import graft.functions.TextFunctions.h60
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (array<float>).
  *
  * Two tiers, mirroring how a 100 TB pipeline actually runs ANN:
  *  - brute-force cosine top-k: the exact baseline. Query set is broadcast
  *    (it's small); the corpus side streams — one pass, no corpus shuffle,
  *    cost O(|Q|·N·d).
  *  - sign-LSH bucketed top-k: random-hyperplane signatures partition the
  *    corpus; each query probes only its bucket (and optionally multiprobe
  *    neighbors). Hyperplane weights derive from h60(plane,dim) so the
  *    index is deterministic and engine-reproducible, not RNG-dependent.
  *    This is the IVF-style scale path: bucket key = shuffle/partition key.
  */
object Similarity {

  /** Cosine similarity of two double-array columns (zip_with + aggregate —
    * stays inside codegen, no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (acc, x) => acc + x))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

  private def asDouble(vecCol: Column): Column =
    transform(vecCol, x => x.cast("double"))

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (desc), tie-broken by corpus id asc. */
  def bruteForceTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("cosine"))
  }

  /** Deterministic sign-LSH signature: bit p = sign(v · w_p) where
    * w_p[dim] = (h60("p:dim") mod 2001) - 1000 (a fixed pseudo-random
    * integer hyperplane). Returns an int bucket in [0, 2^planes). */
  def lshSignBits(vecCol: Column, planes: Int): Column = {
    val sigBits = (0 until planes).map { p =>
      val dot = aggregate(
        zip_with(asDouble(vecCol),
          transform(sequence(lit(0), size(vecCol) - 1),
            d => (pmod(h60(concat(lit(p.toString), lit(":"), d.cast("string"))), lit(2001)) - lit(1000)).cast("double")),
          (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L) * (1L << p)).otherwise(lit(0L))
    }
    sigBits.reduce(_ + _)
  }

  /** Bucketed ANN: queries probe only their own LSH bucket, then exact
    * cosine top-k within the bucket. Approximate (recall < 1) by design. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, planes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .withColumn("bucket", lshSignBits(col("qv"), planes))
    val c = corpus.select(col(idCol).as("corpus_id"), asDouble(col(vecCol)).as("cv"))
      .withColumn("bucket", lshSignBits(col("cv"), planes))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", cosine(col("qv"), col("cv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("rank"), col("corpus_id"), col("cosine"))
  }
}
