package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-search extension operators: exact brute-force ANN baseline
  * (oracle-verified) and the LSH-bucketed scale path (rows-only — bucket
  * assignment is deterministic but replaying 8×64 hyperplane hashes in
  * SQL buys no additional verification beyond q50's exact tier). */
object SimilarityQueries extends QueryModule {

  /** Brute-force cosine top-5 for 10 query vectors over the corpus. */
  private val q50 = QueryDef(
    "q50_ann_bruteforce_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
        .select(col("query_id"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    Some("""
      WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
      scored AS (
        SELECT q.query_id, e.vec_id AS corpus_id,
               list_dot_product(q.qv, e.v) /
               (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine
        FROM e CROSS JOIN q
        WHERE q.query_id <> e.vec_id),
      ranked AS (
        SELECT query_id, corpus_id, cosine,
               row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC NULLS LAST, corpus_id ASC) AS rank
        FROM scored)
      SELECT query_id, rank, corpus_id,
             floor(cosine * 10000.0 + 0.5) / 10000.0 AS cos4
      FROM ranked
      WHERE rank <= 5
      ORDER BY query_id, rank"""))

  /** LSH-bucketed ANN (sign-random-projection, 6 planes): the scale path.
    * Rows-only check; the spec asserts recall against q50's exact tier. */
  private val q51 = QueryDef(
    "q51_ann_lsh_topk",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val queries = emb.filter(col("vec_id") < 10)
      Similarity.lshTopK(queries, emb, "vec_id", "embedding", k = 5, planes = 6)
        .select(col("query_id"), col("bucket"), col("rank"), col("corpus_id"),
          Rnd.halfUp(col("cosine"), 4).as("cos4"))
        .orderBy(col("query_id"), col("rank"))
    },
    None)

  override val entries: Seq[QueryDef] = Seq(q50, q51)
}
