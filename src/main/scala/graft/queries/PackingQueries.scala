package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Packing
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Sequence-packing surface (see operators/Packing.scala). The packed
  * layout is pure integer arithmetic over a prefix sum, so the oracle
  * replays EVERY document's (offset, sequence, in-sequence position)
  * exactly — the distributed two-phase prefix sum must agree with
  * DuckDB's single global window bit-for-bit. */
object PackingQueries extends QueryModule {

  /** Pack the documents table into 2048-token training sequences in
    * doc_id order. Token counts use the engine's whitespace tokenizer
    * (q60's parity contract). */
  private val q90 = QueryDef(
    "q90_sequence_packing",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).as("n_toks"))
      Packing.assign(docs, "doc_id", "n_toks", capacity = 2048L)
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id,
          len(list_filter(string_split_regex(text, '\s+'),
              x -> length(x) > 0))::BIGINT AS n_tokens
        FROM documents),
      c AS (
        SELECT doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS tok_offset
        FROM t)
      SELECT doc_id, n_tokens, tok_offset,
        tok_offset // 2048 AS seq_id,
        tok_offset % 2048 AS seq_offset,
        (tok_offset + greatest(n_tokens, 1) - 1) // 2048 AS seq_last
      FROM c
      ORDER BY doc_id"""))

  def entries: Seq[QueryDef] = Seq(q90)
}
