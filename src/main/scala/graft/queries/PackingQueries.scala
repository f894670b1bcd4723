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

  /** The batch-builder slice map (inverse of q90): per (sequence,
    * document) incidence, which document token range fills which
    * in-sequence position. The oracle replays the prefix sum, explodes
    * each document over generate_series(seq_id, seq_last), and applies
    * the same integer clamps — every slice boundary is hash-verified. */
  private val q104 = QueryDef(
    "q104_packing_slices",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).as("n_toks"))
      Packing.slices(
          Packing.assign(docs, "doc_id", "n_toks", capacity = 2048L),
          capacity = 2048L)
        .orderBy(col("seq_id"), col("doc_id"))
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
        FROM t),
      a AS (
        SELECT doc_id, n_tokens, tok_offset,
          tok_offset // 2048 AS seq_id,
          (tok_offset + greatest(n_tokens, 1) - 1) // 2048 AS seq_last
        FROM c
        WHERE n_tokens > 0),
      x AS (
        SELECT a.doc_id, a.n_tokens, a.tok_offset,
               s.seq_id, s.seq_id * 2048 AS seq_start
        FROM a, LATERAL (SELECT unnest(generate_series(a.seq_id, a.seq_last)) AS seq_id) s),
      sl AS (
        SELECT seq_id, doc_id,
               greatest(0, seq_start - tok_offset) AS doc_start,
               least(n_tokens, seq_start + 2048 - tok_offset) AS doc_end,
               greatest(0, tok_offset - seq_start) AS seq_pos
        FROM x)
      SELECT seq_id, doc_id, doc_start, doc_end, seq_pos,
             doc_end - doc_start AS n
      FROM sl
      WHERE doc_end - doc_start > 0
      ORDER BY seq_id, doc_id"""))

  /** Per-language packed streams: each lang's documents pack into their
    * own independent sequence stream. Oracle: the same prefix sum
    * PARTITIONED BY lang. */
  private val q108 = QueryDef(
    "q108_grouped_packing",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          size(TextFunctions.tokens(col("text"))).as("n_toks"))
      Packing.assignPerGroup(docs, "lang", "doc_id", "n_toks", capacity = 1024L)
        .orderBy(col("lang"), col("doc_id"))
    },
    Some("""
      WITH t AS (
        SELECT doc_id, lang,
          len(list_filter(string_split_regex(text, '\s+'),
              x -> length(x) > 0))::BIGINT AS n_tokens
        FROM documents
        WHERE lang IS NOT NULL),
      c AS (
        SELECT lang, doc_id, n_tokens,
          COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
            AS tok_offset
        FROM t)
      SELECT lang, doc_id, n_tokens, tok_offset,
        tok_offset // 1024 AS seq_id,
        tok_offset % 1024 AS seq_offset,
        (tok_offset + greatest(n_tokens, 1) - 1) // 1024 AS seq_last
      FROM c
      ORDER BY lang, doc_id"""))

  def entries: Seq[QueryDef] = Seq(q90, q104, q108)
}
