package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import graft.operators.Packing
import graft.queries.Handoff.HandoffOps
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

  /** Packing capacity sweep: the straddle/efficiency report that picks
    * the training sequence length — for each candidate capacity, how
    * many sequences the corpus packs into, how many documents straddle
    * a sequence boundary (the attention-mask-quality cost of contiguous
    * packing), and the tail-sequence fill. One prefix-sum pass per
    * capacity over the SAME sized table (narrow rows), every statistic
    * an exact integer or an exact division. */
  private val q150 = QueryDef(
    "q150_packing_capacity_sweep",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"),
          size(TextFunctions.tokens(col("text"))).as("n_toks"))
        .handoff
      val reports = Seq(512L, 1024L, 2048L).map { cap =>
        Packing.assign(docs, "doc_id", "n_toks", capacity = cap)
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("n_tokens"),
            max(col("seq_last")).as("__maxseq"),
            sum(when(col("seq_last") =!= col("seq_id"), 1L).otherwise(0L))
              .as("n_straddling"))
          .select(lit(cap).as("capacity"),
            col("n_docs"), col("n_tokens"),
            (col("__maxseq") + lit(1L)).as("n_seqs"),
            col("n_straddling"),
            Rnd.halfUp(col("n_straddling").cast("double") /
              col("n_docs").cast("double"), 6).as("straddle_frac6"),
            Rnd.halfUp(
              (col("n_tokens") - col("__maxseq") * lit(cap)).cast("double") /
                lit(cap.toDouble), 6).as("tail_fill6"))
      }
      reports.reduce(_ unionByName _).orderBy(col("capacity"))
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
      caps AS (SELECT unnest([512, 1024, 2048]) AS capacity),
      a AS (
        SELECT caps.capacity, c.doc_id, c.n_tokens,
               c.tok_offset // caps.capacity AS seq_id,
               (c.tok_offset + greatest(c.n_tokens, 1) - 1) // caps.capacity
                 AS seq_last
        FROM c, caps)
      SELECT capacity,
             count(*) AS n_docs,
             CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             CAST(max(seq_last) + 1 AS BIGINT) AS n_seqs,
             CAST(sum(CASE WHEN seq_last <> seq_id THEN 1 ELSE 0 END) AS BIGINT)
               AS n_straddling,
             floor((CAST(sum(CASE WHEN seq_last <> seq_id THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
               AS straddle_frac6,
             floor((CAST(sum(n_tokens) - max(seq_last) * capacity AS DOUBLE)
               / CAST(capacity AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0
               AS tail_fill6
      FROM a
      GROUP BY capacity
      ORDER BY capacity"""))

  def entries: Seq[QueryDef] = Seq(q90, q104, q108, q150)
}
