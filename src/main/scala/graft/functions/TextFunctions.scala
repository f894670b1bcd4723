package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text/hash building blocks for the dedup / similarity / text-
  * analysis extension operators.
  *
  * All hashes are md5-based and truncated to 60 bits so every function here
  * is reproducible in ANSI SQL on any engine with md5 (the DuckDB oracles
  * spell the same formula as ('0x' || substr(md5(x),1,15))::UBIGINT) —
  * engine-native hash() would be faster but unverifiable cross-engine.
  * Swap `h60` for xxhash64 when oracle parity is not required.
  */
object TextFunctions {

  /** Evaluate-once combinator: binds `c`'s value to a lambda variable so
    * expressions that use it many times (sliding windows, hash families)
    * evaluate it exactly once per row. Without this, CollapseProject
    * inlines the producing expression into every lambda occurrence —
    * turning O(n) plans into O(n²) (observed 76s → <1s on winnowing). */
  def once(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** 60-bit deterministic hash of a string column (hex md5 prefix). */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Salted variant for hash families (minhash seeds, hyperplanes). */
  def h60(c: Column, salt: Int): Column =
    h60(concat(c.cast("string"), lit("#" + salt)))

  /** Engine-native fast hash family (xxhash64): ~4× cheaper than the
    * md5-derived family but not reproducible outside Spark. Use for
    * production dedup; use `md5Family` when an external oracle must
    * replay the signatures. */
  val xxFamily: (Column, Column) => Column =
    (c, salt) => xxhash64(c, salt)

  /** Cross-engine-reproducible family (md5 prefix, DuckDB-replayable). */
  val md5Family: (Column, Column) => Column =
    (c, salt) => h60(concat(c, lit("#"), salt.cast("string")))

  /** Whitespace tokenization, empty tokens dropped.
    * NOTE (round-18 measurement): a custom codegen Tokens expression
    * (static compiled Pattern + fused empty-filter) was tried and
    * REGRESSED ~1.5× — Spark's StringSplit splits UTF8String bytes
    * without materializing a java String, which beats the saved
    * Pattern.compile and interpreted ArrayFilter pass. Keep built-ins. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Distinct token set in sorted order (canonical bag-of-words). */
  def tokenSet(text: Column): Column =
    array_sort(array_distinct(tokens(text)))

  /** k-word shingles from a token array ([] when fewer than k tokens).
    * k = 1 is the identity (a 1-shingle IS the token): the general
    * formulation would rebuild the array element-by-element through a
    * higher-order transform whose lambda (slice + concat_ws) evaluates
    * INTERPRETED (HOFs are CodegenFallback) — profiled as a top-5
    * executor frame in the LSH chains, which all shingle at k = 1. */
  def shingles(toks: Column, k: Int): Column =
    // coalesce keeps the documented [] contract for a NULL token array
    // (the former general path's `when` with no matching arm yielded its
    // `otherwise(array())`); a bare identity/expression would propagate
    // the null and diverge signatures/band keys for null-text docs
    // (ADVICE r18). k >= 2 runs the codegen'd [[ShinglesK]] expression —
    // one tight loop per row instead of an interpreted
    // transform(slice + concat_ws) lambda per shingle (round 19; the
    // HOF profiled as a top executor frame in the k=3 LSH chains and
    // the bigram passes). Values are byte-identical to the HOF form.
    if (k == 1) coalesce(toks, array().cast("array<string>"))
    else coalesce(
      org.apache.spark.sql.graftshim.GraftSqlShim.columnOf(
        ShinglesK(org.apache.spark.sql.graftshim.GraftSqlShim.exprOf(toks), k)),
      array().cast("array<string>"))

  /** MinHash signature: for seed i, min over shingles of h60(shingle#i).
    * Per-row, no explode, no shuffle. The default md5 family routes
    * through the codegen'd [[MinHashSig]] expression (one tight loop,
    * byte-identical values — callers must have registered it, all
    * operator entry points do); custom families (e.g. [[xxFamily]]) use
    * the higher-order-function formulation. */
  def minhashSignature(shingleCol: Column, n: Int,
      family: (Column, Column) => Column = md5Family): Column =
    if (family eq md5Family) MinHashSig.minhashSig(shingleCol, n)
    else once(shingleCol) { ss =>
      transform(sequence(lit(0), lit(n - 1)),
        i => array_min(transform(ss, s => family(s, i))))
    }

  /** LSH band hashes for a signature: bands of `rows` values, each band
    * hashed to a bucket key. Emits array of "bandIdx:bandHash" strings. */
  def bandKeys(sig: Column, bands: Int, rows: Int): Column =
    once(sig) { sg =>
      transform(sequence(lit(0), lit(bands - 1)),
        b => concat_ws(":", b.cast("string"),
          h60(concat_ws(",", slice(sg, b * lit(rows) + lit(1), lit(rows)))).cast("string")))
    }

  /** A BPE-ish subword token count: whitespace words plus an extra token
    * for every 4 characters beyond the first 4 of each word (a stand-in
    * for byte-pair merges — deterministic, SQL-expressible). */
  def approxBpeTokenCount(text: Column): Column =
    aggregate(tokens(text), lit(0),
      (acc, t) => acc + lit(1) + floor((length(t) - lit(1)) / lit(4)).cast("int"))
}
