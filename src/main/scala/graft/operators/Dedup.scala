package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.storage.StorageLevel

/** Where a candidate-generation index (the bucketed signature table read
  * by both sides of the verification self-join) lives between its two
  * reads.
  *
  *  - [[IndexStore.Memory]]: `persist(level)` — right for interactive /
  *    bench scale. Default level is MEMORY_AND_DISK (same as `.cache()`).
  *    Each Memory INSTANCE tracks what it persisted: call `release()` on
  *    the instance you passed in (or `spark.catalog.clearCache()`) when
  *    the query's results have been consumed, else the index pins
  *    executor memory for the session. Tracking is per-instance so
  *    releasing one query's index can never unpersist another concurrent
  *    query's live index out from under it.
  *  - [[IndexStore.Path]]: materialize the index as parquet at `dir` and
  *    read it back — the 100 TB posture: a corpus-sized signature index
  *    does not belong in executor memory, and a durable index is reusable
  *    across queries and restarts (and inside foreachBatch). `dir` is
  *    CALLER-OWNED and must be unique per concurrent invocation: the
  *    index is written with mode=overwrite, so two queries sharing a dir
  *    would clobber each other mid-read. The dir is never auto-deleted —
  *    durability is the point; delete it to reclaim space.
  *  - [[IndexStore.SessionTemp]] (the default): Path semantics under a
  *    per-JVM scratch root with a fresh subdir per persist call — no
  *    executor memory pinned, nothing for the caller to release, no
  *    clobber risk, best-effort deletion of the root at JVM exit. The
  *    right default precisely because the caller never sees the store
  *    instance.
  */
sealed trait IndexStore {
  /** Unpersist every [[IndexStore.Memory]] index THIS instance persisted
    * (no-op for [[IndexStore.Path]] — durable indexes are the point).
    * Scoped per instance: concurrent queries with their own stores can't
    * release each other's live indexes. */
  def release(): Unit
}
object IndexStore {
  final case class Memory(level: StorageLevel = StorageLevel.MEMORY_AND_DISK) extends IndexStore {
    // the operators return plain DataFrames, so the unpersist handle lives
    // on the store instance instead of complicating operator signatures
    private val persisted = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
    private[operators] def track(df: DataFrame): DataFrame = {
      val p = df.persist(level)
      persisted.add(p)
      p
    }
    def release(): Unit = {
      var df = persisted.poll()
      while (df != null) { df.unpersist(false); df = persisted.poll() }
    }
  }
  final case class Path(dir: String) extends IndexStore {
    def release(): Unit = ()
  }
  /** Path-style store under a per-JVM scratch root; every persist call
    * gets a fresh subdir, so concurrent default-store queries can never
    * clobber each other. Nothing is pinned in executor memory and there
    * is nothing to release — the root is deleted best-effort at JVM
    * exit. The path is schemeless, so on a real cluster it resolves
    * against fs.defaultFS (shared scratch), exactly like Path. */
  case object SessionTemp extends IndexStore {
    def release(): Unit = ()
    private lazy val root: String = {
      val r = s"/tmp/graft-idx-${java.util.UUID.randomUUID().toString.take(8)}"
      sys.addShutdownHook {
        try {
          val p = new org.apache.hadoop.fs.Path(r)
          p.getFileSystem(new org.apache.hadoop.conf.Configuration())
            .delete(p, true)
        } catch { case _: Throwable => () }
      }
      r
    }
    private[operators] def freshDir(): String =
      s"$root/${java.util.UUID.randomUUID().toString.take(12)}"
  }
  /** Identity store: no materialization at all — every consumer
    * recomputes the index subtree. The right choice when the index is
    * CHEAP TO RECOMPUTE relative to a round-trip (e.g. winnowing after
    * [[graft.functions.WinnowRolling]] made the pass a tight O(n) loop:
    * re-running it twice can beat serializing millions of exploded rows
    * once). Nothing pinned, nothing written, nothing to release. */
  case object NoStore extends IndexStore {
    def release(): Unit = ()
  }

  /** The no-handle-needed store: indexes persisted through the default
    * go to session-temp parquet, not executor memory, so a caller that
    * never sees the store instance leaks nothing. Pass your own
    * [[Memory]] when you want the in-memory fast path AND will call
    * `release()`, or [[Path]] for a durable, reusable index. */
  def default: IndexStore = SessionTemp

  private[operators] def persist(df: DataFrame, store: IndexStore): DataFrame = store match {
    case NoStore => df
    case m: Memory => m.track(df)
    case Path(dir) =>
      df.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
    case SessionTemp =>
      val dir = SessionTemp.freshDir()
      df.write.mode("overwrite").parquet(dir)
      df.sparkSession.read.parquet(dir)
  }
}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Algorithms: MinHash resemblance sketching (Broder, "On the resemblance
  * and containment of documents", 1997) with banded LSH (Indyk-Motwani
  * LSH applied per Mining of Massive Datasets ch.3); SimHash similarity
  * hashing (Charikar, "Similarity estimation techniques from rounding
  * algorithms", STOC 2002) with the pigeonhole chunk-bucketing of
  * Manku et al. (WWW 2007) for near-duplicate web crawl dedup.
  *
  * Scale design: every variant is a pure dataflow — per-row signature
  * computation (no shuffle), then a single groupBy/join on the signature
  * or bucket key. Candidate generation is always bucketed (LSH bands /
  * simhash chunks / content hash) so the pairwise verification join is
  * |bucket|², never |corpus|². At 100 TB the bucket key is the shuffle
  * key; skewed buckets (stop-shingle collisions) are capped via
  * `maxBucketSize` before pairing.
  */
object Dedup {

  /** 1e19 as an exact decimal literal — strictly greater than any Int
    * span position, so id·PosPack + pos orders identically to the
    * lexicographic (id, pos) struct for every representable pair
    * (including negative ids: pos ∈ [0, 1e19) keeps strata disjoint). */
  private val PosPack: Column =
    lit(new java.math.BigDecimal("10000000000000000000"))

  /** Content-hash group key that keeps NULL content as its own group:
    * md5(null) is null, and a null join key matches nothing in the
    * aggregate join-back — without the sentinel, every null-content row
    * would silently vanish from [[exact]]'s output instead of deduping
    * to one representative (the window formulation this replaced
    * grouped nulls as one partition; groupBy also groups nulls, it's
    * only the equality JOIN that drops them). "n" cannot collide with
    * md5's 32-hex-char output. */
  private[graft] def contentKey(contentCol: Column): Column =
    when(contentCol.isNull, lit("n")).otherwise(md5(contentCol.cast("string")))

  /** Exact dedup by content hash: keeps the row with min `idCol` per
    * distinct value of `contentCol` (ids are assumed unique; null
    * content dedupes as its own group, [[contentKey]]); adds
    * `dup_count`. The per-hash count + keeper id come from a MERGEABLE
    * groupBy aggregate joined back on the hash — map-side partials
    * mean a document duplicated millions of times costs one (count,
    * min) cell, never a single window partition holding every copy;
    * residual probe-side skew on the join-back is the AQE-splittable
    * equi-join kind. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val hashed = df.withColumn("__h", contentKey(col(contentCol)))
    val winners = hashed.groupBy(col("__h"))
      .agg(count(lit(1)).as("dup_count"), min(col(idCol)).as("__keep"))
    hashed.join(winners, Seq("__h"))
      .filter(col(idCol) === col("__keep"))
      .drop("__h", "__keep")
  }

  /** Exact dedup after canonicalization (lowercase, collapse whitespace). */
  def exactNormalized(df: DataFrame, idCol: String, textCol: String): DataFrame =
    exact(df.withColumn("__norm",
      regexp_replace(trim(lower(col(textCol))), "\\s+", " ")), idCol, "__norm")
      .drop("__norm")

  /** MinHash+LSH near-dup candidate pairs.
    *
    * shingle→minhash→band→bucket-join: per-row signature (numHashes
    * hashes over k-word shingles), banded into `bands`×`rows`; docs
    * sharing any band bucket become candidates; candidates are verified
    * with exact shingle-set Jaccard and filtered at `threshold`.
    *
    * Returns (id_a, id_b, jaccard) with id_a < id_b, distinct.
    */
  def minhashLsh(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 1, numHashes: Int = 16, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.8, maxBucketSize: Int = 1000,
      hashFamily: (Column, Column) => Column = md5Family,
      index: IndexStore = IndexStore.default,
      minParallelism: Int = 0): DataFrame = {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    graft.functions.MinHashSig.register(df.sparkSession)

    // signature hashing is per-row CPU work; on a real cluster the scan's
    // input splits already spread it, so the raw-text exchange is opt-in
    // (Spread.byKey, default 0 = never repartition)
    val sets = Spread.byKey(df, idCol, minParallelism).select(
      col(idCol).as("id"),
      array_distinct(shingles(tokens(col(textCol)), shingleK)).as("sset"))
      .filter(size(col("sset")) > 0)
    val sigs = sets.withColumn("sig", minhashSignature(col("sset"), numHashes, hashFamily))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .select(col("id"), col("sset"), col("band"))

    // cap pathological buckets (a bucket of b docs yields b^2 pairs).
    // The cap itself must be skew-immune: a hot stop-shingle band is the
    // exact pathology it guards against, so counting via
    // Window.partitionBy(band) would funnel that band into ONE sorted
    // window task before the filter could drop it. Instead count with a
    // map-side-mergeable groupBy (hot band = cheap partial-agg cells)
    // and join back only the surviving band keys — every surviving band
    // has ≤ maxBucketSize rows, so the join-back cannot skew either.
    // The bucketed signature table is read twice by the self-join — the
    // "persist the signature index" step, placement chosen by `index`.
    val keepBands = sigs.groupBy(col("band"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .select(col("band"))
    val bucketed = IndexStore.persist(sigs.join(keepBands, Seq("band")), index)

    val a = bucketed.select(col("band"), col("id").as("id_a"), col("sset").as("set_a"))
    val b = bucketed.select(col("band"), col("id").as("id_b"), col("sset").as("set_b"))
    val cand = a.join(b, Seq("band")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("set_a"), col("set_b"))
      .dropDuplicates("id_a", "id_b")

    cand
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exact n-gram Jaccard near-dup pairs via an inverted-index join with
    * document-frequency pruning: explode distinct word n-grams, drop
    * grams shared by more than `maxDf` docs (stop-grams generate
    * quadratic candidates but carry no discriminative signal), join on
    * the gram, then exact Jaccard verification over the full gram sets.
    *
    * Scale shape: the gram is the shuffle key; candidates are narrow
    * (id, id) pairs deduplicated BEFORE the gram sets are fetched back
    * (two id-keyed joins), so no wide rows move through the distinct.
    * Recall: a missed true pair must share ONLY >maxDf grams — near-dups
    * at any useful threshold share many rare grams. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5, maxDf: Int = 100,
      index: IndexStore = IndexStore.default,
      minParallelism: Int = 0): DataFrame = {
    val sets = IndexStore.persist(Spread.byKey(df, idCol, minParallelism).select(
        col(idCol).as("id"),
        array_distinct(shingles(tokens(col(textCol)), n)).as("gset"))
      .filter(size(col("gset")) > 0),
      index) // read 3×: inverted index + both verification joins
    val inv = sets.select(col("id"), explode(col("gset")).as("g"))
    // df-prune via mergeable groupBy + join-back (the containmentPairs
    // shape): a stop-gram's count folds map-side instead of funneling
    // the whole posting list into one window task, and only grams that
    // survive the cap (≤ maxDf postings each) re-enter via the join.
    val rareGrams = inv.groupBy(col("g"))
      .agg(count(lit(1)).as("__gdf"))
      .filter(col("__gdf") <= maxDf)
      .select(col("g"))
    val rare = inv.join(rareGrams, Seq("g"))
    val cand = rare.select(col("g"), col("id").as("id_a"))
      .join(rare.select(col("g"), col("id").as("id_b")), Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    cand
      .join(sets.select(col("id").as("id_a"), col("gset").as("set_a")), Seq("id_a"))
      .join(sets.select(col("id").as("id_b"), col("gset").as("set_b")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("set_a"), col("set_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("set_a")) + size(col("set_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Sub-document (chunk/paragraph) exact dedup — the C4/RefinedWeb step
    * that whole-document dedup misses: boilerplate spans duplicated
    * ACROSS distinct documents (headers, licenses, navigation). Tokens
    * chunk into NON-overlapping `chunkSize` windows
    * ([[TextAnalysis.chunks]] with stride = chunkSize, so every token
    * belongs to exactly one chunk); the first occurrence of each chunk
    * content — min (doc_id, chunk_id), a plain aggregate, no window —
    * is the keeper. Returns the chunk table with a `keep` flag; callers
    * drop `keep = 0` spans before packing.
    *
    * Scale shape: one map pass (chunk + hash), one groupBy on the chunk
    * hash (narrow rows: hash + two ids), one equi-join back. A
    * boilerplate chunk in millions of documents costs a single min()
    * cell in the aggregate, never a blown bucket. */
  /** Incremental dedup: the disposition of a NEW batch against an
    * EXISTING corpus — "dedup this crawl against what we already have",
    * the batch posture of [[graft.streaming.StreamingDedupGate]] /
    * [[graft.streaming.StreamingNearDupGate]] when arrivals come as a
    * daily drop instead of a stream. One row per batch document:
    * (id, dup_exact [1 if its content key already exists in the
    * corpus], near_id [best corpus near-match ≥ `threshold`, else
    * null], jaccard). The corpus is NEVER self-joined — its own
    * internal duplicates are not this operator's question.
    *
    * Scale shape: both sides collapse to (content key, shingle set,
    * banded MinHash) in one pass each; the exact check is a semi-join
    * on the key (narrow); near-dup candidates come from a batch→corpus
    * band equi-join with the CORPUS bucket sizes capped by AGGREGATE
    * (a boilerplate band with a million corpus members is skipped, the
    * [[minhashLsh]] cap, de-windowed); the best corpus match per batch
    * doc is a mergeable struct-max. Batch-side cost scales with the
    * batch, not the corpus.
    */
  def againstCorpus(batch: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String, shingleK: Int = 1, numHashes: Int = 16,
      bands: Int = 4, rows: Int = 4, threshold: Double = 0.8,
      maxBucketSize: Int = 1000,
      index: IndexStore = IndexStore.default,
      minParallelism: Int = 0): DataFrame = {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    graft.functions.MinHashSig.register(batch.sparkSession)
    val b0 = IndexStore.persist(
      Spread.byKey(batch, idCol, minParallelism).select(
        col(idCol).cast("long").as("id"),
        contentKey(col(textCol)).as("__h"),
        array_distinct(shingles(tokens(col(textCol)), shingleK)).as("sset")),
      index)
    val c0 = IndexStore.persist(
      Spread.byKey(corpus, idCol, minParallelism).select(
        col(idCol).cast("long").as("cid"),
        contentKey(col(textCol)).as("__h"),
        array_distinct(shingles(tokens(col(textCol)), shingleK)).as("cset")),
      index)
    val exactHits = b0
      .join(c0.select(col("__h")).distinct(), Seq("__h"), "left_semi")
      .select(col("id")).withColumn("__ex", lit(1))
    val bs = b0.filter(size(col("sset")) > 0)
      .withColumn("sig", minhashSignature(col("sset"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .select(col("id"), col("sset"), col("band"))
    val cs0 = c0.filter(size(col("cset")) > 0)
      .withColumn("sig", minhashSignature(col("cset"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .select(col("cid"), col("cset"), col("band"))
    val okBands = cs0.groupBy(col("band")).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize).select(col("band"))
    val near = bs.join(cs0.join(okBands, Seq("band")), Seq("band"))
      .select(col("id"), col("cid"), col("sset"), col("cset"))
      .dropDuplicates("id", "cid")
      .withColumn("inter", size(array_intersect(col("sset"), col("cset"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sset")) + size(col("cset")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .groupBy(col("id"))
      .agg(max(struct(col("jaccard"), (-col("cid")).as("nc"))).as("__w"))
      .select(col("id"), (-col("__w.nc")).as("near_id"),
        col("__w.jaccard").as("jaccard"))
    b0.select(col("id"))
      .join(exactHits, Seq("id"), "left")
      .join(near, Seq("id"), "left")
      .select(col("id"),
        when(col("__ex").isNull, lit(0)).otherwise(lit(1)).as("dup_exact"),
        col("near_id"), col("jaccard"))
  }

  /** Containment dedup — the ASYMMETRIC case both near-dup families
    * miss: document A reproduced nearly whole INSIDE a longer document
    * B (a wire story embedded in a portal page, a README pasted into a
    * repo dump). Jaccard ~ |A|/|B| is tiny when B is much longer, so
    * symmetric near-dup never fires; containment(A,B) =
    * |fp(A) ∩ fp(B)| / |fp(A)| ignores B's extra bulk. A document is
    * flagged when ≥ `tau` of its (df-pruned) winnowing fingerprints
    * appear in a STRICTLY LONGER document (`lenCol` ties break to the
    * smaller id as container); per flagged doc the best container is
    * kept — max ratio, then smallest container id. Returns
    * (doc_id, container_id, shared, n_fp, ratio); the doc_ids are the
    * drop set.
    *
    * Scale shape: winnowing collapses text to (fingerprint, id) postings
    * in one pass ([[TextAnalysis.winnowRolling]], codegen'd O(n));
    * boilerplate fingerprints are df-pruned by AGGREGATE (never a
    * window on the fingerprint — the q116 lesson); candidate pairs are
    * posting-list self-joins bounded by maxDf² per fingerprint; the
    * per-doc fingerprint count, the ratio, and the best-container
    * argmax are all mergeable aggregates (max over a (ratio, shared,
    * −id) struct — no per-doc window). The ratio is one exact integer
    * division, engine-identical.
    */
  def containment(df: DataFrame, idCol: String, textCol: String,
      lenCol: String, tau: Double = 0.9, minShared: Int = 10,
      maxDf: Int = 50, k: Int = 8, w: Int = 4,
      index: IndexStore = IndexStore.default,
      minParallelism: Int = 0): DataFrame =
    containmentPairs(df, idCol, textCol, lenCol, tau, minShared, maxDf,
        k, w, index, minParallelism)
      .groupBy(col("doc_id"))
      .agg(max(struct(col("ratio"), col("shared"), (-col("container_id")).as("nb")))
          .as("__w"),
        max(col("n_fp")).as("n_fp"))
      .select(col("doc_id"), (-col("__w.nb")).as("container_id"),
        col("__w.shared").as("shared"), col("n_fp"), col("__w.ratio").as("ratio"))

  /** EVERY qualifying (contained, container) pair behind [[containment]]
    * — (doc_id, container_id, shared, n_fp, ratio) — for analyses that
    * need the full containment graph (e.g. the cross-source syndication
    * matrix) rather than one best container per doc. Same guards, same
    * aggregate-only shapes. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      lenCol: String, tau: Double = 0.9, minShared: Int = 10,
      maxDf: Int = 50, k: Int = 8, w: Int = 4,
      index: IndexStore = IndexStore.default,
      minParallelism: Int = 0): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau $tau out of (0,1]")
    graft.functions.RollingFingerprint.register(df.sparkSession)
    val fsets = IndexStore.persist(
      Spread.byKey(df, idCol, minParallelism).select(
          col(idCol).cast("long").as("id"), col(lenCol).cast("long").as("len"),
          TextAnalysis.winnowRolling(col(textCol), k, w).as("wn"))
        .filter(size(col("wn")) > 0),
      index)
    val inv = fsets.select(col("id"), explode(col("wn")).as("f"))
    val keepF = inv.groupBy(col("f")).agg(count(lit(1)).as("__fdf"))
      .filter(col("__fdf") <= maxDf).select(col("f"))
    val pruned = IndexStore.persist(inv.join(keepF, Seq("f")), index)
    val counts = pruned.groupBy(col("id")).agg(count(lit(1)).as("n_fp"))
    val pairs = pruned.select(col("f"), col("id").as("a"))
      .join(pruned.select(col("f"), col("id").as("b")), Seq("f"))
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    val scored = pairs
      .join(counts.select(col("id").as("a"), col("n_fp")), Seq("a"))
      .join(fsets.select(col("id").as("a"), col("len").as("__la")), Seq("a"))
      .join(fsets.select(col("id").as("b"), col("len").as("__lb")), Seq("b"))
      .withColumn("ratio",
        col("shared").cast("double") / col("n_fp").cast("double"))
      .filter(col("ratio") >= lit(tau) &&
        (col("__lb") > col("__la") ||
          (col("__lb") === col("__la") && col("b") < col("a"))))
    scored.select(col("a").as("doc_id"), col("b").as("container_id"),
      col("shared"), col("n_fp"), col("ratio"))
  }

  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, minParallelism: Int = 0): DataFrame = {
    val ch = TextAnalysis.chunks(df, idCol, textCol,
      chunkSize = chunkSize, stride = chunkSize, minParallelism = minParallelism)
    val winners = ch.groupBy(col("chunk_hash"))
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("__w"))
    ch.join(winners, Seq("chunk_hash"))
      .withColumn("keep",
        (col("doc_id") === col("__w.doc_id") &&
          col("chunk_id") === col("__w.chunk_id")).cast("int"))
      .drop("__w")
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        col("chunk_hash"), col("keep"))
  }

  /** Exact duplicated-span excision — ExactSubstr dedup (Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022) re-expressed relationally: instead of a suffix array over
    * the concatenated corpus, every overlapping `n`-token span is
    * fingerprinted and grouped, an occurrence whose span appears
    * anywhere else in the corpus is excised UNLESS it is the canonical
    * (minimum (id, pos)) occurrence, and the surviving tokens re-join
    * into the cleaned text. Whole-document dedup ([[exact]]) keeps one
    * copy of an identical document; [[chunkDedup]] catches ALIGNED
    * boilerplate; span excision catches duplicated passages at any
    * offset inside otherwise-distinct documents — the case both miss.
    *
    * Returns (idCol, n_tokens, removed_tokens, clean_text), one row per
    * input row; `clean_text` re-joins surviving tokens with single
    * spaces (tokenization is whitespace-normalizing by construction).
    *
    * Span identity is a 128-bit fingerprint: TWO independent per-token
    * xxhash64 families (plain and salted — 2L hashes per L-token doc),
    * then xxhash64 over each family's n-token-hash slice for the two
    * 64-bit halves — no per-span string is ever built and no
    * cryptographic digest is paid. The halves being driven by
    * independent token families matters: a single cross-token 64-bit
    * collision can only corrupt one half. Random-collision probability
    * at 1e12 spans is ~1e-14 — the same exactness class as a 128-bit
    * digest (the DuckDB oracle replays with md5, also 128-bit; the two
    * agree unless either fingerprint collides).
    *
    * Scale shape: raw spans never shuffle — each occurrence is reduced
    * to (h1, h2, id, pos) longs BEFORE any exchange. Span count AND the
    * canonical occurrence ride one codegen'd HashAggregate over the two
    * hash columns (narrow fixed-width state: a long count + a
    * decimal(38) min of the exact id·1e19+pos packing; map-side
    * partials, so a hot boilerplate span occurring millions of times is
    * one cell per map task, never one window task), and the surviving
    * duplicated-span rows join back to a second pass of the occurrence
    * stream (AQE-broadcast when small, skew-splittable equi-join
    * otherwise).
    * Covered positions then aggregate per doc (an integer-position
    * shuffle keyed by id) and join back; the rebuild probes the covered
    * set via `array_except` (hash-set membership, O(L + |covered|) per
    * row) — per-doc CPU, no exchange. Raw-text repartition stays opt-in
    * via `minParallelism` ([[Spread.byKey]]). */
  def spanExcision(df: DataFrame, idCol: String, textCol: String,
      n: Int = 16, minParallelism: Int = 0): DataFrame = {
    require(n >= 2, s"span width must be >= 2, got $n")
    // the canonical-occurrence packing below is numeric; a non-numeric
    // id would cast to null and silently excise NOTHING — fail loudly
    // instead (the temperature maxGroups posture)
    require(Seq("byte", "short", "int", "integer", "long", "bigint")
        .contains(df.schema(idCol).dataType.typeName),
      s"spanExcision needs an integral id column; ${df.schema(idCol).dataType} " +
        "ids cannot ride the numeric canonical-min packing — map ids to longs first")
    val toks = Spread.byKey(df, idCol, minParallelism)
      .select(col(idCol), tokens(col(textCol)).as("__t"))
    // TWO per-token hashes from INDEPENDENT xxhash64 families (the salt
    // participates in each token's hash, not just the span's): each
    // span is then fingerprinted by xxhash64 over each n-token-hash
    // slice. Deriving both span halves from ONE token-hash array would
    // let a single cross-token 64-bit collision (birthday-likely at
    // web-scale vocabularies) collide spans in BOTH halves at once;
    // with independent per-token families a token collision in one
    // family leaves the other half distinguishing. All-numeric — the
    // occurrence stream costs long ops, not string building.
    val occ = toks
      .filter(size(col("__t")) >= n)
      .select(col(idCol),
        transform(col("__t"), t => xxhash64(t)).as("__th"),
        transform(col("__t"),
          t => xxhash64(lit(0x9E3779B97F4A7C15L), t)).as("__th2"))
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__th")) - lit(n - 1)),
          p => struct(p.as("pos"),
            xxhash64(slice(col("__th"), p, lit(n))).as("h1"),
            xxhash64(slice(col("__th2"), p, lit(n))).as("h2"))))
          .as("__o"))
      .select(col(idCol), col("__o.pos").as("__pos"),
        col("__o.h1").as("__h1"), col("__o.h2").as("__h2"))
    // the canonical (min (id, pos)) occurrence rides the SAME aggregate
    // as the count, as min over an exact decimal(38) packing
    // id*1e19 + pos: 1e19 exceeds any Int position so the packing is
    // order-isomorphic to the lexicographic struct for every
    // representable (long, int) pair, and min(decimal) keeps the
    // aggregate a codegen HashAggregate — min(struct) would force a
    // SortAggregate over the full occurrence stream, and a separate
    // canonical pass would re-explode it a third time
    val packed = col(idCol).cast(DecimalType(38, 0)) * PosPack + col("__pos")
    val spans = occ.groupBy(col("__h1"), col("__h2"))
      .agg(count(lit(1)).as("__c"), min(packed).as("__canon"))
      .filter(col("__c") >= 2)
      .select(col("__h1"), col("__h2"), col("__canon"))
    val dup = occ.join(spans, Seq("__h1", "__h2"))
      .filter(packed =!= col("__canon"))
      .select(col(idCol), col("__pos"))
    val covered = dup
      .select(col(idCol),
        explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__tp"))
      .groupBy(col(idCol))
      .agg(collect_set(col("__tp")).as("__cov"))
    toks.join(covered, Seq(idCol), "left")
      .withColumn("__cov",
        coalesce(col("__cov"), array().cast("array<int>")))
      .withColumn("__keep",
        when(size(col("__t")) === 0, array().cast("array<int>"))
          .otherwise(array_except(
            sequence(lit(1), size(col("__t"))), col("__cov"))))
      .select(col(idCol),
        size(col("__t")).as("n_tokens"),
        size(col("__cov")).as("removed_tokens"),
        concat_ws(" ", transform(col("__keep"),
          p => element_at(col("__t"), p))).as("clean_text"))
  }

  /** 60-bit SimHash of the distinct-token set: bit b is set when more
    * tokens hash to 1 than 0 at position b (sum of ±1 > 0).
    *
    * Computed per-row by the codegen'd [[graft.functions.SimHash60]]
    * expression — a SHUFFLE-FREE projection. The explode formulation
    * (tokens × 60 bit rows through two shuffled aggregations) exchanges
    * 60× the token count at scale; this exchanges nothing. Values are
    * identical (same h60 family), so the q44 oracle replay is unchanged. */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 60,
      minParallelism: Int = 0): DataFrame = {
    require(bits == 60, "the codegen'd signature is fixed at 60 bits (h60 family)")
    graft.functions.SimHash60.register(df.sparkSession)
    Spread.byKey(df, idCol, minParallelism) // raw-text exchange is opt-in
      .filter(size(tokens(col(textCol))) > 0) // explode semantics: no tokens, no row
      .select(col(idCol).as("id"),
        graft.functions.SimHash60.simhash60(tokens(col(textCol))).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    *
    * Candidate generation buckets by 15-bit chunks of the signature
    * (pigeonhole: with 4 chunks, any pair at hamming ≤ 3 must share an
    * identical chunk; larger maxHamming trades recall). The pairwise
    * verification join runs inside chunk buckets only — |bucket|², never
    * |corpus|² — which is what makes this shape survive 100 TB.
    * Verification is exact bit_count(xor). */
  def simhashPairs(sim: DataFrame, maxHamming: Int = 3): DataFrame = {
    val chunked = sim.select(col("id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), 15 * c).bitwiseAND(lit(32767L))): _*)))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "chunk_val")
    val a = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("h_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("h_b"))
    a.join(b, Seq("chunk_idx", "chunk_val")).filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", expr("bit_count(h_a ^ h_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold, found via banded
    * sign-LSH (random-hyperplane, Charikar STOC'02) — `tables` hash
    * tables, each an AND of `planesPerTable` sign bits, OR'd across
    * tables, then exact cosine verification inside buckets.
    *
    * Scale shape: per-row signature work only, then a bucket-keyed
    * self-join — |bucket|² pairs, never |corpus|² (no cross join in the
    * plan; guarded by PlanSpec). Hyperplanes are the deterministic
    * md5-derived family of [[Similarity.planeWeights]], so the candidate
    * set is reproducible (and DuckDB-replayable, like minhashLsh).
    * Recall < 1 by design; raise `tables` for more recall. */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planesPerTable: Int = 4, tables: Int = 8,
      maxBucketSize: Int = 10000, dims: Int = 0,
      index: IndexStore = IndexStore.default): DataFrame = {
    import graft.functions.VectorExpressions
    VectorExpressions.register(df.sparkSession)
    // callers know their embedding width; dims=0 infers it with one tiny
    // driver job (convenience only — pass dims to keep the plan pure)
    val d = if (dims > 0) dims else df.select(size(col(vecCol))).first().getInt(0)
    // sign bits are computed on the raw (double-cast) vector — scale
    // never flips a sign, and the oracle replays the same raw dot
    val keyed = df.select(
        col(idCol).as("id"),
        Similarity.unitNormalize(col(vecCol)).as("v"),
        explode(array((0 until tables).map { t =>
          val bucket = (0 until planesPerTable).map { b =>
            when(VectorExpressions.dot(
              transform(col(vecCol), x => x.cast("double")),
              array(Similarity.planeWeights(t * planesPerTable + b, d).toIndexedSeq.map(lit(_)): _*)) > 0,
              lit(1L << b)).otherwise(lit(0L))
          }.reduce(_ + _)
          struct(lit(t).as("t"), bucket.as("bkt"))
        }: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.t").as("t"), col("tb.bkt").as("bkt"))
    // the bucketed signature index is read by both join sides (the
    // "persist the index" step, as in minhashLsh; placement via `index`).
    // Bucket cap via mergeable groupBy + join-back, never a window on
    // the bucket key: a hot (t,bkt) bucket folds into partial-agg cells
    // and is dropped BEFORE any task has to hold its full row set.
    val keepBuckets = keyed.groupBy(col("t"), col("bkt"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .select(col("t"), col("bkt"))
    val capped = IndexStore.persist(keyed.join(keepBuckets, Seq("t", "bkt")), index)
    val a = capped.select(col("t"), col("bkt"), col("id").as("id_a"), col("v").as("v_a"))
    val b = capped.select(col("t"), col("bkt"), col("id").as("id_b"), col("v").as("v_b"))
    // verify INSIDE the bucket join projection and drop the vectors before
    // deduplicating: the distinct then shuffles only surviving (id, id,
    // cosine) triples, not |candidates| × two dim-wide vectors
    a.join(b, Seq("t", "bkt")).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", VectorExpressions.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
      .dropDuplicates("id_a", "id_b")
  }

  /** SemDeDup — semantic dedup over document embeddings (Abbas et al.,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", 2023): k-means-cluster the embedding space (the
    * Lloyd-trained codebook of [[Similarity.trainCentroids]]), then look
    * for near-duplicates ONLY inside each cluster — semantically
    * redundant documents land in the same cell, so the pairwise work is
    * Σ|cell|², never |corpus|². Complements [[embeddingNearDup]]: the
    * LSH tables catch high-cosine pairs with tunable recall; SemDeDup's
    * cells are exhaustive WITHIN a cell (recall 1 there) and double as
    * the semantic grouping the curation literature keys on.
    *
    * Keep rule is this file's deterministic dedup convention: a row is
    * dropped iff some same-cluster row with a smaller id sits at
    * cosine ≥ `threshold` — the minimum-id representative of every
    * near-dup neighborhood survives. Returns (corpus_id, bucket, kept),
    * one row per input row.
    *
    * Scale shape: assignment is a shuffle-free projection (trained
    * codebook baked as plan literals, K×d driver metadata); the
    * verification self-join is equi-keyed on the cluster id.
    * `nCentroids` IS the scale knob — size it so corpus/nCentroids rows
    * fit one task (the paper runs k ≈ corpus/5k); `maxClusterSize` is
    * the guard: a cell past the cap skips pairing entirely (its rows
    * all keep) instead of detonating a quadratic join — the
    * [[embeddingNearDup]] `maxBucketSize` posture. The assigned table
    * is the candidate index (read by both join sides + the final keep
    * join); placement via `index`, as everywhere in this file. */
  def semDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nCentroids: Int = 8, iters: Int = 2,
      maxClusterSize: Int = 100000,
      index: IndexStore = IndexStore.default): DataFrame =
    // training runs ONCE (eager driver-side collect inside); the
    // assignment projection is then shared by the size count, both join
    // sides, and the final keep join
    semDedupAssigned(Similarity.ivfAssignTrained(df, idCol, vecCol,
      nCentroids, iters), df.sparkSession, threshold, maxClusterSize, index)

  /** [[semDedup]] with a caller-supplied codebook
    * ([[Similarity.ivfAssignWith]]) — cells stay FIXED regardless of the
    * input slice, so the kept set over a corpus equals the union of
    * per-slice decisions against a shared history index (the
    * [[graft.streaming.StreamingSemanticGate]] equivalence contract). */
  def semDedupWith(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Long, Array[Double])], threshold: Double,
      maxClusterSize: Int = 100000,
      index: IndexStore = IndexStore.default): DataFrame =
    semDedupAssigned(Similarity.ivfAssignWith(df, idCol, vecCol, centroids),
      df.sparkSession, threshold, maxClusterSize, index)

  private def semDedupAssigned(assigned: DataFrame,
      session: org.apache.spark.sql.SparkSession, threshold: Double,
      maxClusterSize: Int, index: IndexStore): DataFrame = {
    import graft.functions.VectorExpressions
    VectorExpressions.register(session)
    val sizes = assigned.groupBy(col("bucket")).agg(count(lit(1)).as("__bn"))
    val sized = IndexStore.persist(
      assigned.join(broadcast(sizes), Seq("bucket")), index) // ≤ nCentroids rows
    val pairable = sized.filter(col("__bn") <= maxClusterSize)
    val lhs = pairable.select(col("bucket"), col("corpus_id").as("__ia"),
      col("cv").as("__va"))
    val rhs = pairable.select(col("bucket"), col("corpus_id").as("__ib"),
      col("cv").as("__vb"))
    // verify inside the cell join's projection; only surviving ids are
    // distinct'd (narrow shuffle), vectors never leave the join
    val drops = lhs.join(rhs, Seq("bucket"))
      .filter(col("__ib") < col("__ia") &&
        VectorExpressions.dot(col("__va"), col("__vb")) >= threshold)
      .select(col("__ia").as("corpus_id")).distinct()
    sized.join(drops.withColumn("__d", lit(1)), Seq("corpus_id"), "left")
      .select(col("corpus_id"), col("bucket"),
        when(col("__d").isNull, lit(1)).otherwise(lit(0)).as("kept"))
  }
}
