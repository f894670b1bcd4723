package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exact: keeps min id per content group with dup_count") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 3L), (2L, 1L)))
  }

  test("exactNormalized: case/whitespace variants collapse") {
    val df = Seq((1L, "Hello  World"), (2L, " hello world "), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactNormalized(df, "doc_id", "text")
    assert(out.count() == 2)
    assert(out.filter(col("doc_id") === 1).select("dup_count").as[Long].head() == 2)
  }

  test("minhashLsh: finds an injected near-duplicate pair, skips dissimilar") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda" // 9/11 jaccard
    val far = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "doc_id", "text",
      shingleK = 1, numHashes = 16, bands = 8, rows = 2, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhashLsh fast family (xxhash64) finds the same injected near-dup") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLsh(df, "doc_id", "text",
      shingleK = 1, numHashes = 16, bands = 8, rows = 2, threshold = 0.7,
      hashFamily = graft.functions.TextFunctions.xxFamily)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhash: identical token sets → identical signature; hamming 0 pair found") {
    val df = Seq((1L, "spark scala data"), (2L, "data spark scala"), (3L, "totally different words here"))
      .toDF("doc_id", "text")
    val sim = Dedup.simhash(df, "doc_id", "text")
    val m = sim.as[(Long, Long)].collect().toMap
    assert(m(1L) == m(2L))
    val pairs = Dedup.simhashPairs(sim, maxHamming = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }

  test("ngramJaccard: overlapping documents found, stop-gram-only pairs pruned") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the sleepy dog"), // high 3-gram overlap with 1
      (3L, "completely different content entirely here now truly")
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccard(df, "doc_id", "text", n = 3, threshold = 0.3, maxDf = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
    // with maxDf = 1 every shared gram is a "stop gram" → no candidates
    val pruned = Dedup.ngramJaccard(df, "doc_id", "text", n = 3, threshold = 0.3, maxDf = 1)
      .count()
    assert(pruned == 0)
  }

  test("IndexStore.Path: minhashLsh pair set equals Memory variant; index is on disk") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    val far = "one two three four five six seven eight nine ten"
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lsh-idx").toString
    def run(store: IndexStore) =
      Dedup.minhashLsh(df, "doc_id", "text",
        shingleK = 1, numHashes = 16, bands = 8, rows = 2, threshold = 0.7,
        index = store)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mem = IndexStore.Memory()
    val viaPath = run(IndexStore.Path(dir))
    val viaMemory = run(mem)
    assert(viaPath == viaMemory && viaPath == Set((1L, 2L)))
    // the signature index materialized as parquet at the caller's dir
    val files = new java.io.File(dir).listFiles()
    assert(files != null && files.exists(_.getName.endsWith(".parquet")),
      s"no parquet index at $dir")
    mem.release()
  }

  test("IndexStore.Path: embeddingNearDup pair set equals Memory variant") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val df = Seq((1L, v), (2L, v.map(_ * 2.0f)), (3L, Array(-3.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-emb-idx").toString
    def run(store: IndexStore) =
      Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.99, dims = 3, index = store)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val mem = IndexStore.Memory()
    assert(run(IndexStore.Path(dir)) == run(mem))
    mem.release()
  }

  test("IndexStore release is instance-scoped: one query's release leaves another's index live") {
    spark.catalog.clearCache()
    // two DIFFERENT corpora: Spark's CacheManager dedupes identical plans,
    // so same-input queries would share one cache entry regardless of store
    val dfA = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta")).toDF("doc_id", "text")
    val dfB = Seq((3L, "mu nu xi omicron"), (4L, "mu nu xi pi")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame, store: IndexStore): Unit =
      Dedup.minhashLsh(df, "doc_id", "text",
        shingleK = 1, numHashes = 16, bands = 8, rows = 2, threshold = 0.1,
        index = store).collect()
    val a, b = IndexStore.Memory()
    run(dfA, a); run(dfB, b)
    val withBoth = spark.sparkContext.getPersistentRDDs.size
    assert(withBoth > 0, "indexes were not persisted")
    a.release() // must NOT unpersist b's live index
    assert(spark.sparkContext.getPersistentRDDs.size < withBoth,
      "a.release() unpersisted nothing")
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "a.release() unpersisted the OTHER query's index")
    b.release()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "release() left a persisted index behind")
  }

  test("default store leaks nothing: no cached RDDs survive a default-store query") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta delta"))
      .toDF("doc_id", "text")
    Dedup.minhashLsh(df, "doc_id", "text",
      shingleK = 1, numHashes = 16, bands = 8, rows = 2, threshold = 0.1)
      .collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"default-store query left cached RDDs pinned: $leaked")
  }

  test("chunkDedup: first occurrence kept, cross-doc duplicate spans dropped") {
    val span = (1 to 8).map(i => s"w$i").mkString(" ") // one full chunk
    val df = Seq(
      (1L, s"$span unique tail one two three four five"), // chunk 0 = span (first)
      (2L, s"$span other ending here for this doc yes"),  // chunk 0 duplicates doc 1's
      (3L, "entirely different words in this document body")
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, "doc_id", "text", chunkSize = 8)
      .select("doc_id", "chunk_id", "keep").as[(Long, Long, Int)].collect()
    val drops = out.filter(_._3 == 0)
    assert(drops.toSeq == Seq((2L, 0L, 0)), s"exactly doc 2's first chunk drops: ${out.toSeq}")
    // every chunk hash retains exactly one keeper
    assert(out.count(_._3 == 1) == out.length - 1)
    // aggregate-only plan: winner selection must not use a window
    val plan = Dedup.chunkDedup(df, "doc_id", "text", chunkSize = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"chunkDedup plans a window:\n${plan.take(2000)}")
  }

  test("spanExcision: cross-doc span cut from non-canonical doc only") {
    val df = Seq(
      (1L, "a b c d e"),       // canonical occurrence of "a b c"
      (2L, "x y a b c z"),     // duplicate at pos 3 → excised
      (6L, "zz"))              // shorter than n → untouched
      .toDF("doc_id", "text")
    val m = Dedup.spanExcision(df, "doc_id", "text", n = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(1L) == ((5, 0, "a b c d e")))
    assert(m(2L) == ((6, 3, "x y z")))
    assert(m(6L) == ((1, 0, "zz")))
  }

  test("spanExcision: within-doc repeat excised after first occurrence") {
    val df = Seq((3L, "p q r s p q r")).toDF("doc_id", "text")
    val m = Dedup.spanExcision(df, "doc_id", "text", n = 3)
      .select("doc_id", "removed_tokens", "clean_text")
      .as[(Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(3L) == ((3, "p q r s")))
  }

  test("spanExcision: full duplicate excises entire non-canonical doc") {
    val df = Seq((4L, "m n o"), (5L, "m n o")).toDF("doc_id", "text")
    val m = Dedup.spanExcision(df, "doc_id", "text", n = 3)
      .select("doc_id", "removed_tokens", "clean_text")
      .as[(Long, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(4L) == ((0, "m n o")))
    assert(m(5L) == ((3, "")))
  }

  test("spanExcision: empty text and span-free corpora pass through whole") {
    // empty text exercises the zero-token rebuild guard (sequence(1, 0)
    // would be [1, 0] in Spark, not []); an all-unique corpus exercises
    // the empty duplicated-span set (left join misses → zero removed)
    val df = Seq(
      (7L, ""),                 // zero tokens
      (8L, "only two"),         // below n
      (9L, "each token here is globally unique"),
      (10L, "and so is every token in this row"))
      .toDF("doc_id", "text")
    val m = Dedup.spanExcision(df, "doc_id", "text", n = 3)
      .select("doc_id", "n_tokens", "removed_tokens", "clean_text")
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(m(7L) == ((0, 0, "")))
    assert(m(8L) == ((2, 0, "only two")))
    assert(m(9L) == ((6, 0, "each token here is globally unique")))
    assert(m(10L) == ((8, 0, "and so is every token in this row")))
  }

  test("embeddingNearDup: duplicate vector detected at threshold") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val df = Seq((1L, v), (2L, v.map(_ * 2.0f)), (3L, Array(-3.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingNearDup(df, "vec_id", "embedding", 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L))) // scaled copy has cosine 1
  }

  test("exact: null content dedupes to one representative, never vanishes") {
    // md5(null) is null and a null join key matches nothing — without
    // the contentKey sentinel both null rows would silently disappear
    val df = Seq((1L, null: String), (2L, null: String), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .select("doc_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 3L -> 1L),
      s"null texts must keep their min-id representative: $out")
  }

  test("spanExcision: non-integral id column is refused loudly") {
    // string ids would cast to null in the canonical-min packing and
    // silently excise nothing
    val df = Seq(("a", "x y z"), ("b", "x y z")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.spanExcision(df, "doc_id", "text", n = 2)
    }
    assert(e.getMessage.contains("integral id"))
  }

  test("semDedup: min-id representative survives, one row per input") {
    // 1 and 2 are scaled copies (cosine 1, same cluster necessarily);
    // 3 is near-orthogonal to both
    val v = Array(1.0f, 2.0f, 3.0f)
    val df = Seq((1L, v), (2L, v.map(_ * 2.0f)), (3L, Array(-3.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", threshold = 0.99,
        nCentroids = 2, iters = 1)
      .select("corpus_id", "kept").as[(Long, Int)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L)) // one row per input row
    assert(out(1L) == 1 && out(2L) == 0 && out(3L) == 1)
  }

  test("semDedup: a cluster past maxClusterSize skips pairing (all kept)") {
    val v = Array(1.0f, 2.0f, 3.0f)
    val df = Seq((1L, v), (2L, v.map(_ * 2.0f)), (3L, v.map(_ * 3.0f)))
      .toDF("vec_id", "embedding")
    val out = Dedup.semDedup(df, "vec_id", "embedding", threshold = 0.99,
        nCentroids = 1, iters = 1, maxClusterSize = 2)
      .select("corpus_id", "kept").as[(Long, Int)].collect().toMap
    assert(out.values.forall(_ == 1)) // 3-row cluster > cap: guard, not detonate
  }

  test("semDedup: within-cell join is equi-keyed — no cartesian in the plan") {
    val df = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val plan = Dedup.semDedup(df, "vec_id", "embedding", threshold = 0.9,
      nCentroids = 2, iters = 1).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("containment: short doc inside a longer one is flagged; symmetric and clean docs are not") {
    val passage = "the winnowing fingerprints of this exact passage will appear " +
      "wholesale inside the containing document that reproduces it in full"
    val docs = Seq(
      (1L, passage),
      (2L, s"a much longer portal page with navigation text first, then $passage " +
        "and finally several closing paragraphs of unrelated editorial content " +
        "to make the containing side clearly longer than the contained one"),
      (3L, "completely unrelated material about tidal measurement instruments " +
        "sharing no phrasing with either of the other two documents at all"))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val out = Dedup.containment(docs, "doc_id", "text", "n_chars",
        tau = 0.8, minShared = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2)) == List((1L, 2L)),
      s"only the short doc is contained, and only in the longer one: $out")
    val (_, _, shared, nfp, ratio) = out.head
    assert(ratio >= 0.8 && ratio <= 1.0 && shared <= nfp)

    // identical twins (equal length): the SMALLER id is the container,
    // so exactly the larger id is flagged — never both, never neither
    val twins = Seq((10L, passage), (11L, passage))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val t = Dedup.containment(twins, "doc_id", "text", "n_chars",
        tau = 0.8, minShared = 3)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(t.map(x => (x._1, x._2, x._5)) == List((11L, 10L, 1.0)), t.toString)

    // scale contract: df-prune and argmax are aggregates — no Window
    val plan = Dedup.containment(docs, "doc_id", "text", "n_chars")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "containment must not plan a Window")
  }

  test("againstCorpus: exact / near / novel disposition; corpus never self-reported") {
    val base = "shared tokens one two three four five six seven eight nine ten"
    val corpus = Seq(
      (100L, base),
      (101L, base),                          // corpus-internal dup — NOT our question
      (102L, "completely different corpus material about glacier physics"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (1L, base),                            // exact dup of 100/101
      (2L, base.replace("ten", "eleven")),   // near dup (11/12 jaccard... ~0.85)
      (3L, "a wholly novel arrival sharing nothing with the corpus today"))
      .toDF("doc_id", "text")
    val out = Dedup.againstCorpus(batch, corpus, "doc_id", "text",
        threshold = 0.8)
      .orderBy("id")
      .as[(Long, Int, Option[Long], Option[Double])].collect().toList
    assert(out.map(_._1) == List(1L, 2L, 3L), "every batch row dispositioned")
    val Seq(d1, d2, d3) = out
    assert(d1._2 == 1 && d1._3 == Some(100L) && d1._4 == Some(1.0),
      s"exact dup, best near match is the smaller corpus id: $d1")
    assert(d2._2 == 0 && d2._3 == Some(100L) &&
      d2._4.exists(j => j > 0.8 && j < 1.0), s"near dup only: $d2")
    assert(d3._2 == 0 && d3._3.isEmpty && d3._4.isEmpty, s"novel: $d3")
    // corpus ids never appear as output rows
    assert(out.forall(_._1 < 100L))

    // a zero bucket cap suppresses every near candidate; exact unaffected
    val capped = Dedup.againstCorpus(batch, corpus, "doc_id", "text",
        threshold = 0.8, maxBucketSize = 0)
      .orderBy("id")
      .as[(Long, Int, Option[Long], Option[Double])].collect().toList
    assert(capped.map(_._2) == List(1, 0, 0) && capped.forall(_._3.isEmpty))
  }
}
