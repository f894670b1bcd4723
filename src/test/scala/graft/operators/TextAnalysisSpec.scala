package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("stats: counts and ratios on a known document") {
    val df = Seq((1L, "the cat sat on the mat")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_distinct") == 5)
    assert(r.getAs[Double]("en_stopword_ratio") == 2.0 / 6.0) // 'the' twice
    assert(r.getAs[Double]("punct_ratio") == 0.0)
  }

  test("qualityScore stays in [0,1]") {
    val scores = graft.Tables.documents(spark, sf)
      .select(TextAnalysis.qualityScore(col("text")).as("q")).as[Double].collect()
    assert(scores.nonEmpty && scores.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId: obvious english/spanish sentences classified; no-hit → und") {
    val df = Seq(
      (1L, "the quick fox is in the barn and it is fast"),
      (2L, "el perro que corre en la casa no es un gato"),
      (3L, "xyzzy qwerty")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df, "doc_id", "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("fingerprint: invariant under word order, sensitive to content") {
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "gamma alpha beta"), (3L, "alpha beta delta"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    val fps = df.as[(Long, String)].collect().toMap
    assert(fps(1L) == fps(2L))
    assert(fps(1L) != fps(3L))
  }

  test("winnow: shared fingerprints for overlapping text, none for disjoint") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = "completely unrelated content with different characters entirely present"
    val df = Seq((1L, a), (2L, a + " extra suffix appended"), (3L, b))
      .toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.winnow(col("text")).as("wn"))
    val m = df.as[(Long, Seq[Long])].collect().toMap
    val overlap12 = m(1L).toSet & m(2L).toSet
    val overlap13 = m(1L).toSet & m(3L).toSet
    assert(overlap12.nonEmpty)
    assert(overlap13.isEmpty)
  }

  test("tfidf: corpus-wide terms score zero, rare terms rank top, k respected") {
    // 'common' is in all 4 docs (idf=ln(1)=0); each doc has one unique term
    val docs = Seq(
      (1L, "common alpha alpha shared"),
      (2L, "common beta shared shared"),
      (3L, "common gamma gamma gamma"),
      (4L, "common delta")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidf(docs, "doc_id", "text", topK = 2)
      .as[(Long, String, Long, Long, Double, Int)].collect()
    val byDoc = out.groupBy(_._1)
    assert(byDoc.values.forall(_.length <= 2), "topK must cap per-doc rows")
    // rank-1 per doc; doc 2 is the engineered tie: beta = 1·ln4 equals
    // shared = 2·ln2 exactly, so the rounded-score + term-asc rule must
    // pick 'beta' deterministically
    val top1 = out.filter(_._6 == 1).map(r => r._1 -> r._2).toMap
    assert(top1 == Map(1L -> "alpha", 2L -> "beta", 3L -> "gamma", 4L -> "delta"))
    // 'common' appears in every doc → idf 0 → score6 exactly 0.0
    assert(out.filter(_._2 == "common").forall(_._5 == 0.0))
  }

  test("chunks: coverage, overlap, short tails, and degenerate docs") {
    val text150 = (1 to 150).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, text150),            // 150 tokens → chunks at 0,48,96 → sizes 64,64,54
      (2L, "just five little tokens here"), // single short chunk
      (3L, ""),                 // no tokens → no chunks
      (4L, (1 to 64).map(i => s"t$i").mkString(" "))) // exactly one full chunk
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunks(docs, "doc_id", "text",
        chunkSize = 64, stride = 48)
      .as[(Long, Int, Int, String)].collect()
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc(1L).map(_._3).toSeq == Seq(64, 64, 54))
    assert(byDoc(2L).map(_._3).toSeq == Seq(5))
    assert(!byDoc.contains(3L), "empty docs produce no chunks")
    assert(byDoc(4L).map(_._3).toSeq == Seq(64), "exact fit → exactly one chunk")
    // chunk ids are dense from 0
    assert(byDoc(1L).map(_._2).toSeq == Seq(0, 1, 2))
    // overlap: chunk 1 of doc 1 starts at token 49 (stride 48)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest((49 to 112).map(i => s"w$i").mkString(" ").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(byDoc(1L)(1)._4 == h, "chunk 1 content must be tokens 49..112")
  }

  test("bm25: rare terms outweigh common, length normalization, topK") {
    val filler = (1 to 40).map(i => s"f$i").mkString(" ")
    val df = Seq(
      (1L, s"needle $filler"),          // rare term, long doc
      (2L, "needle common"),            // rare term, short doc
      (3L, s"common common common $filler"), // common term repeated
      (4L, "common here"),
      (5L, "common there"),
      (6L, "nothing relevant at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(df, "doc_id", "text",
        query = Seq("needle", "common"), topK = 3)
      .select("doc_id", "n_terms", "score6")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 3, "topK respected")
    // doc 2 matches the rare term in a 2-token doc -> best score
    assert(out.head._1 == 2L)
    assert(out.head._2 == 2L, "doc 2 matches both terms")
    // every returned doc matched at least one query term; scores ranked
    assert(out.map(_._3).toSeq == out.map(_._3).sorted(Ordering[Double].reverse).toSeq)
    assert(!out.map(_._1).contains(6L))
  }

  test("repetition: engineered ratios, degenerate docs, flag thresholds") {
    val df = Seq(
      (1L, "a a a a"),                    // pure repetition
      (2L, "q r s t u v w x y z"),        // all distinct
      (3L, "spam ham spam ham spam ham"), // dominant 2-gram
      (4L, "solo"),                       // no 2/3-grams
      (5L, "")                            // empty
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetition(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "dup_token_frac", "top_2gram_frac",
        "top_3gram_frac", "flagged")
      .as[(Long, Int, Double, Double, Double, Int)].collect()

    // doc 1: 4 tokens, 1 distinct -> dup 0.75; "a a" is all 3 bigrams
    assert(r(0) == ((1L, 4, 0.75, 1.0, 1.0, 1)))
    // doc 2: no repetition; 9 distinct bigrams -> top frac 1/9, unflagged
    assert(r(1)._3 == 0.0 && math.abs(r(1)._4 - 1.0 / 9) < 1e-15 && r(1)._6 == 0)
    // doc 3: "spam ham" appears 3 of 5 bigrams -> 0.6 > 0.2 -> flagged
    assert(r(2)._4 == 0.6 && r(2)._6 == 1)
    // doc 4: single token -> gram fracs are 0, not NaN
    assert(r(3) == ((4L, 1, 0.0, 0.0, 0.0, 0)))
    // doc 5: empty -> all zeros, no division blowup
    assert(r(4) == ((5L, 0, 0.0, 0.0, 0.0, 0)))
  }

  test("lmPerplexity: hand-computed bigram NLL on a 3-doc corpus") {
    // corpus bigrams: "a b" x2 (docs 1,2), "a c" x1 (doc 3)
    // ctx(a)=3, V=3, alpha=1:
    //   u(a b) = -ln((2+1)/(3+3)) = ln 2   = 0.693147 (half-up-6)
    //   u(a c) = -ln((1+1)/(3+3)) = ln 3   = 1.098612
    val df = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val m = TextAnalysis.lmPerplexity(df, "doc_id", "text",
        alpha = 1.0, headPpl = 2.5, tailPpl = 2.9)
      .select("doc_id", "n_bigrams", "nll6", "ppl6", "bucket")
      .as[(Long, Long, Double, Double, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(m(1L) == ((1L, 0.693147, 2.0, "head")))
    assert(m(2L) == m(1L))
    assert(m(3L)._2 == 1.098612)
    assert(m(3L)._3 == 2.999999 && m(3L)._4 == "tail") // exp(ln 3) rounds down
  }

  test("lmPerplexity: short docs are unscored; common phrasing scores lower") {
    val df = Seq(
      (1L, "one"), (2L, ""),
      (3L, "x y x y x y x y"),   // every bigram corpus-frequent
      (4L, "x q y r x s y u"))   // bigrams unique in corpus
      .toDF("doc_id", "text")
    val m = TextAnalysis.lmPerplexity(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "bucket")
      .as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L) == ((0L, "unscored")))
    assert(m(2L) == ((0L, "unscored")))
    val ppl = TextAnalysis.lmPerplexity(df, "doc_id", "text")
      .select("doc_id", "ppl6").as[(Long, Option[Double])].collect().toMap
    assert(ppl(3L).get < ppl(4L).get)
  }

  test("dsirScore: target-like text outranks off-target; twins tie exactly") {
    val df = Seq(
      (1L, "alpha beta gamma", true),  // the target distribution
      (2L, "alpha beta gamma", false), // raw twin of the target text
      (3L, "delta epsilon zeta", false)) // shares no gram with target
      .toDF("doc_id", "text", "tgt")
    val m = TextAnalysis.dsirScore(df, "doc_id", "text", col("tgt"))
      .select("doc_id", "n_grams", "iscore").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m(1L)._1 == 5L) // 3 unigrams + 2 bigrams
    assert(m(2L) == m(1L)) // identical text → identical exact score
    assert(m(3L)._2 < m(1L)._2) // off-target grams have negative log-ratio
  }

  test("dsirScore: empty docs are excluded; scoring plan is shuffle-free") {
    val df = Seq((1L, "a b", true), (2L, "  ", false), (3L, "c", false))
      .toDF("doc_id", "text", "tgt")
    val scored = TextAnalysis.dsirScore(df, "doc_id", "text", col("tgt"))
    assert(scored.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    // the model is baked in as literals: scoring is scan→filter→project
    assert(!scored.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("dsirTrain/dsirScoreWith: frozen model scores unseen docs — the serving path") {
    val ref = Seq((1L, "alpha beta gamma", true), (2L, "delta epsilon zeta", false))
      .toDF("doc_id", "text", "tgt")
    val model = TextAnalysis.dsirTrain(ref, "text", col("tgt"))
    assert(model.length == 64)
    // composed = train-then-score, must equal the one-shot operator
    val composed = TextAnalysis.dsirScoreWith(ref, "doc_id", "text", model)
      .select("doc_id", "iscore").as[(Long, Long)].collect().toMap
    val oneShot = TextAnalysis.dsirScore(ref, "doc_id", "text", col("tgt"))
      .select("doc_id", "iscore").as[(Long, Long)].collect().toMap
    assert(composed == oneShot)
    // an UNSEEN doc scores against the frozen artifact: target-like
    // grams outrank off-target grams
    val fresh = Seq((10L, "alpha beta"), (11L, "delta epsilon"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.dsirScoreWith(fresh, "doc_id", "text", model)
      .select("doc_id", "iscore").as[(Long, Long)].collect().toMap
    assert(m(10L) > m(11L))
  }

  test("dsirScore: xxhash64 production family — same shape, exact twins still tie") {
    val df = Seq((1L, "alpha beta gamma", true), (2L, "alpha beta gamma", false),
        (3L, "delta epsilon zeta", false))
      .toDF("doc_id", "text", "tgt")
    val m = TextAnalysis.dsirScore(df, "doc_id", "text", col("tgt"),
        hashFn = org.apache.spark.sql.functions.xxhash64(_))
      .select("doc_id", "n_grams", "iscore").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m.keySet == Set(1L, 2L, 3L) && m(1L) == m(2L))
    assert(m(3L)._2 < m(1L)._2)
  }

  test("dsirSelect: k rows, descending deterministic keys, TakeOrdered plan") {
    val df = (1L to 20L).map(i =>
        (i, if (i <= 5) "aa bb cc" else "xx yy zz", i <= 5))
      .toDF("doc_id", "text", "tgt")
    val sel = TextAnalysis.dsirSelect(df, "doc_id", "text", col("tgt"), k = 7)
    val rows = sel.select("doc_id", "key6").as[(Long, Double)].collect()
    assert(rows.length == 7)
    assert(rows.map(_._2).sliding(2).forall(p => p(0) >= p(1)))
    assert(sel.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
    // rerun is byte-identical (derandomized Gumbel)
    val again = TextAnalysis.dsirSelect(df, "doc_id", "text", col("tgt"), k = 7)
      .select("doc_id", "key6").as[(Long, Double)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("classTfidf: distinguishing terms out-rank shared stopwords; exact weights") {
    // 'the' appears in every doc of both clusters; 'spark'/'duck' are
    // cluster-exclusive. c-TF-IDF must rank the exclusive term first.
    val df = Seq(
      (0L, "the spark spark engine"),
      (0L, "the spark plan"),
      (1L, "the duck duck oracle"),
      (1L, "the duck sql"))
      .toDF("cluster", "text")
    val out = TextAnalysis.classTfidf(df, "cluster", "text", topN = 2)
      .orderBy("cluster", "rank")
      .as[(Long, Int, String, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2, t._3)) ==
      List((0L, 1, "spark"), (0L, 2, "engine"), (1L, 1, "duck"), (1L, 2, "oracle")),
      s"exclusive terms out-rank the shared stopword; equal-weight tie " +
        s"('oracle' vs 'sql') breaks by term asc: $out")
    assert(!out.exists(_._3 == "the"),
      "the every-cluster stopword must be damped out of the top-2: " +
        "tf=2, ft=4 gives 2*ln(1+7/4) ~ 2.02 < ln(8) ~ 2.08 of a " +
        "cluster-exclusive hapax")
    // closed-form: 14 tokens, 2 classes -> A = 7; spark: tf=3, ft=3
    val wSpark = 3.0 * math.log(1.0 + 7.0 / 3.0)
    assert(math.abs(out.head._5 - wSpark) < 1e-12, s"${out.head._5} vs $wSpark")
    val wEngine = 1.0 * math.log(1.0 + 7.0 / 1.0)
    assert(math.abs(out(1)._5 - wEngine) < 1e-12)
    assert(out.head._4 == 3L && out(1)._4 == 1L, "tf carries exact counts")

    // null clusters are excluded, not a label group
    val withNull = df.union(Seq((-1L, "noise")).toDF("cluster", "text")
      .withColumn("cluster", org.apache.spark.sql.functions.lit(null)))
    assert(TextAnalysis.classTfidf(withNull, "cluster", "text", topN = 2)
      .select("cluster").distinct().count() == 2)

    // scale guard: the top-N window must run with group-limit pushdown,
    // so a giant per-cluster vocabulary never sorts in one task
    val plan = TextAnalysis.classTfidf(df, "cluster", "text", topN = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit pushdown in plan")
  }

  test("collocations: closed-form PMI, threshold pruning, unbiased bigram total") {
    // 'alpha beta' planted 5x; doc 6 scatters the same words apart
    val df = (Seq.fill(5)("alpha beta") :+ "gamma alpha gamma beta gamma")
      .toDF("text")
    val out = TextAnalysis.collocations(df, "text", minCount = 5, topN = 3)
      .as[(String, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2)) == List(("alpha beta", 5L)),
      s"only the planted pair clears minCount=5: $out")
    // nu=15 tokens, 6 docs -> nb = 9 true bigrams (NOT the thresholded
    // table's 5); PMI = ln((5/9) / ((6/15)*(6/15))) = ln(125/36)
    assert(math.abs(out.head._3 - math.log(125.0 / 36.0)) < 1e-12,
      s"${out.head._3} vs ${math.log(125.0 / 36.0)}")

    // minCount=1 admits the scattered pairs; planted pair still ranks
    // first and equal-PMI singles tie-break by bigram asc
    val all = TextAnalysis.collocations(df, "text", minCount = 1, topN = 10)
      .as[(String, Long, Double)].collect().toList
    assert(all.head._1 == "alpha beta")
    assert(all.map(_._1).distinct.size == all.size)
    val singles = all.filter(_._2 == 1L).map(_._1)
    assert(singles == singles.sorted ||
      all.filter(_._2 == 1L).map(_._3).distinct.size > 1,
      s"equal-weight singles must come out in bigram order: $all")

    // global top-N must be a TakeOrderedAndProject, never a full sort
    val plan = TextAnalysis.collocations(df, "text", 1, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "top-N plan shape")
  }

  test("sourceDivergence: closed-form JS with absent-vocabulary tail; zero for the blend itself") {
    // A = {x:2, y:1}, B = {z:3}; corpus q = (1/3, 1/6, 1/2).
    // Both sources work out to JS = 0.75 * ln(4/3), with B exercising
    // the absent-term tail for {x, y} and A for {z}.
    val df = Seq(("A", "x x y"), ("B", "z z z")).toDF("source", "text")
    val out = TextAnalysis.sourceDivergence(df, "source", "text")
      .orderBy("source")
      .as[(String, Long, Long, Double)].collect().toList
    assert(out.map(t => (t._1, t._2, t._3)) == List(("A", 3L, 2L), ("B", 3L, 1L)))
    val expected = 0.75 * math.log(4.0 / 3.0)
    out.foreach { case (s, _, _, js) =>
      assert(math.abs(js - expected) < 1e-8,
        s"$s: $js vs closed-form $expected (nano-nat rounding only)")
      assert(js >= 0 && js <= math.log(2.0) + 1e-12, "JS bounded by ln 2")
    }

    // one source IS the corpus -> p = q everywhere -> JS = 0 exactly
    // (every nano-nat term rounds from 0.0)
    val solo = TextAnalysis.sourceDivergence(
        Seq(("only", "a b b c")).toDF("source", "text"), "source", "text")
      .as[(String, Long, Long, Double)].collect().head
    assert(solo._4 == 0.0, s"self-divergence must be exactly 0: $solo")

    // null source rows are excluded from both sides
    val withNull = df.union(Seq((null.asInstanceOf[String], "w w w"))
      .toDF("source", "text"))
    assert(TextAnalysis.sourceDivergence(withNull, "source", "text")
      .count() == 2)

    // plan: aggregates only — no window, no cross join
    val plan = TextAnalysis.sourceDivergence(df, "source", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct"))
  }

  test("linearProbe: learns label separation, deterministic, shuffle-free scoring") {
    // half the corpus is stopword-dense (label 1e6), half content-only
    // (label 0); the probe must learn weights that separate the classes
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the cat of the house and the dog in the yard is that it for " + s"w$i")
      else (i.toLong, s"quantum flux capacitor $i spectral manifold tensor gradient warp")
    }.toDF("doc_id", "text")
    val label = when(col("doc_id") % 2 === 0, lit(1000000L)).otherwise(lit(0L))
    val model = TextAnalysis.linearProbeTrain(docs, "text", label,
      nBuckets = 64, steps = 8, lrShift = 4)
    assert(model.length == 65)
    // determinism: retraining lands on the identical weight vector
    assert(model == TextAnalysis.linearProbeTrain(docs, "text", label,
      nBuckets = 64, steps = 8, lrShift = 4))
    val scores = TextAnalysis.linearProbeScore(docs, "doc_id", "text", model)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    val pos = (0 until 40 by 2).map(i => scores(i.toLong))
    val neg = (1 until 40 by 2).map(i => scores(i.toLong))
    assert(pos.min > neg.max,
      s"probe must separate the classes: pos.min=${pos.min} neg.max=${neg.max}")
    // serving path is a pure projection: no join, no shuffle, no window
    val plan = TextAnalysis.linearProbeScore(docs, "doc_id", "text", model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Window"),
      s"scoring must be shuffle-free:\n$plan")
  }

  test("bpeTrain: hand-computed merges, greedy overlap rule, lexicographic tie-break") {
    // "aaab"×3 + "ab"×2: round 1 counts (a,a)=6 (two per aaab) vs
    // (a,b)=5 → merge "a a"; round 2: (aa,a)=3 vs (a,b)=5 → "a b";
    // round 3: (aa,ab)=3 → "aa ab". The (a,a) count also pins the
    // overlap rule: aaa yields TWO (a,a) pairs but merging is greedy
    // left-to-right, aaa → (aa) a.
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", merges = 3)
    assert(m == Seq("a a" -> 6L, "a b" -> 5L, "aa ab" -> 3L), s"merges: $m")
    // vocabulary after the merges: the two words are whole subwords
    val vocab = TextAnalysis.bpeVocab(docs, "text", m.map(_._1))
      .as[(String, Long)].collect().toMap
    assert(vocab == Map("aaab" -> 3L, "ab" -> 2L), s"vocab: $vocab")
    // tie-break: (c,d) and (c,e) both count 2 → lexicographically
    // smaller pair merges first
    val tie = Seq((1L, "cd cd ce ce")).toDF("doc_id", "text")
    assert(TextAnalysis.bpeTrain(tie, "text", merges = 1)
      == Seq("c d" -> 2L))
    // merge exhaustion: a fully merged corpus stops early
    assert(TextAnalysis.bpeTrain(tie, "text", merges = 10).length <= 2)
  }

  test("bpeTrain: carried-forward vocabulary ≡ driver-side from-scratch reference, across a re-root boundary") {
    // An independent reference trainer: re-derives pair counts from the
    // raw word map every round (the O(k²) shape bpeTrain used to have),
    // greedy left-to-right merge application, ties (count desc, "a b"
    // string asc). bpeTrain's incremental carry-forward must produce
    // the IDENTICAL merge list and counts.
    def refBpe(corpus: Seq[String], merges: Int): Seq[(String, Long)] = {
      var words: Map[Vector[String], Long] =
        corpus.flatMap(_.split("\\s+")).filter(_.nonEmpty)
          .groupBy(identity).map { case (w, ws) =>
            w.map(_.toString).toVector -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      var done = false
      while (out.length < merges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, c) <- words; i <- 0 until syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), cnt) =
            counts.toSeq.minBy { case ((x, y), c) => (-c, s"$x $y") }
          out += s"$a $b" -> cnt
          words = words.toSeq.map { case (syms, c) =>
            val buf = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                buf += (a + b); i += 2
              } else { buf += syms(i); i += 1 }
            }
            buf.result() -> c
          }.groupBy(_._1).map { case (s, cs) => s -> cs.map(_._2).sum }
        }
      }
      out.toSeq
    }
    // 31 distinct symbols → 30 merge rounds, crossing bpeTrain's
    // 24-round plan re-root; the second word shares a prefix so counts
    // diverge mid-training and the tie-break path is exercised too.
    val texts = Seq(
      "abcdefghijklmnopqrstuvwxyz01234 abcdefghijklm xyz01 xyz01 abc")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size
    val got = TextAnalysis.bpeTrain(docs, "text", merges = 30)
    val want = refBpe(texts, 30)
    assert(got == want,
      s"incremental must equal re-derived:\n got=$got\nwant=$want")
    assert(got.length >= 25, s"must cross the re-root boundary: ${got.length}")
    // training releases every per-round frame it persisted
    assert(spark.sparkContext.getPersistentRDDs.size == persistedBefore,
      "bpeTrain must release every per-round frame")
  }

  test("bpeEncode: per-doc subword counts match hand segmentation; word-type factorization") {
    // merges from the q171-style corpus: "a a", then "a b", then "aa ab"
    val docs = Seq(
      (1L, "aaab aaab aaab ab ab"), // trains the merges
      (2L, "ab ba"),                // ab→1 subword, ba→2 (no "b a" merge)
      (3L, "   "),                  // no tokens: dropped
      (4L, "aaa")                   // greedy overlap: (aa) a → 2 subwords
    ).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs.filter($"doc_id" === 1L), "text", 3)
    assert(m.map(_._1) == Seq("a a", "a b", "aa ab"))
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", m.map(_._1))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    // doc1: aaab ×3 (1 subword each after all merges) + ab ×2 (1 each)
    assert(got == Map(
      1L -> ((5L, 5L)), 2L -> ((2L, 3L)), 4L -> ((1L, 2L))), s"got $got")
    // the plan joins a distinct-word segmentation, it never re-segments
    // per occurrence: no window anywhere
    val plan = TextAnalysis.bpeEncode(docs, "doc_id", "text", m.map(_._1))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("applyMerges: chunked ≡ unchunked segmentation; boundary blocks release at the harness boundary") {
    // 5 valid in-order merges applied at chunk=2 (two materialized
    // boundaries + a lazy tail) must segment identically to the single
    // 5-deep chain.
    val words = Seq(
      (" a  b  c  d  e  f ", 2L),
      (" a  b  c ", 1L),
      (" e  f  a  b ", 4L),
      (" x ", 5L)).toDF("s", "c")
    val merges = Seq("a b", "c d", "ab c", "e f", "abc d")
    val chain = TextAnalysis.applyMerges(words, merges, chunk = 1000)
      .select("s", "c").as[(String, Long)].collect().sorted
    BlockRegistry.releaseAll() // isolate this test's registrations
    val chunked = TextAnalysis.applyMerges(words, merges, chunk = 2)
    val got = chunked.select("s", "c").as[(String, Long)].collect().sorted
    assert(got.sameElements(chain), s"chunked=${got.toSeq} chain=${chain.toSeq}")
    // only the FINAL boundary's blocks are still held (predecessors were
    // released eagerly inside applyMerges); the registry drains them
    assert(BlockRegistry.outstanding >= 1,
      "final checkpoint boundary must be registered for harness release")
    BlockRegistry.releaseAll()
    assert(BlockRegistry.outstanding == 0)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "no blocks may outlive the harness release")
  }

  test("bpeEncode: a merge list past MergeChunk takes the chunked path and stays exact") {
    // 36 distinct symbols in one word → 35 trained merges > MergeChunk
    // (32), so encode exercises the chunked path end-to-end. After all
    // 35 merges the word is ONE subword, so the per-doc counts are
    // hand-checkable: 3 occurrences → (3 words, 3 subwords).
    val w = "abcdefghijklmnopqrstuvwxyz0123456789"
    val docs = Seq((1L, s"$w $w $w"), (2L, s"$w zz")).toDF("doc_id", "text")
    val m = TextAnalysis.bpeTrain(docs, "text", merges = 40).map(_._1)
    assert(m.length >= 35, s"expected >= 35 trainable merges, got ${m.length}")
    assert(m.length > TextAnalysis.MergeChunk)
    val got = TextAnalysis.bpeEncode(docs, "doc_id", "text", m)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((3L, 3L)), s"got $got")
    assert(got(2L)._1 == 2L, s"got $got")
    BlockRegistry.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty)
  }

  test("bpeSave/bpeLoad: versioned tokenizer artifact; encoding with the loaded tokenizer is identical") {
    val path =
      java.nio.file.Files.createTempDirectory("graft-bpe-artifact").toString
    val docs = Seq((1L, "aaab aaab aaab ab ab"), (2L, "ab ba"))
      .toDF("doc_id", "text")
    val m1 = TextAnalysis.bpeTrain(docs, "text", merges = 3)
    val v0 = TextAnalysis.bpeSave(spark, m1, path)
    assert(TextAnalysis.bpeLoad(spark, path) == m1,
      "the loaded merge list must round-trip ordered and exact")
    // retraining versions the artifact; time travel reads the old one
    val docs2 = Seq((1L, "cd cd ce ce ce")).toDF("doc_id", "text")
    val m2 = TextAnalysis.bpeTrain(docs2, "text", merges = 2)
    val v1 = TextAnalysis.bpeSave(spark, m2, path)
    assert(v1 > v0)
    assert(TextAnalysis.bpeLoad(spark, path) == m2)
    assert(TextAnalysis.bpeLoad(spark, path, Some(v0)) == m1)
    // the serving contract: encode with the LOADED tokenizer equals
    // encode with the in-memory one
    val mem = TextAnalysis.bpeEncode(docs, "doc_id", "text", m1.map(_._1))
      .as[(Long, Long, Long)].collect().toSet
    val loaded = TextAnalysis.bpeEncode(docs, "doc_id", "text",
      TextAnalysis.bpeLoad(spark, path, Some(v0)).map(_._1))
      .as[(Long, Long, Long)].collect().toSet
    assert(loaded == mem)
  }

  test("linearProbe: empty corpus trains to zero weights; no-token docs drop from scoring") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val m0 = TextAnalysis.linearProbeTrain(empty, "text", lit(0L))
    assert(m0.forall(_ == 0L))
    val docs = Seq((1L, "alpha beta"), (2L, "   ")).toDF("doc_id", "text")
    val m = TextAnalysis.linearProbeTrain(docs, "text", lit(1000000L))
    val out = TextAnalysis.linearProbeScore(docs, "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L), s"whitespace-only doc must drop: $out")
  }

  test("lexiconClassify: hand-computed argmax with deterministic ties, multi-topic keywords, zero-hit docs, case folding; broadcast + no window") {
    val docs = Seq(
      (1L, "table scan JOIN table"),   // storage 3 (case-folded), compute 1
      (2L, "join stream"),             // compute 1, streaming 1 → tie: compute
      (3L, "nothing matches here"),    // zero hits → unknown
      (4L, "pivot pivot sort"),        // pivot counts for BOTH topics: p 2, compute 3
      (5L, "")                         // empty text → unknown
    ).toDF("doc_id", "text")
    val lex = Map(
      "storage" -> Seq("table", "scan"),
      "compute" -> Seq("join", "sort", "pivot", "pivot"), // dup keyword dedups
      "p" -> Seq("pivot"),
      "streaming" -> Seq("stream"))
    val out = TextAnalysis.lexiconClassify(docs, "doc_id", "text", lex)
    val got = out.as[(Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(
      1L -> (("storage", 3L)),
      2L -> (("compute", 1L)),   // tie with streaming breaks topic-asc
      3L -> (("unknown", 0L)),
      4L -> (("compute", 3L)),   // pivot×2 + sort beats p's pivot×2
      5L -> (("unknown", 0L))), s"got $got")
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"the lexicon side must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("bpeTokenIds: hand-computed id sequences; OOV byte fallback for single-char AND merge-created subwords") {
    // train on a corpus where BOTH merges fire and the intermediate
    // symbol 'ab' is fully consumed by the second merge — so 'ab' is a
    // MERGE-CREATED symbol absent from the final vocabulary
    val train = Seq((1L, "abc abc")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(train, "text", merges = 2).map(_._1)
    assert(merges == Seq("a b", "ab c"), s"got $merges")
    val vocab = TextAnalysis.bpeVocab(train, "text", merges)
    val vids = TextAnalysis.bpeVocabIds(vocab)
    assert(vids.select("sym", "sym_id").as[(String, Long)].collect()
      .toSeq == Seq(("abc", 256L)),
      "single-symbol vocabulary takes the first id past the byte range")
    // serving corpus: 'abx' segments to [ab, x] — 'ab' is a multi-char
    // OOV (merge-created, consumed in training) → UTF-8 bytes [97, 98];
    // 'zq' is two unseen chars → [122, 113]; 'abc' is in-vocab → [256]
    val serve = Seq((7L, "abx zq abc")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTokenIds(serve, "doc_id", "text", merges, vids)
      .orderBy("pos").select("pos", "token_id").as[(Long, Long)]
      .collect().toSeq
    assert(got == Seq(0L -> 97L, 1L -> 98L, 2L -> 120L, 3L -> 122L,
      4L -> 113L, 5L -> 256L), s"got $got")
  }

  test("bpeVocabIds: frequency-ranked ids from 256, symbol-ascending tie-break") {
    val train = Seq((1L, "aa bb bb c")).toDF("doc_id", "text")
    val vids = TextAnalysis.bpeVocabIds(
      TextAnalysis.bpeVocab(train, "text", Seq("a a", "b b")))
    // counts: 'bb' 2, 'aa' 1, 'c' 1 → bb=256, then ties (aa, c) break
    // symbol-ascending: aa=257, c=258
    assert(vids.select("sym", "sym_id").as[(String, Long)].collect()
      .toMap == Map("bb" -> 256L, "aa" -> 257L, "c" -> 258L))
  }

  test("bpePackedExport: every sequence but the last is exactly capacity; ids equal the global token stream") {
    val docs = Seq(
      (1L, "aa bb cc dd"), (2L, "ee ff"), (3L, "gg hh ii"), (4L, "jj"))
      .toDF("doc_id", "text")
    val vids = TextAnalysis.bpeVocabIds(
      TextAnalysis.bpeVocab(docs, "text", Seq.empty))
    val packed = TextAnalysis.bpePackedExport(docs, "doc_id", "text",
      Seq.empty, vids, capacity = 3L)
      .orderBy("seq_id", "out_pos")
      .select("seq_id", "out_pos", "doc_id", "token_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // no merges: every word is its chars → 2 tokens per 2-char word;
    // total 20 tokens → 7 sequences (6 full of 3, one of 2)
    val bySeq = packed.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val lastSeq = bySeq.keys.max
    bySeq.foreach { case (sq, poss) =>
      if (sq != lastSeq) assert(poss == Seq(0L, 1L, 2L),
        s"seq $sq must be exactly capacity, got $poss")
      assert(poss == poss.indices.map(_.toLong), s"seq $sq contiguous")
    }
    // the packed stream, read in (seq, pos) order, IS the doc-order
    // token stream
    val streamIds = packed.map(_._4)
    val direct = TextAnalysis.bpeTokenIds(docs, "doc_id", "text",
        Seq.empty, vids)
      .orderBy("doc_id", "pos").select("token_id").as[Long]
      .collect().toSeq
    assert(streamIds == direct, "packed order must equal the global stream")
  }
}
