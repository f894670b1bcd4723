package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // cosine() is the one entry point that does not self-register the
  // DotProduct function (it has no session in scope) — register here so
  // the suite passes in isolation, not only after another suite ran
  graft.functions.VectorExpressions.register(spark)

  test("cosine: exact values on known vectors") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0)), (Array(1.0, 1.0), Array(2.0, 2.0)))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b")).as("c"))
    val vals = df.as[Double].collect()
    assert(math.abs(vals(0)) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
  }

  test("bruteForceTopK: self-duplicate ranks first with cosine ~1") {
    val emb = Tables.embeddings(spark, sf)
    val dup = emb.filter(col("vec_id") === 0)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label"))
    val corpus = emb.unionByName(dup)
    val top = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0), corpus, "vec_id", "embedding", k = 3)
    val first = top.filter(col("rank") === 1).select("corpus_id", "cosine")
      .as[(Long, Double)].head()
    assert(first._1 == 100000L)
    assert(math.abs(first._2 - 1.0) < 1e-9)
  }

  test("ivfTopK: deterministic codebook; self-duplicate found; recall vs brute force > 0") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val ivf1 = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    val ivf2 = Similarity.ivfTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    assert(ivf1 == ivf2 && ivf1.nonEmpty) // codebook is deterministic, not RNG
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val pairs = ivf1.map { case (q, _, c) => (q, c) }
    val recall = (brute & pairs).size.toDouble / brute.size
    assert(recall > 0.0, s"ivf recall=$recall")
  }

  test("lshTopK: bucketed results are a subset of correct cosine ordering; recall > 0") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 5)
    val brute = Similarity.bruteForceTopK(queries, emb, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(queries, emb, "vec_id", "embedding", 5, planes = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(lsh.nonEmpty)
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall > 0.0, s"lsh recall=$recall")
  }

  test("quantizeInt8: exact components on engineered vectors, zero-vector guard, no shuffle") {
    val df = Seq(
      (1L, Array(127.0f, -127.0f, 0.0f, 63.5f)), // scale exactly 1.0
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f))        // all-zero: scale 0
    ).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("vec_id")
      .select("vec_id", "dim", "scale6", "qhash", "err6")
      .as[(Long, Int, Double, String, Double)].collect()

    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // scale 1.0: q = [127, -127, 0, floor(63.5 + 0.5) = 64]
    assert(out(0) == ((1L, 4, 1.0, h("127,-127,0,64"), 0.25)))
    // zero vector quantizes to zeros with zero error, no division blowup
    assert(out(1) == ((2L, 4, 0.0, h("0,0,0,0"), 0.0)))

    val plan = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quantization must not shuffle:\n$plan")
  }

  test("trainCentroids: deterministic, and trained IVF recall >= train-free on clustered data") {
    // 4 tight, well-separated clusters in 8 dims — adversarial for the
    // train-free codebook (its md5-chosen "centroids" can all land in
    // one cluster), natural for Lloyd (cells converge to the clusters)
    val rnd = new scala.util.Random(42)
    val dirs = Seq(
      Array(1.0, 0, 0, 0, 0, 0, 0, 0), Array(0, 1.0, 0, 0, 0, 0, 0, 0),
      Array(0, 0, 1.0, 0, 0, 0, 0, 0), Array(0, 0, 0, 1.0, 0, 0, 0, 0))
    val corpus = (0 until 200).map { i =>
      val d = dirs(i % 4)
      (i.toLong, d.map(x => (x + rnd.nextGaussian() * 0.05).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)

    val c1 = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nCentroids = 4, iters = 3)
    val c2 = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nCentroids = 4, iters = 3)
    assert(c1.map(_._1) == c2.map(_._1) &&
      c1.map(_._2.toSeq) == c2.map(_._2.toSeq),
      "training must be deterministic run-to-run")

    def recallOf(df: org.apache.spark.sql.DataFrame, brute: Set[(Long, Long)]) = {
      val got = df.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (brute & got).size.toDouble / brute.size
    }
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val trainFree = recallOf(Similarity.ivfTopK(queries, corpus,
      "vec_id", "embedding", k = 10, nCentroids = 4, nprobe = 1), brute)
    val trained = recallOf(Similarity.ivfTopKTrained(queries, corpus,
      "vec_id", "embedding", k = 10, nCentroids = 4, nprobe = 1, iters = 3), brute)
    assert(trained >= trainFree,
      s"trained recall $trained < train-free $trainFree")
    assert(trained > 0.9, s"trained recall $trained should be near-exact on separated clusters")
  }

  test("ivfTopKTrained: nprobe sweep — recall rises monotonically to exact, cost scales with probed cells") {
    // The recall/cost knob, measured (the RangeJoin bucket-width
    // documentation pattern): 8 trained cells over 8 gaussian clusters,
    // queries sitting BETWEEN two cluster directions so their true
    // top-10 spans more than one cell — exactly the regime where nprobe
    // matters. Everything is deterministic (fixed seed, deterministic
    // Lloyd training, exact cosine ranking), so the measured recalls
    // are reproducible, not flaky.
    val rnd = new scala.util.Random(42)
    val dims = 16
    val dirs = (0 until 8).map { c =>
      Array.tabulate(dims)(d => if (d == c * 2) 1.0 else 0.0)
    }
    val corpus = (0 until 400).map { i =>
      val d = dirs(i % 8)
      (i.toLong, d.map(x => (x + rnd.nextGaussian() * 0.08).toFloat))
    }.toDF("vec_id", "embedding")
    // boundary queries: EQUAL blends of adjacent cluster directions —
    // both clusters' members sit at cosine ≈ 0.707 from the query, so
    // its true top-10 interleaves docs from two cells
    val queries = (0 until 16).map { i =>
      val a = dirs(i % 8); val b = dirs((i + 1) % 8)
      (1000L + i, a.zip(b).map { case (x, y) => (0.5 * x + 0.5 * y).toFloat })
    }.toDF("vec_id", "embedding")

    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val got = Similarity.ivfTopKTrained(queries, corpus, "vec_id", "embedding",
          k = 10, nCentroids = 8, nprobe = np, iters = 3)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      np -> (brute & got).size.toDouble / brute.size
    }
    info(s"recall@10 by nprobe: ${recalls.map { case (n, r) => s"$n -> ${"%.3f".format(r)}" }.mkString(", ")}")
    // monotone: probing more cells can only ADD candidates
    recalls.sliding(2).foreach { case Seq((n1, r1), (n2, r2)) =>
      assert(r1 <= r2, s"recall must be monotone in nprobe: $n1->$r1 vs $n2->$r2")
    }
    // nprobe = nCentroids probes every cell: the candidate set is the
    // whole corpus and exact cosine ranking makes recall EXACTLY 1
    assert(recalls.last._2 == 1.0, s"nprobe=8 of 8 cells must be exact: ${recalls.last}")
    // boundary queries split their true top-10 across two cells, so one
    // probe is measurably lossy and the second recovers it — the knob
    // is real, not a flat line
    assert(recalls.head._2 < 1.0, s"nprobe=1 should miss cross-cell neighbors: ${recalls.head}")
    assert(recalls(1)._2 > recalls.head._2,
      s"nprobe=2 must recover cross-cell neighbors: ${recalls.take(2)}")
  }

  test("PQ: deterministic training, valid codes, shuffle-free encode, measured ADC recall") {
    // same clustered-corpus recipe as the nprobe sweep: PQ should hold
    // high recall when the data has real structure
    val rnd = new scala.util.Random(7)
    val dims = 16
    val dirs = (0 until 8).map { c =>
      Array.tabulate(dims)(d => if (d == c * 2) 1.0 else 0.0)
    }
    val corpus = (0 until 400).map { i =>
      val d = dirs(i % 8)
      (i.toLong, d.map(x => (x + rnd.nextGaussian() * 0.08).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 12)

    val b1 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2)
    val b2 = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 2)
    assert(b1.map(t => (t._1, t._2, t._3.toSeq)) ==
      b2.map(t => (t._1, t._2, t._3.toSeq)),
      "PQ training must be deterministic run-to-run")
    assert(b1.map(_._1).toSet == Set(0, 1, 2, 3) &&
      b1.count(_._1 == 0) == 8 && b1.head._3.length == 4,
      s"4 books x 8 codes x 4 dims, got ${b1.size} entries")

    val encoded = Similarity.pqEncode(corpus, "vec_id", "embedding", b1)
    val codes = encoded.select("codes").as[Seq[Long]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 8)),
      "every code must be a valid subspace centroid id")
    val plan = encoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"PQ encoding must be a shuffle-free projection:\n$plan")

    // ADC recall vs exact cosine, measured at two compression points —
    // m is the fidelity/compression knob (the nprobe-sweep pattern):
    // 3 bits/subspace is very coarse, so exact-neighbor recall is
    // partial by design; doubling m must recover it, and the CLUSTER is
    // recovered essentially always (what PQ is for — candidate
    // generation; exact rerank of a shortlist restores ordering)
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def adcTop(m: Int): Set[(Long, Long)] =
      Similarity.pqTopK(queries, corpus, "vec_id", "embedding",
          k = 10, m = m, ksub = 8, iters = 2)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val (adc4, adc8) = (adcTop(4), adcTop(8))
    val r4 = (brute & adc4).size.toDouble / brute.size
    val r8 = (brute & adc8).size.toDouble / brute.size
    info(f"PQ ADC recall@10: m=4 -> $r4%.3f, m=8 -> $r8%.3f")
    assert(r4 >= 0.3, s"ADC recall collapsed at m=4: $r4")
    assert(r8 > r4, s"finer subspaces must raise recall: m=4 $r4 vs m=8 $r8")
    // cluster recall: every query's ADC neighbors come from its own
    // gaussian cluster (vec_id % 8 is the true cluster label)
    val clusterHit = adc4.count { case (q, c) => q % 8 == c % 8 }.toDouble / adc4.size
    info(f"PQ ADC same-cluster fraction (m=4): $clusterHit%.3f")
    assert(clusterHit >= 0.9,
      s"ADC neighbors should stay in the query's cluster: $clusterHit")

    // the serving recipe: overscan shortlist + exact rerank closes the
    // compression recall gap — and its scores ARE the exact cosines
    val rr = Similarity.pqTopKReranked(queries, corpus, "vec_id", "embedding",
        k = 10, overscan = 4, m = 4, ksub = 8, iters = 2)
    val rrSet = rr.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val rrRecall = (brute & rrSet).size.toDouble / brute.size
    info(f"PQ rerank recall@10 (m=4, overscan=4): $rrRecall%.3f")
    assert(rrRecall > r4, s"rerank must beat raw ADC: $rrRecall vs $r4")
    assert(rrRecall >= 0.8, s"overscan-4 rerank should recover most neighbors: $rrRecall")
    val bruteCos = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id", "cosine")
      .as[(Long, Long, Double)].collect().map(t => (t._1, t._2) -> t._3).toMap
    rr.select("query_id", "corpus_id", "cosine").as[(Long, Long, Double)]
      .collect().foreach { case (q, c, cos) =>
        bruteCos.get((q, c)).foreach(exact =>
          assert(cos == exact, s"reranked cosine must be EXACT for ($q,$c)"))
      }
  }

  test("IVF-PQ: coarse pruning + ADC + rerank — recall holds while most of the corpus is never scored") {
    val rnd = new scala.util.Random(11)
    val dims = 16
    val dirs = (0 until 8).map { c =>
      Array.tabulate(dims)(d => if (d == c * 2) 1.0 else 0.0)
    }
    val corpus = (0 until 400).map { i =>
      val d = dirs(i % 8)
      (i.toLong, d.map(x => (x + rnd.nextGaussian() * 0.08).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 12)

    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(queries, corpus, "vec_id", "embedding",
        k = 10, nCentroids = 8, nprobe = 2, m = 4, ksub = 8, iters = 3,
        overscan = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (brute & got).size.toDouble / brute.size
    info(f"IVF-PQ recall@10 (nprobe=2/8, m=4, overscan=4): $recall%.3f")
    // nprobe=2 of 8 balanced cells: ~3/4 of the corpus is pruned before
    // ADC ever sees it, and the shortlist rerank still recovers the
    // in-cluster neighbors (cluster members query their own cell)
    assert(recall >= 0.8,
      s"composed IVF-PQ recall collapsed: $recall")
  }

  test("standardize: z-scores per dimension, zero-variance dims map to 0") {
    val df = Seq(
      (1L, Array(1.0f, 5.0f)), (2L, Array(3.0f, 5.0f))) // dim2 constant
      .toDF("vec_id", "embedding")
    val z = Similarity.standardize(df, "vec_id", "embedding", dims = 2)
      .select("corpus_id", "i", "z").as[(Long, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // dim1: mean 2, std 1 → z = ±1; dim2: zero variance → 0
    assert(math.abs(z((1L, 1)) + 1.0) < 1e-4 && math.abs(z((2L, 1)) - 1.0) < 1e-4)
    assert(z((1L, 2)) == 0.0 && z((2L, 2)) == 0.0)
  }

  test("hardNegatives: same-label neighbors never occupy shortlist slots") {
    // 1's nearest is 2 (same label, cosine 1) — must be excluded; the
    // top negative is 3 (different label, next-closest)
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.1f), 7),
      (2L, Array(2.0f, 0.0f, 0.2f), 7),  // scaled copy of 1, same label
      (3L, Array(1.0f, 0.3f, 0.1f), 8),
      (4L, Array(-1.0f, 0.5f, 0.0f), 9))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(df.filter(col("vec_id") === 1),
        df, "vec_id", "embedding", "label", k = 2)
      .select("query_id", "rank", "corpus_id", "n_label")
      .as[(Long, Int, Long, Int)].collect().sortBy(_._2)
    assert(out.map(_._3).toSeq == Seq(3L, 4L),
      s"same-label twin must be excluded, negatives ranked by cosine: ${out.toSeq}")
    assert(out.forall(_._4 != 7))
  }

  test("jlProject: deterministic per-row projection of the right width") {
    val df = Seq((1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
        (2L, Array(0.0f, 2.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val a = Similarity.jlProject(df, "vec_id", "embedding", outDims = 6, dims = 4)
      .select("vec_id", "rv").as[(Long, Seq[Double])].collect().toMap
    val b = Similarity.jlProject(df, "vec_id", "embedding", outDims = 6, dims = 4)
      .select("vec_id", "rv").as[(Long, Seq[Double])].collect().toMap
    assert(a(1L).length == 6 && a == b) // stable md5 plane family
    // scaling the input leaves the projection unchanged (normalized first)
    val scaled = Seq((2L, Array(0.0f, 4.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val s = Similarity.jlProject(scaled, "vec_id", "embedding", 6, 4)
      .select("rv").as[Seq[Double]].collect().head
    assert(s == a(2L))
  }

  test("jlTopKReranked: high recall vs brute force at 4x dim reduction") {
    // JL preserves ANGLES to within ε ~ sqrt(ln N / outDims); recall is
    // meaningful only when true neighbors are separated by more than ε
    // (real embedding corpora are clustered; isotropic noise is the
    // degenerate case where every cosine ≈ 0 and ordering is noise)
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 300).map { i =>
      val base = Array.fill(64)(0.0)
      base(i % 6) = 1.0 // 6 well-separated direction clusters
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.08).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 8)
    val brute = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val byOverscan = Seq(2, 4, 12).map { os =>
      val jl = Similarity.jlTopKReranked(queries, corpus, "vec_id", "embedding",
          k = 5, outDims = 16, overscan = os, dims = 64)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      os -> (brute & jl).size.toDouble / brute.size
    }
    info("JL recall@5 (64 -> 16 dims) by overscan: " +
      byOverscan.map { case (os, r) => f"$os -> $r%.3f" }.mkString(", "))
    assert(byOverscan.sliding(2).forall(p => p(0)._2 <= p(1)._2),
      s"overscan should not hurt recall: $byOverscan")
    assert(byOverscan.last._2 >= 0.8,
      s"JL rerank recall collapsed at overscan=12: ${byOverscan.last._2}")
  }

  test("mmr: redundancy penalty reorders the plain top-k; ranks and guards hold") {
    // query along x; a=(0.8,0.6,0) rel .8; b ~ a (near-duplicate, rel
    // marginally lower); c orthogonal-ish to a with rel .6. Plain top-2
    // is [a, b]; MMR at lambda=0.5 must pick [a, c] — b's max-sim ~1
    // wipes out its relevance.
    val corpus = Seq(
      (1L, Seq(4f, 3f, 0f)),
      (2L, Seq(4f, 3f, 0.01f)),
      (3L, Seq(3f, -4f, 0f)),
      (100L, Seq(1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 100L)

    val plain = Similarity.bruteForceTopK(queries, corpus,
        "vec_id", "embedding", k = 2)
      .orderBy("rank").select("corpus_id").as[Long].collect().toList
    assert(plain == List(1L, 2L), s"plain top-2 is the near-dup pair: $plain")

    val mmr = Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
        k = 2, shortlist = 3, lambda = 0.5)
      .orderBy("sel_rank")
      .as[(Long, Long, Long, Double)].collect().toList
    assert(mmr.map(_._3) == List(1L, 3L),
      s"MMR must swap the near-dup for the diverse doc: $mmr")
    assert(mmr.map(_._2) == List(1L, 2L), "selection order is 1-based rank")
    assert(math.abs(mmr.head._4 - 0.8) < 1e-9, "rel carries the query cosine")

    // k capped by available candidates (3 non-query vectors)
    val all = Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
      k = 3, shortlist = 3, lambda = 0.5)
    assert(all.count() == 3)

    // lambda=1 degenerates to pure relevance = plain top-k order
    val pure = Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
        k = 3, shortlist = 3, lambda = 1.0)
      .orderBy("sel_rank").select("corpus_id").as[Long].collect().toList
    assert(pure == List(1L, 2L, 3L), s"lambda=1 is relevance order: $pure")

    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
        k = 5, shortlist = 3)
    }
    intercept[IllegalArgumentException] {
      Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
        k = 1, shortlist = 8192)
    }
  }

  test("mmr: greedy runs on executors (FlatMapGroups in plan, no driver collect)") {
    // the selection stage must be a per-query-group executor operator,
    // not a driver loop over a collected shortlist: the plan itself is
    // the evidence — a driver-side greedy would end the distributed
    // plan at the shortlist window and show no group-map operator
    val corpus = (1L to 40L).map(i =>
        (i, Seq(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat, (i % 7).toFloat)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" <= 3L)
    val mmr = Similarity.mmrTopK(queries, corpus, "vec_id", "embedding",
      k = 3, shortlist = 10, lambda = 0.5)
    val p = mmr.queryExecution.executedPlan.toString
    assert(p.contains("FlatMapGroups") || p.contains("MapGroups"),
      s"mmr greedy is not an executor-side group map:\n${p.take(3000)}")
    // and each query still yields exactly k rows with rank 1..k
    val rows = mmr.collect()
    assert(rows.length == 9)
    assert(rows.groupBy(_.getLong(0)).forall(_._2.map(_.getLong(1)).sorted.toList == List(1L, 2L, 3L)))
  }

  test("marginMining: hub vector is suppressed, genuine mate wins on margin") {
    // hub sits near EVERYTHING in A (high neighborhood mean -> margin
    // denominator), the mate is close to a1 only
    val a = Seq(
      (1L, Seq(1f, 0f, 0f)), (2L, Seq(0f, 1f, 0f)), (3L, Seq(0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val b = Seq(
      (10L, Seq(0.577f, 0.577f, 0.577f)),  // hub
      (11L, Seq(0.9f, 0.1f, 0.1f)))        // a1's mate
      .toDF("vec_id", "embedding")
    val out = Similarity.marginMining(a, b, "vec_id", "embedding",
        k = 2, threshold = 1.0)
      .orderBy("a_id")
      .as[(Long, Long, Double, Double)].collect().toList
    val a1 = out.find(_._1 == 1L).get
    assert(a1._2 == 11L,
      s"a1's best match must be the mate, not the hub: $out")
    assert(a1._4 > 1.2, s"a planted mate clears margin comfortably: ${a1._4}")
    // raw cosine alone would NOT separate hub matches: cos(a2, hub) is
    // hub's best offer and margin still admits it only because a2 has
    // no better candidate — but a threshold above its margin kills it
    val strict = Similarity.marginMining(a, b, "vec_id", "embedding",
        k = 2, threshold = 1.4)
      .select("a_id").as[Long].collect().toSet
    assert(strict == Set(1L), s"only the genuine pair survives 1.4: $strict")

    // best-match selection is a mergeable struct-max — no window AFTER
    // the rank stages (the two rank windows carry group-limit pushdown)
    val plan = Similarity.marginMining(a, b, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "rank stages must push the k-limit into the window")
  }

  test("ivfSave/ivfLoad: versioned codebook artifact; serving with the loaded codebook is identical") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-artifact").toString + "/idx"
    val corpus = (0L until 40L)
      .map(i => (i, Array.tabulate(8)(j =>
        math.sin(i * 0.7 + j * 1.3) + (if (i % 4 == j % 4) 2.0 else 0.0))))
      .toDF("vec_id", "embedding")
    val trained = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nCentroids = 4, iters = 2)
    val v0 = Similarity.ivfSave(spark, trained, path)
    val loaded = Similarity.ivfLoad(spark, path, Some(v0))
    assert(loaded.map(_._1) == trained.map(_._1) &&
      loaded.zip(trained).forall { case ((_, l), (_, t)) =>
        l.sameElements(t) },
      "round-trip must be ordered and element-exact")
    // serving with the loaded codebook == serving with the in-memory one
    val a = Similarity.ivfAssignWith(corpus, "vec_id", "embedding", trained)
      .select("corpus_id", "bucket").as[(Long, Long)].collect().toSet
    val b = Similarity.ivfAssignWith(corpus, "vec_id", "embedding", loaded)
      .select("corpus_id", "bucket").as[(Long, Long)].collect().toSet
    assert(a == b)
    // retraining VERSIONS the index: the head is the retrain, the
    // pinned version still serves the original cells
    val retrained = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nCentroids = 2, iters = 1)
    val v1 = Similarity.ivfSave(spark, retrained, path)
    assert(v1 == v0 + 1)
    assert(Similarity.ivfLoad(spark, path).size == 2,
      "head load must see the retrain")
    assert(Similarity.ivfLoad(spark, path, Some(v0)).size == 4,
      "the pinned version must still serve the original codebook")
  }

  test("ivfTopKWith: full top-k SEARCH from a loaded codebook equals the in-memory-trained search") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ivf-serve").toString + "/idx"
    val corpus = (0L until 60L)
      .map(i => (i, Array.tabulate(8)(j =>
        math.cos(i * 0.9 + j * 0.4) + (if (i % 3 == j % 3) 1.5 else 0.0))))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" < 6)
    val trained = Similarity.trainCentroids(corpus, "vec_id", "embedding",
      nCentroids = 4, iters = 2)
    val v = Similarity.ivfSave(spark, trained, path)
    val loaded = Similarity.ivfLoad(spark, path, Some(v))
    val served = Similarity.ivfTopKWith(queries, corpus, "vec_id",
        "embedding", k = 3, loaded, nprobe = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSeq
    val inMem = Similarity.ivfTopKTrained(queries, corpus, "vec_id",
        "embedding", k = 3, nCentroids = 4, nprobe = 2, iters = 2)
      .orderBy("query_id", "rank")
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSeq
    assert(served == inMem,
      "loaded-artifact top-k must be rank-identical to the trained search")
    assert(served.nonEmpty && served.map(_._1).distinct.size == 6)
  }

  test("embeddingDrift: hand-computed per-cell shares and TV distance against a pinned codebook; dark cells still report") {
    // two axis-aligned clusters; the codebook has a THIRD centroid no
    // vector is nearest to (the dark cell)
    val cents = Seq(
      0L -> Array(1.0, 0.0, 0.0),
      1L -> Array(0.0, 1.0, 0.0),
      2L -> Array(-1.0, -1.0, 5.0))
    def vecs(xs: Seq[(Long, Int)]) = xs.map { case (id, axis) =>
      (id, Array.tabulate(3)(j => if (j == axis) 1.0 else 0.01))
    }.toDF("vec_id", "embedding")
    val a = vecs(Seq(1L -> 0, 2L -> 0, 3L -> 0, 4L -> 1)) // cell0: 3/4, cell1: 1/4
    val b = vecs(Seq(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1)) // cell0: 1/4, cell1: 3/4
    val got = Similarity
      .embeddingDrift(a, b, "vec_id", "embedding", cents)
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 3L, 1L, 0.75, 0.25, 0.5),
      (1L, 1L, 3L, 0.25, 0.75, 0.5),
      (2L, 0L, 0L, 0.0, 0.0, 0.0)), s"got $got")
    assert(got.map(_._6).sum / 2 == 0.5, "TV distance reads off drift6/2")
    val plan = Similarity
      .embeddingDrift(a, b, "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window expected:\n$plan")
  }

  test("clusterQuality: tight well-separated clusters beat smeared ones, metrics bounded") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def cloud(base: Array[Double], n: Int, noise: Double, from: Long) =
      (0 until n).map { i =>
        (from + i, base.zipWithIndex.map { case (x, _) =>
          x + (rnd.nextDouble() - 0.5) * noise })
      }
    val axes = Seq(Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val tight = axes.zipWithIndex.flatMap { case (a, i) =>
      cloud(a, 30, 0.05, i * 100L) }.toDF("vec_id", "embedding")
    val smeared = axes.zipWithIndex.flatMap { case (a, i) =>
      cloud(a, 30, 1.2, i * 100L) }.toDF("vec_id", "embedding")
    def metrics(df: org.apache.spark.sql.DataFrame) = Similarity
      .clusterQuality(df, "vec_id", "embedding", nCentroids = 4, iters = 2)
      .as[(Long, Long, Double, Double, Option[Double])].collect().toSeq
    val t = metrics(tight); val s = metrics(smeared)
    // silhouette bounded, coverage complete
    (t ++ s).foreach { case (_, n, sil, sc, _) =>
      assert(sil >= -1.0 && sil <= 1.0 && sc >= 0.0 && n > 0) }
    assert(t.map(_._2).sum == 120 && s.map(_._2).sum == 120)
    // tight clusters: higher mean silhouette and lower Davies-Bouldin
    def wavg(m: Seq[(Long, Long, Double, Double, Option[Double])],
        f: ((Long, Long, Double, Double, Option[Double])) => Double) =
      m.map(r => f(r) * r._2).sum / m.map(_._2).sum
    assert(wavg(t, _._3) > wavg(s, _._3) + 0.2,
      s"tight silhouette ${wavg(t, _._3)} vs smeared ${wavg(s, _._3)}")
    assert(wavg(t, _._5.getOrElse(0.0)) < wavg(s, _._5.getOrElse(0.0)),
      "tight clusters must score a lower Davies-Bouldin term")
    // deterministic: a rerun lands on identical doubles
    assert(metrics(tight) == t)
  }
  test("training on an empty corpus fails fast, not with a degenerate codebook") {
    // ADVICE r18: dims derived from collected seeds must not silently
    // become 0 on an empty corpus (empty codebook / trivially-passing
    // modulus check) — the failure belongs here, loudly
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Similarity.trainCentroids(empty, "vec_id", "embedding", nCentroids = 4, iters = 1)
    }
    assert(e1.getMessage.contains("empty corpus"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(empty, "vec_id", "embedding", m = 2, ksub = 4, iters = 1)
    }
    assert(e2.getMessage.contains("empty corpus"))
  }
}
