package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("sample rate is honored within binomial tolerance, and is exact-reproducible") {
    val n = 20000
    val kept = Sampling.sample(ids(n), "id", 0.3).as[Long].collect().toSet
    // 4σ tolerance for Binomial(20000, .3)
    val sigma = math.sqrt(n * 0.3 * 0.7)
    assert(math.abs(kept.size - n * 0.3) < 4 * sigma,
      s"kept ${kept.size} of $n at rate 0.3")
    val again = Sampling.sample(ids(n), "id", 0.3).as[Long].collect().toSet
    assert(again == kept, "same salt+rate must select identical rows")
  }

  test("membership is partitioning-independent and monotone in rate") {
    val df = ids(5000)
    val base = Sampling.sample(df, "id", 0.2).as[Long].collect().toSet
    val shuffled = Sampling.sample(df.repartition(17, col("id")), "id", 0.2)
      .as[Long].collect().toSet
    assert(shuffled == base, "partitioning must not change membership")
    val wider = Sampling.sample(df, "id", 0.5).as[Long].collect().toSet
    assert(base.subsetOf(wider),
      "raising the rate must only ADD rows (nested samples)")
  }

  test("same key+salt samples two tables join-consistently") {
    val users = ids(3000).withColumnRenamed("id", "user_id")
    val events = ids(3000).withColumnRenamed("id", "user_id")
      .withColumn("payload", col("user_id") * 2)
    val u = Sampling.sample(users, "user_id", 0.25, salt = "u")
      .as[Long].collect().toSet
    val e = Sampling.sample(events, "user_id", 0.25, salt = "u")
      .select($"user_id").as[Long].collect().toSet
    assert(u == e, "sampling by the same key+salt must keep the same keys")
  }

  test("split: exhaustive, exclusive, close to requested fractions") {
    val n = 20000
    val out = Sampling.split(ids(n), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(out.keySet == Set("train", "val", "test"))
    assert(out.values.sum == n, "every row lands in exactly one split")
    assert(math.abs(out("train") - n * 0.8) < 4 * math.sqrt(n * 0.8 * 0.2))
    assert(math.abs(out("val") - n * 0.1) < 4 * math.sqrt(n * 0.1 * 0.9))
  }

  test("mixture: per-stratum rates, default applies to unlisted strata") {
    val n = 6000
    val df = ids(n).withColumn("src",
      concat(lit("s"), (col("id") % 3).cast("string")))
    val out = Sampling.mixture(df, "id", "src",
        Map("s0" -> 1.0, "s1" -> 0.0), defaultRate = 0.5)
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(out.getOrElse("s0", 0L) == n / 3, "rate 1.0 keeps every row")
    assert(!out.contains("s1"), "rate 0.0 keeps none")
    val s2 = out.getOrElse("s2", 0L).toDouble
    assert(math.abs(s2 - n / 3 * 0.5) < 4 * math.sqrt(n / 3 * 0.25))
  }

  test("sampling plan is a pure scan+filter: no shuffle introduced") {
    val plan = Sampling.sample(ids(100), "id", 0.5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sample must not shuffle:\n$plan")
  }

  test("stratified: exact n per stratum, matches the naive full-stratum ranking") {
    val n = 2000
    val df = ids(n).withColumn("lang",
      concat(lit("l"), (col("id") % 4).cast("string")))
    val out = Sampling.stratified(df, "id", "lang", n = 30)
      .select("id", "lang").as[(Long, String)].collect().toSet
    // brute-force reference: same coordinate, full sort per stratum
    val coords = ids(n).withColumn("lang",
        concat(lit("l"), (col("id") % 4).cast("string")))
      .withColumn("h", Sampling.coord(col("id"), "graft-strat"))
      .select("id", "lang", "h").as[(Long, String, Long)].collect()
    val expected = coords.groupBy(_._2).values.flatMap(
      _.sortBy(r => (r._3, r._1)).take(30).map(r => (r._1, r._2))).toSet
    assert(out == expected)
    assert(out.groupBy(_._2).values.forall(_.size == 30))
  }

  test("shuffleOrder: bijection onto [0,N), matches the naive global ranking") {
    val n = 3000
    val out = Sampling.shuffleOrder(ids(n), "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect()
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq, "bijection onto [0,N)")
    val naive = ids(n)
      .withColumn("h", Sampling.coord(col("id"), "graft-shuf"))
      .select("id", "h").as[(Long, Long)].collect()
      .sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), pos) => (id, pos.toLong) }.toMap
    assert(out.forall { case (id, pos) => naive(id) == pos })
  }

  test("exportShards: balanced contiguous shards covering every row exactly once") {
    val n = 1000
    val out = Sampling.exportShards(ids(n), "id", nShards = 7)
      .select("shard", "shuffle_pos").as[(Int, Long)].collect()
    assert(out.length == n)
    val byShard = out.groupBy(_._1)
    assert(byShard.keySet == (0 until 7).toSet)
    val sizes = byShard.view.mapValues(_.length).values.toSeq
    assert(sizes.max - sizes.min <= 1, s"unbalanced: $sizes")
    // contiguity: shard s's positions form one dense range, ordered s asc
    val ranges = byShard.toSeq.sortBy(_._1).map { case (_, rows) =>
      val ps = rows.map(_._2).sorted
      assert(ps.last - ps.head + 1 == ps.length, "positions not contiguous")
      (ps.head, ps.last)
    }
    assert(ranges.head._1 == 0L && ranges.last._2 == n - 1)
    ranges.sliding(2).foreach { case Seq((_, aEnd), (bStart, _)) =>
      assert(bStart == aEnd + 1)
    case _ => ()
    }
  }

  test("stratified: strata smaller than n are kept whole; escalation converges") {
    val df = ids(100).withColumn("lang",
      when(col("id") < 10, "tiny").otherwise("big"))
    // oversample barely above 1 forces the verify-escalate path to prove
    // itself on whatever strata undershoot at the first threshold
    val out = Sampling.stratified(df, "id", "lang", n = 40, oversample = 1.05)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("tiny") == 10, "a stratum below n is kept in full")
    assert(byLang("big") == 40)
  }

  test("topKPerGroup: equals the naive window on skewed groups, ties, and tiny groups") {
    val rnd = new scala.util.Random(31)
    // one huge group, one medium, one below n; duplicate scores force
    // the id tiebreak through the threshold region
    val data = (1L to 3000L).map(i => (i, "big", (rnd.nextInt(50) / 10.0))) ++
      (3001L to 3200L).map(i => (i, "mid", rnd.nextGaussian())) ++
      (3201L to 3205L).map(i => (i, "tiny", rnd.nextDouble())) ++
      Seq((9001L, null.asInstanceOf[String], 99.0), (9002L, "big", Double.NaN))
    val df = data.toDF("id", "grp", "score")
      .withColumn("score", when(isnan(col("score")), lit(null)).otherwise(col("score")))
    val out = Sampling.topKPerGroup(df, "grp", "score", "id", n = 25)
      .select("id", "grp").as[(Long, String)].collect().toSet
    val naive = data.filter(r => r._2 != null && !r._3.isNaN)
      .groupBy(_._2).values.flatMap(
        _.sortBy(r => (-r._3, r._1)).take(25).map(r => (r._1, r._2))).toSet
    assert(out == naive, s"diff: ${(out -- naive) ++ (naive -- out)}")
    assert(out.count(_._2 == "tiny") == 5, "groups below n are kept whole")

    // tight margin exercises the escalate path; result unchanged
    val escalated = Sampling.topKPerGroup(df, "grp", "score", "id", n = 25, margin = 1)
      .select("id", "grp").as[(Long, String)].collect().toSet
    assert(escalated == naive)
  }

  test("temperature: rare sources keep more, alpha=1 is uniform, null group dropped") {
    // 900 docs of "big", 90 of "mid", 10 of "rare" (+5 null)
    val df = ids(1005).withColumn("source",
      when(col("id") < 900, "big")
        .when(col("id") < 990, "mid")
        .when(col("id") < 1000, "rare")
        .otherwise(lit(null).cast("string")))
    val out = Sampling.temperature(df, "id", "source", alpha = 0.5, baseRate = 0.5)
      .select("id", "source", "kept").as[(Long, String, Int)].collect()
    assert(out.length == 1005, "keep-flag mode must preserve every row")
    assert(out.filter(_._2 == null).forall(_._3 == 0), "null source is never kept")
    val fracs = out.filter(_._2 != null).groupBy(_._2).view
      .mapValues(r => r.count(_._3 == 1).toDouble / r.length).toMap
    // expected rates: big 0.5, mid 0.5*sqrt(10)=1.0 (capped), rare 1.0 (capped)
    assert(fracs("rare") == 1.0 && fracs("mid") == 1.0,
      s"alpha=0.5 must cap rare sources at keep-everything: $fracs")
    assert(math.abs(fracs("big") - 0.5) < 0.1, s"largest source ~baseRate: $fracs")

    // alpha = 1: every group at baseRate — identical to plain sample()
    val uni = Sampling.temperature(df, "id", "source", alpha = 1.0,
        baseRate = 0.3, salt = "s1")
      .filter(col("kept") === 1).select("id").as[Long].collect().toSet
    val plain = Sampling.sample(df.filter(col("source").isNotNull), "id",
        0.3, salt = "s1")
      .select("id").as[Long].collect().toSet
    assert(uni == plain, "alpha=1 must reduce to uniform Bernoulli")
  }

  test("plans: temperature output is shuffle-free; topKPerGroup ranks only candidates") {
    val df = ids(500).withColumn("grp", (col("id") % 3).cast("string"))
      .withColumn("score", col("id").cast("double"))
    // temperature: once the counts are collected, the keep flag is a
    // literal when-chain — the RESULT plan must not exchange at all
    val tp = Sampling.temperature(df, "id", "grp", alpha = 0.5, baseRate = 0.5)
      .queryExecution.executedPlan.toString
    assert(!tp.contains("Exchange"), s"temperature result shuffles:\n${tp.take(1500)}")
    // topKPerGroup: the window in the result plan is partitioned by the
    // group (parallel across groups), fed by a candidate FILTER — the
    // naive full-group sort shape would have no score filter under it
    val top = Sampling.topKPerGroup(df, "grp", "score", "id", n = 5)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(grp"), s"window not group-partitioned:\n${plan.take(1500)}")
    assert(plan.contains("Filter") && plan.contains("score"),
      s"candidates not pre-filtered by score threshold:\n${plan.take(1500)}")
  }

  test("stratified: null strata are dropped up front, never hang the escalation loop") {
    val df = ids(100).withColumn("lang",
      when(col("id") < 10, lit(null).cast("string"))
        .when(col("id") < 55, "a").otherwise("b"))
    val out = Sampling.stratified(df, "id", "lang", n = 20)
      .select("id", "lang").as[(Long, String)].collect()
    assert(out.forall(_._2 != null), "null stratum rows must be dropped")
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang == Map("a" -> 20, "b" -> 20))
    // all-null strata → empty result, same schema, still terminates
    val allNull = ids(10).withColumn("lang", lit(null).cast("string"))
    val empty = Sampling.stratified(allNull, "id", "lang", n = 5)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("id", "lang"))
  }

  test("broadcast fallback: past the branch cutoff every operator keeps the same rows as the literal chain") {
    val nGroups = 200 // above the default cutoff of 64
    val df = (0 until 20000).map(i =>
      (i.toLong, s"g${i % nGroups}", (i % 997).toDouble))
      .toDF("id", "grp", "score")

    // temperature: chain (cutoff ∞) vs broadcast (cutoff 10), same keeps
    val tChain = Sampling.temperature(df, "id", "grp", 0.5, 0.6,
        branchCutoff = Int.MaxValue)
      .select("id", "kept").as[(Long, Int)].collect().toSet
    val tJoin = Sampling.temperature(df, "id", "grp", 0.5, 0.6,
      branchCutoff = 10)
    assert(tJoin.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "above the cutoff, temperature must broadcast-join its thresholds")
    assert(tJoin.select("id", "kept").as[(Long, Int)].collect().toSet == tChain)

    // mixture: 200-entry rate map, filter mode
    val rates = (0 until nGroups).map(i =>
      s"g$i" -> (if (i % 2 == 0) 0.8 else 0.1)).toMap
    val mChain = Sampling.mixture(df, "id", "grp", rates,
      branchCutoff = Int.MaxValue).select("id").as[Long].collect().toSet
    val mJoin = Sampling.mixture(df, "id", "grp", rates, branchCutoff = 10)
    assert(mJoin.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    assert(mJoin.select("id").as[Long].collect().toSet == mChain)
    assert(mJoin.columns.toSeq == df.columns.toSeq,
      "lookup temp columns must not leak into the result")

    // stratified: exact-n selection identical through both paths
    val sChain = Sampling.stratified(df, "id", "grp", n = 5,
      branchCutoff = Int.MaxValue).select("id").as[Long].collect().toSet
    val sJoin = Sampling.stratified(df, "id", "grp", n = 5, branchCutoff = 10)
    assert(sJoin.select("id").as[Long].collect().toSet == sChain)

    // topKPerGroup: identical top-k through both paths
    val kChain = Sampling.topKPerGroup(df, "grp", "score", "id", n = 7,
      branchCutoff = Int.MaxValue).select("id").as[Long].collect().toSet
    val kJoin = Sampling.topKPerGroup(df, "grp", "score", "id", n = 7,
      branchCutoff = 10)
    assert(kJoin.select("id").as[Long].collect().toSet == kChain)
  }

  test("10k-group temperature completes via broadcast join, and the group-count guard is loud") {
    val df = (0 until 30000).map(i => (i.toLong, s"src${i % 10000}"))
      .toDF("id", "grp")
    val out = Sampling.temperature(df, "id", "grp", alpha = 0.7, baseRate = 0.9)
    assert(out.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      "10k groups must take the broadcast path, not a 10k-branch CASE tree")
    assert(out.count() == 30000)
    assert(out.filter(col("kept") === 1).count() > 0)
    // the guard: a group key past maxGroups fails fast instead of
    // collecting an unbounded count table to the driver
    val e = intercept[IllegalArgumentException] {
      Sampling.temperature(df, "id", "grp", 0.7, 0.9, maxGroups = 100)
    }
    assert(e.getMessage.contains("maxGroups"))
  }

  test("exportShardsPerGroup: per-group contiguous balanced shards, single-group equals global") {
    val df = (1L to 200L).map(i => (i, if (i % 3 == 0) "a" else "b"))
      .toDF("id", "grp")
    val out = Sampling.exportShardsPerGroup(df, "id", "grp", nShards = 4)
      .select("id", "grp", "shuffle_pos", "shard")
      .as[(Long, String, Long, Int)].collect()
    out.groupBy(_._2).foreach { case (g, rows) =>
      // positions are a dense 0..n_g-1 permutation per group
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"group $g positions not dense")
      // shards balanced to ±1 and contiguous in position order
      val sizes = rows.groupBy(_._4).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"group $g shards unbalanced: $sizes")
      assert(rows.sortBy(_._3).map(_._4).toSeq == rows.map(_._4).sorted.toSeq,
        s"group $g shards not contiguous in shuffle order")
    }
    // a null group shards as its own group — an EXPORT must never
    // silently lose rows to a null join key
    val withNull = ((1L to 20L).map(i => (i, "g")) ++
      (21L to 30L).map(i => (i, null: String))).toDF("id", "grp")
    val nOut = Sampling.exportShardsPerGroup(withNull, "id", "grp", nShards = 2)
      .select("id", "grp", "shard").as[(Long, String, Int)].collect()
    assert(nOut.length == 30, s"rows lost: ${nOut.length}")
    val nullRows = nOut.filter(_._2 == null)
    assert(nullRows.length == 10 && nullRows.map(_._3).toSet == Set(0, 1))

    // one group degenerates to the global operator (same salt, same order)
    val single = (1L to 50L).map(i => (i, "only")).toDF("id", "grp")
    val per = Sampling.exportShardsPerGroup(single, "id", "grp", nShards = 4)
      .select("id", "shuffle_pos", "shard").as[(Long, Long, Int)].collect().toSet
    val global = Sampling.exportShards(single.select("id"), "id", nShards = 4)
      .select("id", "shuffle_pos", "shard").as[(Long, Long, Int)].collect().toSet
    assert(per == global)
  }

  test("weightedSample: exact k, weight-proportional, non-positive weights excluded") {
    // 5 docs at weight 1e9 vs 50 at weight 1: the exponential race makes
    // a light doc's key ~1e9 times a heavy doc's — fixed md5 coordinates
    // make the outcome deterministic, and the heavies win every slot
    val rows = (1L to 5L).map(i => (i, 1000000000.0)) ++
      (6L to 55L).map(i => (i, 1.0)) ++
      Seq((90L, 0.0), (91L, -3.0))
    val df = rows.toDF("id", "w")
    val got = Sampling.weightedSample(df, "id", "w", k = 5)
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 5L), s"heavy docs must win: $got")
    val ten = Sampling.weightedSample(df, "id", "w", k = 10)
      .select("id", "key6").as[(Long, Double)].collect()
    assert(ten.length == 10 && !ten.map(_._1).exists(Set(90L, 91L)))
    assert(ten.map(_._2).sliding(2).forall(p => p(0) <= p(1)))
    // plan: per-partition top-k, not a global sort
    assert(Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("interleave: every complete window holds the mixture; positions unique; unweighted excluded") {
    // 40 a-docs, 20 b-docs, weights 2:1 — every window of 3 slots is
    // (2 a, 1 b) while both sources are live (b exhausts at pos 60)
    val rows = (1L to 40L).map(i => (i, "a")) ++ (41L to 60L).map(i => (i, "b")) :+
      ((99L, "zzz")) // no slot entry: excluded
    val out = Sampling.interleave(rows.toDF("id", "src"), "id", "src",
        Map("a" -> 2, "b" -> 1))
      .select("id", "src", "shuffle_pos", "global_pos")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 60 && !out.exists(_._2 == "zzz"))
    assert(out.map(_._4).distinct.length == 60, "global positions must be unique")
    val byPos = out.sortBy(_._4)
    byPos.take(60).grouped(3).foreach { w =>
      assert(w.count(_._2 == "a") == 2 && w.count(_._2 == "b") == 1,
        s"window off-mixture: ${w.toSeq}")
    }
    // per-source consumption order is the per-source shuffle order
    out.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == (0L until rs.length).toSeq)
    }
    // deterministic rerun
    val again = Sampling.interleave(rows.toDF("id", "src"), "id", "src",
        Map("a" -> 2, "b" -> 1))
      .select("id", "global_pos").as[(Long, Long)].collect().toSet
    assert(again == out.map(r => (r._1, r._4)).toSet)
  }

  test("unimax: small groups fully served, big group rationed, null dropped") {
    // weights: a = 10x1, b = 10x1, c = 80x1; budget 0.5·100 = 50.
    // Ascending serve: a gets min(10, 50/3)=10 (rate 1), b min(10, 40/2)=10
    // (rate 1), c min(80, 30/1)=30 (rate 0.375) — cap branch AND
    // surplus branch both exercised
    val rows = (1 to 10).map(i => (i.toLong, "a", 1)) ++
      (11 to 20).map(i => (i.toLong, "b", 1)) ++
      (21 to 100).map(i => (i.toLong, "c", 1)) :+ ((101L, null: String, 1))
    val df = rows.toDF("id", "grp", "w")
    val out = Sampling.unimax(df, "id", "grp", "w", budgetFrac = 0.5)
      .select("id", "grp", "kept").as[(Long, String, Int)].collect()
    val byGrp = out.filter(_._2 != null).groupBy(_._2)
      .view.mapValues(rs => rs.count(_._3 == 1)).toMap
    assert(byGrp("a") == 10 && byGrp("b") == 10) // rate 1.0 keeps every row
    assert(byGrp("c") > 0 && byGrp("c") < 80) // rationed, not emptied
    assert(out.filter(_._2 == null).forall(_._3 == 0)) // null group drops
    // deterministic: identical rerun
    val again = Sampling.unimax(df, "id", "grp", "w", budgetFrac = 0.5)
      .select("id", "grp", "kept").as[(Long, String, Int)].collect()
    assert(out.toSeq == again.toSeq)
  }

  test("unimax: budgetFrac 1 with epochCap 1 keeps everything; guard fires") {
    val df = (1L to 30L).map(i => (i, s"g${i % 3}", 2)).toDF("id", "grp", "w")
    val all = Sampling.unimax(df, "id", "grp", "w", budgetFrac = 1.0)
      .select("kept").as[Int].collect()
    assert(all.forall(_ == 1)) // budget = corpus: every group fully served
    val e = intercept[IllegalArgumentException] {
      Sampling.unimax(df, "id", "id", "w", budgetFrac = 0.5, maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
  }
}
