package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based tests for the budget-allocation sampling family:
  * [[Sampling.unimax]]'s allocation invariants against arbitrary group
  * weights/budgets, and [[Sampling.exportShardsPerGroup]]'s
  * per-group-permutation + balance guarantees against arbitrary group
  * shapes — the claims the q123/q126 oracles rest on stated as laws,
  * not single fixtures. */
class SamplingPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(11L + i)))

  // group weight tables: few/many groups, flat and power-law-ish weights
  private val weightTable: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(1L, 50L),         // flat-ish
      Gen.choose(1L, 100000L),     // wide spread
      Gen.const(7L)))              // exact ties
  } yield ws

  /** The reference allocation, straight from the paper's loop. */
  private def referenceRates(ws: Seq[Long], budgetFrac: Double): Map[String, Double] = {
    val named = ws.zipWithIndex.map { case (w, i) => (s"g$i", w) }
    val sorted = named.sortBy { case (g, w) => (w, g) }
    var rem = budgetFrac * ws.sum.toDouble
    sorted.zipWithIndex.map { case ((g, w), i) =>
      val alloc = math.min(w.toDouble, rem / (sorted.length - i))
      rem -= alloc
      g -> math.min(1.0, alloc / w)
    }.toMap
  }

  test("unimax laws: rates in [0,1], total allocation == budget when feasible, " +
      "smaller groups never get a lower rate, ties get equal rates") {
    for (ws <- samples(weightTable, 15); budgetFrac <- Seq(0.3, 0.7, 1.0)) {
      val rates = referenceRates(ws, budgetFrac)
      val byW = ws.zipWithIndex.map { case (w, i) => (w, rates(s"g$i")) }
      assert(rates.values.forall(r => r >= 0.0 && r <= 1.0 + 1e-12))
      // budget is exactly spent whenever it fits (epochCap 1 means the
      // whole corpus is always enough at budgetFrac <= 1)
      val spent = ws.zipWithIndex.map { case (w, i) => w * rates(s"g$i") }.sum
      assert(math.abs(spent - budgetFrac * ws.sum) < 1e-6 * ws.sum.max(1L),
        s"ws=$ws frac=$budgetFrac spent=$spent")
      // fairness: a smaller group's rate is never below a bigger group's
      for (Seq((w1, r1), (w2, r2)) <- byW.sortBy(_._1).sliding(2).toSeq
           if w1 < w2)
        assert(r1 >= r2 - 1e-12, s"ws=$ws: rate($w1)=$r1 < rate($w2)=$r2")
      // exact ties (same weight) get identical rates
      for ((_, group) <- byW.groupBy(_._1) if group.length > 1)
        assert(group.map(_._2).distinct.length == 1, s"tied weights diverged: $group")
    }
  }

  test("unimax operator agrees with the reference loop's kept-rate thresholds") {
    // one representative table through the actual operator: every group's
    // empirical keep decisions follow the reference rate's threshold
    val ws = Seq(5L, 5L, 40L, 200L)
    val rows = ws.zipWithIndex.flatMap { case (w, g) =>
      (1L to w).map(j => (g * 1000L + j, s"g$g", 1))
    }
    val df = rows.toDF("id", "grp", "w")
    val out = Sampling.unimax(df, "id", "grp", "w", budgetFrac = 0.5)
      .select("id", "grp", "kept").as[(Long, String, Int)].collect()
    val coords = df.select(col("id"),
        Sampling.coord(col("id"), "graft-unimax").as("c"))
      .as[(Long, Long)].collect().toMap
    val rates = referenceRates(ws, 0.5)
    val round6 = (x: Double) => math.floor(x * 1e6 + 0.5) / 1e6
    out.foreach { case (id, g, kept) =>
      val thr = Sampling.threshold(round6(rates(g)))
      assert(kept == (if (coords(id) < thr) 1 else 0), s"group $g id $id")
    }
  }

  // group layouts: balanced, one dominant group, many tiny groups
  private val groupedIds: Gen[Seq[(Long, String)]] = for {
    g <- Gen.choose(1, 6)
    n <- Gen.choose(1, 300)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 4000000000L)
      grp <- Gen.choose(0, g - 1)
    } yield (id, s"g$grp"))
  } yield rows.distinctBy(_._1)

  test("exportShardsPerGroup laws: per-group dense permutation, ±1 balance, " +
      "contiguity, group-insensitivity of the order") {
    for (rows <- samples(groupedIds, 10); nShards <- Seq(1, 4, 7)) {
      val out = Sampling.exportShardsPerGroup(rows.toDF("id", "grp"),
          "id", "grp", nShards = nShards)
        .select("id", "grp", "shuffle_pos", "shard")
        .as[(Long, String, Long, Int)].collect()
      assert(out.length == rows.length)
      out.groupBy(_._2).foreach { case (g, rs) =>
        assert(rs.map(_._3).sorted.toSeq == (0L until rs.length).toSeq,
          s"group $g not a dense permutation")
        val sizes = rs.groupBy(_._4).view.mapValues(_.length).values
        assert(sizes.max - sizes.min <= 1, s"group $g unbalanced")
        assert(rs.sortBy(_._3).map(_._4).toSeq == rs.map(_._4).sorted.toSeq,
          s"group $g shards not contiguous")
      }
      // the within-group ORDER is the global shuffle order restricted to
      // the group (adding/removing other groups never reorders a group)
      val global = Sampling.shuffleOrder(rows.toDF("id", "grp"), "id")
        .select("id", "grp", "shuffle_pos").as[(Long, String, Long)].collect()
      val restricted = global.groupBy(_._2).view.mapValues(
        _.sortBy(_._3).map(_._1).toSeq).toMap
      val perGroup = out.groupBy(_._2).view.mapValues(
        _.sortBy(_._3).map(_._1).toSeq).toMap
      assert(perGroup == restricted, "per-group order must be the global order restricted")
    }
  }
}
