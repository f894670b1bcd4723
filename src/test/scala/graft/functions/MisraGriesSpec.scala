package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  test("classic decrement: untracked item with full counters cancels one unit each") {
    val mg = MisraGries(2)
    // stream: a a a b c  (k=2)
    var buf = mg.zero
    Seq("a", "a", "a", "b", "c").foreach(t => buf = mg.reduce(buf, t))
    // c arrives with counters full {a:3, b:1} → decrement: {a:2}, c dropped
    assert(mg.finish(buf) == Map("a" -> 2L))
  }

  test("merge sums counters then truncates by the (k+1)-th largest") {
    val mg = MisraGries(2)
    val a = (Array("x", "y"), Array(5L, 2L))
    val b = (Array("y", "z"), Array(4L, 3L))
    // merged: x:5 y:6 z:3 → cut = 3rd largest = 3 → {x:2, y:3}
    assert(mg.finish(mg.merge(a, b)) == Map("x" -> 2L, "y" -> 3L))
  }

  test("distributed guarantees hold across partitionings: est ≤ true ≤ est + n/k") {
    val k = 8
    // 3 heavy tokens among noise; n = 400 + 120 = 520, n/k = 65
    val heavy = Seq.fill(200)("alpha") ++ Seq.fill(120)("beta") ++ Seq.fill(80)("gamma")
    val noise = (0 until 120).map(i => s"n$i")
    val all = scala.util.Random.shuffle(heavy ++ noise)
    val exact = all.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val n = all.size.toLong
    for (parts <- Seq(1, 3, 8)) {
      val df = all.toDF("tok").repartition(parts)
      val mgU = udaf(MisraGries(k))
      val summary = df.agg(mgU(col("tok")).as("s"))
        .select(explode(col("s"))).as[(String, Long)].collect().toMap
      assert(summary.size <= k)
      summary.foreach { case (t, est) =>
        val c = exact(t)
        assert(est <= c && c - est <= n / k, s"parts=$parts $t est=$est true=$c")
      }
      // every token with true count > n/k must be present
      exact.filter(_._2 > n.toDouble / k).keys.foreach { t =>
        assert(summary.contains(t), s"parts=$parts heavy '$t' missing")
      }
    }
  }
}
