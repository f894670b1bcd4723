package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Differential test: the single-loop codegen'd WinnowRolling expression
  * must produce byte-identical fingerprint sets to the independently
  * composed HOF formulation (rollingFingerprint + slice/array_min/
  * distinct/sort) on adversarial and random inputs. */
class WinnowRollingSpec extends SparkSpec {
  import spark.implicits._

  test("native winnow == HOF winnow on random and degenerate strings") {
    RollingFingerprint.register(spark)
    val rnd = new scala.util.Random(42)
    val alpha = "abcde \n"
    val cases = Seq(
      "",                        // empty
      "ab",                      // shorter than k
      "abcdefgh",                // exactly k -> one gram, m < w
      "abcdefghij",              // m < w
      "aaaaaaaaaaaaaaaaaaaa",    // all-equal grams (deque tie behavior)
      "the quick brown fox jumps over the lazy dog"
    ) ++ (1 to 200).map { _ =>
      val len = rnd.nextInt(300)
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val out = df.select(col("id"),
        graft.operators.TextAnalysis.winnowRolling(col("text"), 8, 4).as("native"),
        graft.operators.TextAnalysis.winnowRollingHof(col("text"), 8, 4).as("hof"))
      .select(col("id"), (col("native") === col("hof")).as("eq"),
        col("native"), col("hof"))
      .collect()
    val bad = out.filterNot(_.getBoolean(1))
    assert(bad.isEmpty, s"mismatch on ids ${bad.map(_.getLong(0)).toSeq}: " +
      bad.take(2).map(r => s"${r.get(2)} vs ${r.get(3)}").mkString("; "))
  }

  test("winnow values for several k/w combinations stay HOF-identical") {
    RollingFingerprint.register(spark)
    val df = Seq((1L, "a quick brown fox jumped over thirteen lazy dogs twice"))
      .toDF("id", "text")
    for ((k, w) <- Seq((4, 2), (5, 5), (8, 4), (12, 3))) {
      val r = df.select(
        graft.operators.TextAnalysis.winnowRolling(col("text"), k, w).as("n"),
        graft.operators.TextAnalysis.winnowRollingHof(col("text"), k, w).as("h"))
        .head()
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"k=$k w=$w")
    }
  }
}
