package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions.{shingles, tokens}
import org.apache.spark.sql.functions._

/** Differential test: the hash-map codegen'd TopGramFrac must equal the
  * independently composed HOF formulation (shingles → sort → longest
  * equal-run fold) on random and adversarial token streams. */
class TopGramFracSpec extends SparkSpec {
  import spark.implicits._

  test("native top-gram fraction == HOF formulation on random and degenerate docs") {
    TopGramFrac.register(spark)
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "c", "dd", "eee", "repeat")
    val cases = Seq(
      "", "solo", "x y",
      "a a a a a a",
      "spam ham spam ham spam"
    ) ++ (1 to 200).map { _ =>
      (0 until rnd.nextInt(80)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
    }
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (n <- Seq(2, 3, 4)) {
      val bad = df.select(col("id"),
          TopGramFrac.topGramFrac(tokens(col("text")), n).as("native"),
          graft.operators.TextAnalysis.topGramFracHof(
            shingles(tokens(col("text")), n)).as("hof"))
        .filter(col("native") =!= col("hof"))
        .collect()
      assert(bad.isEmpty, s"n=$n mismatches: ${bad.take(3).mkString(", ")}")
    }
  }

  test("null array elements are dropped before gram formation — no NPE via the SQL surface") {
    TopGramFrac.register(spark)
    // equals the same doc with nulls removed: grams never span a null
    val r = spark.sql(
      """SELECT graft_top_gram_frac(array('a','b', CAST(NULL AS STRING), 'a','b'), 2) AS withNull,
               graft_top_gram_frac(array('a','b','a','b'), 2) AS without""")
      .as[(Double, Double)].head()
    assert(r._1 == r._2)
    val allNull = spark.sql(
      "SELECT graft_top_gram_frac(array(CAST(NULL AS STRING)), 2) AS f").as[Double].head()
    assert(allNull == 0.0)
  }
}
