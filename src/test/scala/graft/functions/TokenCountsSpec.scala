package graft.functions

import graft.SparkSpec
import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.functions._

/** Differential test: per-row TokenCounts must equal the relational
  * explode + groupBy counting it replaced in the tfidf plan. */
class TokenCountsSpec extends SparkSpec {
  import spark.implicits._

  test("token counts == explode+groupBy counts on random docs") {
    TokenCounts.register(spark)
    val rnd = new scala.util.Random(5)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val docs = (1 to 100).map { i =>
      (i.toLong, (0 until rnd.nextInt(60)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ ((0L, ""))
    val df = docs.toDF("doc_id", "text")
    val perRow = df.select(col("doc_id"),
        explode(TokenCounts.tokenCounts(tokens(col("text")))).as("tc"))
      .select(col("doc_id"), col("tc.term"), col("tc.cnt").cast("long"))
      .as[(Long, String, Long)].collect().toSet
    val relational = df.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().toSet
    assert(perRow == relational)
  }

  test("output is term-sorted and empty input yields an empty array") {
    TokenCounts.register(spark)
    val r = Seq((1L, "z a z m a z")).toDF("id", "text")
      .select(TokenCounts.tokenCounts(tokens(col("text"))).as("tc"))
      .selectExpr("transform(tc, x -> x.term) AS terms", "transform(tc, x -> x.cnt) AS cnts")
      .as[(Seq[String], Seq[Int])].head()
    assert(r._1 == Seq("a", "m", "z") && r._2 == Seq(2, 1, 3))
    val empty = Seq((1L, "")).toDF("id", "text")
      .select(size(TokenCounts.tokenCounts(tokens(col("text"))))).as[Int].head()
    assert(empty == 0)
  }

  test("null array elements are skipped — the SQL surface accepts any array<string>") {
    TokenCounts.register(spark)
    // array() with a null literal: containsNull=true, not tokens() output
    val r = spark.sql(
      "SELECT graft_token_counts(array('a', CAST(NULL AS STRING), 'a', 'b')) AS tc")
      .selectExpr("transform(tc, x -> x.term) AS terms", "transform(tc, x -> x.cnt) AS cnts")
      .as[(Seq[String], Seq[Int])].head()
    assert(r._1 == Seq("a", "b") && r._2 == Seq(2, 1))
    val allNull = spark.sql(
      "SELECT size(graft_token_counts(array(CAST(NULL AS STRING)))) AS n")
      .as[Int].head()
    assert(allNull == 0)
  }
}
