package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("dot: exact values, null propagation, SQL-text callable") {
    VectorExpressions.register(spark)
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(4.0, 5.0, 6.0))),
      (None: Option[Array[Double]], Some(Array(1.0)))
    ).toDF("a", "b")
    val vals = df.select(VectorExpressions.dot(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect()
    assert(vals(0).contains(32.0))
    assert(vals(1).isEmpty)
    df.createOrReplaceTempView("vx")
    val sqlVal = spark.sql("SELECT graft_dot_product(a, b) FROM vx WHERE a IS NOT NULL")
      .as[Double].head()
    assert(sqlVal == 32.0)
  }

  test("SimHash60.h60 matches the SQL h60 family (conv(substring(md5,1,15),16,10))") {
    val samples = Seq("spark", "a", "日本語テスト", "", "Brand#12", "x" * 500)
    val df = samples.toDF("s")
      .select(TextFunctions.h60(col("s")).as("h")).as[Long].collect()
    samples.zip(df).foreach { case (s, expected) =>
      assert(SimHash60.h60(s.getBytes("UTF-8")) == expected, s"token '$s'")
    }
  }

  test("MinHashSig expression equals the HOF md5Family formulation exactly") {
    MinHashSig.register(spark)
    val df = Seq(
      Seq("the quick", "quick brown", "brown fox"),
      Seq("один", "два", "три"),
      Seq.empty[String]
    ).toDF("sset")
    // the HOF spelling, inlined (minhashSignature now routes md5Family
    // through the expression, so spell the reference formulation here)
    import TextFunctions.{md5Family, once}
    val hof = once(col("sset")) { ss =>
      transform(sequence(lit(0), lit(7)), i => array_min(transform(ss, s => md5Family(s, i))))
    }
    val rows = df.select(
        MinHashSig.minhashSig(col("sset"), 8).as("fast"), hof.as("ref"))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
    assert(rows(2)._1.forall(_.isEmpty)) // empty set → all-null signature
  }

  test("RollingFingerprint: recurrence equals direct polynomial; edges handled") {
    import org.apache.spark.unsafe.types.UTF8String
    def direct(s: String, k: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      (0 to cps.length - k).map { i =>
        cps.slice(i, i + k).foldLeft(0L)((h, c) =>
          (h * RollingFingerprint.B + c) % RollingFingerprint.M)
      }
    }
    Seq(("abcdefghij", 4), ("the quick brown fox", 8), ("日本語のテキストです", 3),
        ("aaaaaaaa", 3)).foreach { case (s, k) =>
      val fast = RollingFingerprint.compute(UTF8String.fromString(s), k)
        .toLongArray.toSeq
      assert(fast == direct(s, k), s"'$s' k=$k")
    }
    // identical windows → identical hashes (the dedup property)
    val rep = RollingFingerprint.compute(UTF8String.fromString("aaaaaaaa"), 3).toLongArray
    assert(rep.distinct.length == 1)
    // shorter than k → empty
    assert(RollingFingerprint.compute(UTF8String.fromString("ab"), 3).numElements() == 0)
  }

  test("functionDescription (GraftExtensions inject path) builds the same expression") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val (ident, _, builder) = VectorExpressions.functionDescription
    assert(ident.funcName == "graft_dot_product")
    val e = builder(Seq(
      Literal.create(Array(1.0, 2.0), ArrayType(DoubleType)),
      Literal.create(Array(3.0, 4.0), ArrayType(DoubleType))))
    assert(e.isInstanceOf[DotProduct])
    assert(e.eval(null) == 11.0)
  }
}
