package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based tests for the Morton interleave: the z-value must be
  * a BIJECTION on bucket tuples (distinct tuples ⇔ distinct codes —
  * a collision would co-locate unrelated regions and silently widen
  * every file's bounding box) and must decode back to its inputs by
  * plain bit surgery. Checked against a reference interleave computed
  * in Scala, across arbitrary column counts and bit widths. */
class LayoutPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(13L + i)))

  // (n columns, bits, tuples) with n*bits inside the long budget
  private val shapes: Gen[(Int, Int, Seq[Seq[Long]])] = for {
    n <- Gen.choose(1, 4)
    bits <- Gen.choose(1, 62 / math.max(n, 1) min 10)
    rows <- Gen.choose(1, 120)
    tuples <- Gen.listOfN(rows,
      Gen.listOfN(n, Gen.choose(0L, (1L << bits) - 1)))
  } yield (n, bits, tuples.map(_.toSeq))

  private def reference(t: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (b <- 0 until bits; i <- t.indices)
      z |= ((t(i) >> b) & 1L) << (b * t.size + i)
    z
  }

  test("zValue equals the reference interleave and is a bijection on bucket tuples") {
    for ((n, bits, tuples) <- samples(shapes, 10)) {
      val cols = col("i") +:
        (0 until n).map(j => element_at(col("t"), j + 1).as(s"c$j"))
      val df = tuples.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("i", "t")
        .select(cols: _*)
      val got = df.select(col("i"),
          Layout.zValue((0 until n).map(j => col(s"c$j")), bits).as("z"))
        .as[(Long, Long)].collect().toMap
      tuples.zipWithIndex.foreach { case (t, i) =>
        assert(got(i.toLong) == reference(t, bits),
          s"n=$n bits=$bits tuple=$t")
      }
      // bijection: distinct tuples produce distinct codes
      val distinctTuples = tuples.distinct.size
      val distinctCodes = tuples.map(reference(_, bits)).distinct.size
      assert(distinctCodes == distinctTuples,
        s"collision at n=$n bits=$bits")
    }
  }

  test("axis monotonicity: raising one bucket with others fixed raises the z-value") {
    for ((n, bits, tuples) <- samples(shapes, 6); t <- tuples.take(10)) {
      for (axis <- 0 until n if t(axis) + 1 < (1L << bits)) {
        val bumped = t.updated(axis, t(axis) + 1)
        assert(reference(bumped, bits) > reference(t, bits),
          s"monotonicity broken on axis $axis: $t -> $bumped")
      }
    }
  }
}
