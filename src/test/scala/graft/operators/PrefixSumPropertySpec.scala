package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

/** Property-based tests for the distributed two-phase prefix-sum family
  * (Packing.assign, Sampling.shuffleOrder): against ARBITRARY id
  * distributions (sparse, clustered, adversarially skewed) and bucket
  * widths, the distributed result must equal the sequential scan — the
  * exactness claim both operators' oracles rest on. */
class PrefixSumPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  // id sets with pathological shapes: dense runs, huge gaps, singletons
  private val idSet: Gen[Seq[Long]] = for {
    n <- Gen.choose(1, 400)
    ids <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0L, 500L),                       // dense collisions → dedup below
      Gen.choose(0L, 4000000000L),                 // sparse
      Gen.choose(0L, 50L).map(_ * 1000003L)))      // clustered strides
  } yield ids.distinct

  test("Packing.assign equals the sequential scan for arbitrary ids, counts, widths") {
    for (ids <- samples(idSet, 12)) {
      val rnd = new scala.util.Random(ids.hashCode)
      val rows = ids.map(id => (id, rnd.nextInt(300).toLong))
      val sorted = rows.sortBy(_._1)
      val expected = sorted.map(_._1)
        .zip(sorted.map(_._2).scanLeft(0L)(_ + _).init).toMap
      for (width <- Seq(1L, 97L, 1000000L, 0L)) {
        val got = Packing.assign(rows.toDF("id", "n"), "id", "n",
            capacity = 512L, bucketWidth = width)
          .select("doc_id", "tok_offset").as[(Long, Long)].collect().toMap
        assert(got == expected, s"ids=${ids.take(5)}... width=$width")
      }
    }
  }

  test("shuffleOrder is a bijection matching the naive rank for arbitrary ids and buckets") {
    for (ids <- samples(idSet, 12)) {
      val df = ids.toDF("id")
      val naive = df.withColumn("h", Sampling.coord(col("id"), "graft-shuf"))
        .select("id", "h").as[(Long, Long)].collect()
        .sortBy(r => (r._2, r._1)).map(_._1).zipWithIndex
        .map { case (id, p) => (id, p.toLong) }.toMap
      for (buckets <- Seq(1, 16, 4096)) {
        val got = Sampling.shuffleOrder(df, "id", buckets = buckets)
          .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
        assert(got == naive, s"buckets=$buckets ids=${ids.take(5)}...")
      }
    }
  }
}
