package graft.operators

import graft.SparkSpec

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: counts, nulls, distincts, min/max, mode with tie-break") {
    val df = Seq(
      (1, Some("b"), 10), (2, Some("a"), 10), (3, Some("a"), 20),
      (4, None, 20), (5, Some("c"), 30))
      .toDF("id", "s", "v")
    val out = Profile.columns(df, Seq("s", "v"))
      .as[(String, Long, Long, Long, String, String, String, Long)]
      .collect().map(r => r._1 -> r).toMap
    val s = out("s")
    assert(s == (("s", 5L, 1L, 3L, "a", "c", "a", 2L)))
    val v = out("v")
    // 10 and 20 both appear twice -> value asc tiebreak picks "10"
    assert(v == (("v", 5L, 0L, 3L, "10", "30", "10", 2L)))
  }

  test("profile: approxDistinct swaps in the HLL sketch, other stats unchanged") {
    val df = (1 to 1000).map(i => (i, s"v${i % 97}")).toDF("id", "s")
    val exact = Profile.columns(df, Seq("s")).collect().head
    val approx = Profile.columns(df, Seq("s"), approxDistinct = true)
      .collect().head
    assert(exact.getLong(3) == 97L)
    // HLL++ default rsd is 5%; 97 distincts should land well inside it
    assert(math.abs(approx.getLong(3) - 97L) <= 10L, approx.getLong(3))
    // every non-sketch statistic must be identical between the modes
    assert(Seq(0, 1, 2, 4, 5, 6, 7).forall(i => exact.get(i) == approx.get(i)))
  }

  test("profile: an all-null column keeps its stats row, mode is null") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("id", "s")
    val rows = Profile.columns(df, Seq("s")).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L && r.getLong(3) == 0L)
    assert(r.isNullAt(6) && r.isNullAt(7), "no non-null values -> no mode")
  }
}
