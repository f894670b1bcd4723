package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, lit, when}

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

  test("numeric profile: true numeric ordering, exact moments, verified quantile sketch") {
    // "9" > "10" lexicographically — the string profile would report
    // max=9; the typed branch must not
    val df = ((1 to 9) ++ Seq(10, 100)).map(i => (i.toLong, i.toDouble))
      .toDF("id", "x")
      .withColumn("y", when(col("id") <= 2, col("x") * 10).otherwise(lit(null)))
    val out = Profile.numericColumns(df, Seq("x", "y"),
        percentiles = Seq(0.5, 0.9), accuracy = 1000)
      .collect().map(r => r.getString(0) -> r).toMap

    val x = out("x")
    assert(x.getLong(1) == 11L && x.getLong(2) == 0L)
    assert(x.getDouble(3) == 1.0 && x.getDouble(4) == 100.0,
      "numeric max must be 100, not the lexicographic 9")
    assert(math.abs(x.getDouble(5) - (45 + 110).toDouble / 11) < 1e-9)
    assert(x.getLong(7) == 1L, "sketch must verify within the GK bound")
    assert(x.getSeq[Double](6).length == 2, "one sketch value per percentile")

    val y = out("y")
    assert(y.getLong(1) == 11L && y.getLong(2) == 9L, "nulls counted, not profiled")
    assert(y.getDouble(3) == 10.0 && y.getDouble(4) == 20.0)
    assert(y.getLong(7) == 1L)

    // all-null column: vacuous bound holds, moments are null
    val z = Profile.numericColumns(
      df.withColumn("z", lit(null).cast("double")), Seq("z")).collect().head
    assert(z.getLong(2) == 11L && z.isNullAt(3) && z.isNullAt(4))
    assert(z.getLong(7) == 1L, "empty sketch is vacuously within bound")

    // the melt count is fixed by the plan shape (moments branch, rank
    // branch, and the broadcast sketch inside it), NOT by the column
    // count — profiling 2 or 50 columns melts the same number of times
    val generates = (d: org.apache.spark.sql.DataFrame) =>
      "Generate explode".r.findAllIn(d.queryExecution.optimizedPlan.toString).length
    val two = generates(Profile.numericColumns(df, Seq("x", "y")))
    val one = generates(Profile.numericColumns(df, Seq("x")))
    assert(two == one, s"melt count grew with column count: $one -> $two")
    assert(two <= 3, s"unexpected plan shape: $two explodes")
  }

  test("temporal profile: DATE and TIMESTAMP melt together, calendar min/max/span, nulls counted") {
    import java.sql.{Date, Timestamp}
    val df = Seq(
        (Date.valueOf("2024-01-10"), Timestamp.valueOf("2024-03-01 08:30:00")),
        (Date.valueOf("2023-11-02"), Timestamp.valueOf("2024-03-05 23:59:59")),
        (Date.valueOf("2024-02-29"), null.asInstanceOf[Timestamp]))
      .toDF("d", "ts")
    val out = Profile.temporalColumns(df, Seq("d", "ts"))
      .orderBy(col("col_name")).collect()
    val d = out(0); val ts = out(1)
    assert(d.getString(0) == "d" && ts.getString(0) == "ts")
    assert(d.getLong(1) == 3 && d.getLong(2) == 0)
    // dates cast to midnight timestamps; calendar ordering, not string
    assert(d.getTimestamp(3) == Timestamp.valueOf("2023-11-02 00:00:00"))
    assert(d.getTimestamp(4) == Timestamp.valueOf("2024-02-29 00:00:00"))
    assert(d.getLong(5) == 119L, s"2023-11-02 .. 2024-02-29 spans 119 days (leap)")
    assert(ts.getLong(1) == 3 && ts.getLong(2) == 1, "null timestamp counted")
    assert(ts.getTimestamp(3) == Timestamp.valueOf("2024-03-01 08:30:00"))
    assert(ts.getTimestamp(4) == Timestamp.valueOf("2024-03-05 23:59:59"))
    assert(ts.getLong(5) == 4L)
    // same fixed-plan-shape contract as the sibling branches
    val gen = (x: org.apache.spark.sql.DataFrame) =>
      "Generate explode".r.findAllIn(x.queryExecution.optimizedPlan.toString).length
    assert(gen(Profile.temporalColumns(df, Seq("d", "ts"))) ==
      gen(Profile.temporalColumns(df, Seq("d"))))
    // an all-null temporal column keeps its row with null min/max
    val z = Profile.temporalColumns(
      df.withColumn("z", lit(null).cast("timestamp")), Seq("z")).collect().head
    assert(z.getLong(2) == 3L && z.isNullAt(3) && z.isNullAt(4) && z.isNullAt(5))
  }

  test("dependence: exact-moment corr/covar/regression match closed-form values") {
    // y = 2x + 1 exactly -> corr=1, slope=2, intercept=1, r2=1
    val lin = Seq(("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0))
      .toDF("g", "x", "y")
    val r = Profile.dependence(lin, "x", "y", Seq("g"), scale = 2)
      .collect().head
    assert(r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, "corr of exact line is 1")
    // covar_samp of x={1,2,3}, y={3,5,7}: sum((x-2)(y-5))/2 = 4/2 = 2
    assert(math.abs(r.getDouble(3) - 2.0) < 1e-12)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-12, "slope 2")
    assert(math.abs(r.getDouble(5) - 1.0) < 1e-12, "intercept 1")
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-12, "r2 1")

    // anti-correlated group alongside, null pairs dropped per-group
    val two = Seq(
        ("up", 1.0, 10.0), ("up", 2.0, 20.0), ("up", 3.0, 30.0),
        ("dn", 1.0, 30.0), ("dn", 2.0, 20.0), ("dn", 3.0, 10.0),
        ("dn", 4.0, Double.NaN))
      .toDF("g", "x", "y")
      .withColumn("y", when(col("y").isNaN, lit(null)).otherwise(col("y")))
    val m = Profile.dependence(two, "x", "y", Seq("g"))
      .collect().map(row => row.getString(0) -> row).toMap
    assert(m("up").getLong(1) == 3L && math.abs(m("up").getDouble(2) - 1.0) < 1e-12)
    assert(m("dn").getLong(1) == 3L, "null y excluded pairwise")
    assert(math.abs(m("dn").getDouble(2) + 1.0) < 1e-12, "perfect anti-correlation")
    assert(math.abs(m("dn").getDouble(4) + 10.0) < 1e-12, "slope -10")

    // plan contract: one mergeable hash aggregate, no Window, no sort
    // before the agg (the profile-family scale shape)
    val plan = Profile.dependence(lin, "x", "y", Seq("g"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "dependence must not plan a Window")
    assert("HashAggregate".r.findAllIn(plan).length >= 2,
      "partial+final hash aggregate expected")
  }

  test("histogram: exact bucket counts, max lands in the last bucket, degenerate cases") {
    // values 0..7 with width (8-0)/4 = 2 over [0, 8]: buckets {0,1},{2,3},{4,5},{6,7,8}
    val df = ((0 to 7) :+ 8).map(_.toDouble).toDF("x")
    val out = Profile.histogram(df, "x", nBuckets = 4)
      .orderBy("bucket").as[(Long, Double, Double, Long)].collect().toList
    assert(out.map(t => (t._1, t._4)) ==
      List((0L, 2L), (1L, 2L), (2L, 2L), (3L, 3L)),
      s"max value must clamp into the last bucket, not bucket nBuckets: $out")
    assert(out.head._2 == 0.0 && out.head._3 == 2.0)
    assert(out.last._2 == 6.0 && out.last._3 == 8.0)

    // constant column: everything in bucket 0, zero-width edges
    val const = Seq(5.0, 5.0, 5.0).toDF("x")
    val c = Profile.histogram(const, "x", 4).collect()
    assert(c.length == 1 && c.head.getLong(0) == 0L && c.head.getLong(3) == 3L)

    // all-null column: empty result with the right schema, no NPE
    val nulls = Seq(Option.empty[Double], None).toDF("x")
    assert(Profile.histogram(nulls, "x", 4).isEmpty)

    // only non-empty buckets emitted
    val sparse = Seq(0.0, 100.0).toDF("x")
    assert(Profile.histogram(sparse, "x", 10).count() == 2)
  }
}
