package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Z-order layout: Morton arithmetic, bucket edge behavior, and the
  * payoff — a measured file-skipping comparison against a linear sort
  * on the same data. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits: (5, 3) at 3 bits -> 27") {
    // x=0b101, y=0b011; bit b of col i lands at b*2+i:
    // pos0=x0=1 pos1=y0=1 pos2=x1=0 pos3=y1=1 pos4=x2=1 pos5=y2=0 -> 0b011011
    val r = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(r == 27L)
  }

  test("bucket clamps edges, maps hi to the top bucket, degenerates to 0") {
    val df = Seq(0.0, 50.0, 100.0, -5.0, 105.0).toDF("v")
    val got = df.select(Layout.bucket(col("v"), 0.0, 100.0, 4).as("b"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 8L, 15L, 0L, 15L))
    val degenerate = df.select(Layout.bucket(col("v"), 7.0, 7.0, 4).as("b"))
      .as[Long].collect().toSet
    assert(degenerate == Set(0L))
  }

  test("zColumn: nulls clamp to bucket 0, bounds become plan literals (no window)") {
    val df = Seq[(java.lang.Long, java.lang.Long)]((1L, 10L), (null, 20L), (3L, null))
      .toDF("a", "b")
    val z = df.withColumn("z", Layout.zColumn(df, Seq("a", "b"), bits = 4))
    // a NULL `a` buckets like the low edge a=1 (both bucket 0), so
    // (null, 20) and (1, 20) share a z-value
    val znull = z.filter(col("a").isNull).select("z").as[Long].head()
    val zlow = df.limit(0) // explicit bounds: no data-derived pass needed
      .union(Seq((1L: java.lang.Long, 20L: java.lang.Long)).toDF("a", "b"))
    val zref = zlow.select(Layout.zColumn(zlow, Seq("a", "b"), 4,
      Map("a" -> (1.0, 3.0), "b" -> (10.0, 20.0))).as("z")).as[Long].head()
    assert(znull == zref)
    val plan = z.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"bounds must not global-window:\n$plan")
  }

  test("rank-space z-order keeps skipping power on skewed keys where value-space collapses") {
    // power-law x (heavy head of small values, rare huge outliers) ×
    // uniform y — the layout killer for min-max bucketization: nearly
    // every row lands in value bucket 0, so the curve degenerates to a
    // y-sort and an x-band overlaps every file
    val rnd = new scala.util.Random(3)
    val rows = (0 until 4096).map { i =>
      val u = math.max(rnd.nextDouble(), 1e-5)
      (math.min(100000L, (1.0 / u).toLong), (i % 64).toLong)
    }
    val df = rows.toDF("x", "y")
    val valDir = Files.createTempDirectory("graft-layout-val").toString
    val rankDir = Files.createTempDirectory("graft-layout-rank").toString
    Layout.zorderWrite(df, valDir, Seq("x", "y"), bits = 6, targetFiles = 16)
    Layout.zorderWrite(df, rankDir, Seq("x", "y"), bits = 6, targetFiles = 16,
      rankSpace = true)

    def xBandHits(dir: String): Long =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
        .filter(col("lo") <= 6 && col("hi") >= 3) // x IN [3, 6] — mid-mass band
        .count()

    val (valHit, rankHit) = (xBandHits(valDir), xBandHits(rankDir))
    info(s"x-band file hits: value-space $valHit/16, rank-space $rankHit/16")
    assert(valHit >= 14,
      s"value-space buckets should collapse on the skewed head: $valHit")
    assert(rankHit < valHit && rankHit <= 10,
      s"rank-space should keep discriminating the head: $rankHit vs $valHit")
    // same rows either way
    assert(spark.read.parquet(rankDir).count() == 4096)
  }

  test("z-order layout skips files a linear sort cannot") {
    // 64x64 grid; query: a selective band on Y ONLY (the dimension the
    // linear-by-x layout does NOT cluster)
    val grid = spark.range(0, 64L * 64L)
      .select((col("id") / 64).cast("long").as("x"),
        (col("id") % 64).cast("long").as("y"))
    val zDir = Files.createTempDirectory("graft-layout-z").toString
    val linDir = Files.createTempDirectory("graft-layout-lin").toString
    Layout.zorderWrite(grid, zDir, Seq("x", "y"), bits = 6, targetFiles = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(linDir)

    def overlapping(dir: String): Int =
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("y")).as("ylo"), max(col("y")).as("yhi"))
        .filter(col("ylo") <= 15 && col("yhi") >= 8) // y IN [8, 15]
        .count().toInt

    val (zHit, linHit) = (overlapping(zDir), overlapping(linDir))
    // the linear layout spreads every x-slice across the full y range:
    // all 16 files overlap the band. The z-curve keeps y in a file's
    // bounding box: only segments whose box crosses the band remain.
    assert(linHit == 16, s"linear layout should overlap everywhere, got $linHit")
    assert(zHit <= 8, s"z-order should skip most files for a y-band, hit $zHit/16")
    // and the written table is byte-complete (layout is a permutation)
    assert(spark.read.parquet(zDir).count() == 64L * 64L)
    assert(spark.read.parquet(zDir).agg(sum(col("x") * 64 + col("y"))).as[Long].head() ==
      (0L until 64L * 64L).sum)
  }
}
