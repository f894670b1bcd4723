package graft.operators

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets.UTF_8

/** Guard rails around Bucketing.ensure's orphan-location cleanup: the
  * recursive delete must only ever hit directories graft provably owns. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  private def warehousePath(table: String) =
    Paths.get(new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
      .getPath, table.toLowerCase(java.util.Locale.ROOT))

  private def df = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")

  test("non-namespaced and qualified table names are rejected up front") {
    val e1 = intercept[IllegalArgumentException] {
      Bucketing.ensure(spark, df, "lineitem", "k", 2)
    }
    assert(e1.getMessage.contains(Bucketing.Prefix))
    val e2 = intercept[IllegalArgumentException] {
      Bucketing.ensure(spark, df, "otherdb.graft_bkt_x", "k", 2)
    }
    assert(e2.getMessage.contains("unqualified"))
  }

  test("a foreign directory squatting on the name fails loudly, untouched") {
    val table = "graft_bkt_spec_squat"
    val loc = warehousePath(table)
    Files.createDirectories(loc)
    val foreign = loc.resolve("precious.txt")
    Files.write(foreign, "not a spark table".getBytes(UTF_8))
    try {
      val e = intercept[IllegalArgumentException] {
        Bucketing.ensure(spark, df, table, "k", 2)
      }
      assert(e.getMessage.contains("refusing to clear"))
      assert(Files.exists(foreign), "guard must not delete foreign data")
    } finally {
      Files.delete(foreign); Files.delete(loc)
    }
  }

  test("a marker-stamped orphan is cleared and rebuilt; marker restamped") {
    val table = "graft_bkt_spec_orphan"
    val loc = warehousePath(table)
    // simulate a previous JVM's leftover: marker + stale content
    Files.createDirectories(loc)
    Files.write(loc.resolve("_GRAFT_BUCKETED"), Array.empty[Byte])
    Files.write(loc.resolve("part-00000-stale.snappy.parquet"), Array[Byte](1))
    try {
      val out = Bucketing.ensure(spark, df, table, "k", 2)
      assert(out.count() == 3)
      assert(Files.exists(loc.resolve("_GRAFT_BUCKETED")),
        "rebuild must restamp the marker for the next JVM")
      assert(!Files.exists(loc.resolve("part-00000-stale.snappy.parquet")))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("a legacy markerless orphan with pure Spark-table shape is cleared") {
    val table = "graft_bkt_spec_legacy"
    val loc = warehousePath(table)
    Files.createDirectories(loc)
    Files.write(loc.resolve("_SUCCESS"), Array.empty[Byte])
    Files.write(loc.resolve("part-00000-old.snappy.parquet"), Array[Byte](1))
    try {
      val out = Bucketing.ensure(spark, df, table, "k", 2)
      assert(out.count() == 3)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }
}
