package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** Metadata-only ALTER TABLE ADD COLUMNS ([[TxLogTable.addColumns]] +
  * the SQL routing): the recorded schema widens in one rebase commit
  * that moves zero data bytes; reads serve the new columns as NULL
  * until appends/updates populate them. */
class AddColumnsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-alter").toString

  test("addColumns is metadata-only: listing identical, nulls served, history intact") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    val at0 = TxLogTable.filesAt(path, 0)
    val v = TxLogTable.addColumns(spark, path,
      Seq(StructField("flag", StringType), StructField("score", DoubleType)))
    assert(v == 1)
    assert(TxLogTable.filesAt(path, 1).toSet == at0.toSet) // zero bytes moved
    val df = TxLogTable.read(spark, path)
    assert(df.columns.toSeq == Seq("id", "v", "flag", "score"))
    assert(df.filter(col("flag").isNull && col("score").isNull).count() == 2)
    // time travel below the DDL serves the old schema
    assert(TxLogTable.readVersion(spark, path, 0).columns.toSeq ==
      Seq("id", "v"))
    // the connector resolves the widened schema from the log
    assert(spark.read.format("graftlog").load(path).columns.toSeq ==
      Seq("id", "v", "flag", "score"))
  }

  test("appends and UPDATE SET populate widened columns; old rows stay NULL") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    TxLogTable.addColumns(spark, path, Seq(StructField("flag", StringType)))
    TxLogTable.append(spark,
      Seq((2L, "b", "new")).toDF("id", "v", "flag"), path)
    TxLogTable.updateWhere(spark, path,
      Map("flag" -> lit("upd")), col("id") === 1)
    val rows = TxLogTable.read(spark, path).orderBy("id")
      .select("id", "flag").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "upd"), (2L, "new")))
  }

  test("guards: duplicate (case-insensitive) and non-nullable fields refuse") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    intercept[IllegalArgumentException](
      TxLogTable.addColumns(spark, path, Seq(StructField("ID", LongType))))
    intercept[IllegalArgumentException](
      TxLogTable.addColumns(spark, path,
        Seq(StructField("x", LongType, nullable = false))))
    assert(TxLogTable.currentVersion(path) == 0) // nothing committed
  }

  test("widened columns read as NULL on hive-partitioned layouts too") {
    val path = tmp
    TxLogTable.append(spark,
      (0 until 8).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part"),
      path, partitionBy = Seq("part"))
    TxLogTable.addColumns(spark, path, Seq(StructField("flag", StringType)))
    val df = TxLogTable.read(spark, path)
    assert(df.columns.contains("flag"))
    assert(df.filter(col("flag").isNull).count() == 8)
    assert(df.filter(col("part") === "p1").count() == 4) // partitions intact
  }

  test("addColumns carries deletion vectors; masked rows stay masked") {
    val path = tmp
    TxLogTable.append(spark,
      (0 until 10).map(i => (i.toLong, s"r$i")).toDF("id", "v")
        .repartition(1), path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 3)
    TxLogTable.addColumns(spark, path, Seq(StructField("flag", StringType)))
    assert(TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path)).nonEmpty)
    val df = TxLogTable.read(spark, path)
    assert(df.count() == 9 && df.columns.contains("flag"))
  }

  test("SQL ALTER TABLE ADD COLUMNS on a catalog graftlog table routes to the log") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    spark.sql(s"CREATE TABLE alter_spec_t USING graftlog " +
      s"OPTIONS (path '$path')")
    try {
      spark.sql("ALTER TABLE alter_spec_t ADD COLUMNS (flag STRING)")
      // one metadata-only commit in the LOG (not just a catalog edit)
      assert(TxLogTable.currentVersion(path) == 1)
      assert(TxLogTable.historyDf(spark, path).filter(col("version") === 1)
        .select("operation").head().getString(0) == "addcolumns")
      // name resolution serves the widened schema immediately
      assert(spark.sql("SELECT * FROM alter_spec_t").columns.toSeq ==
        Seq("id", "v", "flag"))
      assert(spark.sql(
        "SELECT count(*) FROM alter_spec_t WHERE flag IS NULL")
        .head().getLong(0) == 2L)
      // and SQL DML can populate the new column
      spark.sql("UPDATE alter_spec_t SET flag = 'x' WHERE id = 2")
      assert(spark.sql(
        "SELECT count(*) FROM alter_spec_t WHERE flag = 'x'")
        .head().getLong(0) == 1L)
    } finally spark.sql("DROP TABLE alter_spec_t")
  }
}
