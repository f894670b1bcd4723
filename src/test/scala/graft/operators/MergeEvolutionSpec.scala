package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** MERGE schema evolution — Delta's `autoMerge`, composed from the
  * primitives the log already owns: source-only columns widen the
  * target through ONE metadata-only [[TxLogTable.addColumns]] commit
  * (carried files byte-identical), and the merge then runs with
  * autoMerge clause semantics — UPDATE SET * sets exactly the source's
  * columns (target-only columns keep their values), INSERT * fills
  * target-only columns with NULL. */
class MergeEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-evolve").toString

  test("widening merge = addcolumns + merge commits; carried files byte-identical") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 10L).map(i => (i, i * 10.0)).toDF("k", "x").repartition(1),
      path) // v0
    TxLogTable.append(spark,
      (11L to 20L).map(i => (i, i * 10.0)).toDF("k", "x").repartition(1),
      path) // v1
    val before = TxLogTable.filesAt(path, 1)
    val beforeBytes = before.map(f =>
      f -> java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$path/$f")).toSeq).toMap
    // source is WIDER: carries a tag column the target lacks; rows 5..12
    // update/match, 25 inserts
    val src = Seq((5L, -5.0, "m5"), (12L, -12.0, "m12"), (25L, -25.0, "new"))
      .toDF("k", "x", "tag")
    val v = TxLogTable.mergeByKey(spark, path, src, Seq("k"),
      schemaEvolution = true)
    // exactly TWO commits: the metadata-only widen + the merge
    assert(v == 3L, s"expected addcolumns(2) + merge(3), got head $v")
    val ops = TxLogTable.historyDf(spark, path)
      .orderBy("version").select("operation").as[String].collect().toSeq
    assert(ops == Seq("append", "append", "addcolumns", "merge"), ops)
    // the widen carried every file by reference, byte-identical
    assert(TxLogTable.filesAt(path, 2).toSet == before.toSet)
    before.foreach { f =>
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$path/$f")).toSeq == beforeBytes(f),
        s"widen must not rewrite $f")
    }
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "x", "tag"))
    assert(head.count() == 21)
    // matched rows took the source image INCLUDING the new column
    assert(head.filter(col("k") === 5L).select("x", "tag").head()
      == org.apache.spark.sql.Row(-5.0, "m5"))
    // unmatched target rows read the new column as NULL
    assert(head.filter(col("k") === 1L).select("tag").head().isNullAt(0))
    // inserts carry the new column
    assert(head.filter(col("k") === 25L).select("tag").head().getString(0)
      == "new")
  }

  test("evolution merge into a column-mapped table: new column takes a fresh physical name") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("k", "v").repartition(1), path)
    TxLogTable.renameColumn(spark, path, "v", "val") // mapping ON
    val src = Seq((2L, "upd", 7.5), (9L, "ins", 9.5)).toDF("k", "val", "w")
    val v = TxLogTable.mergeByKey(spark, path, src, Seq("k"),
      schemaEvolution = true)
    assert(v >= 2L)
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "val", "w"))
    assert(head.filter(col("k") === 2L).select("val", "w").head()
      == org.apache.spark.sql.Row("upd", 7.5))
    assert(head.filter(col("k") === 1L).select("w").head().isNullAt(0))
    assert(head.filter(col("k") === 9L).count() == 1)
  }

  test("SQL MERGE ... WITH SCHEMA EVOLUTION widens then merges") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 6L).map(i => (i, i * 1.0)).toDF("k", "x").repartition(1), path)
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("evo_t")
    Seq((2L, -2.0, "two"), (99L, -99.0, "ins"))
      .toDF("k", "x", "tag").createOrReplaceTempView("evo_s")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO evo_t t USING evo_s s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "x", "tag"))
    assert(head.count() == 7)
    assert(head.filter(col("k") === 2L).select("x", "tag").head()
      == org.apache.spark.sql.Row(-2.0, "two"))
    assert(head.filter(col("k") === 99L).select("tag").head().getString(0)
      == "ins")
    assert(head.filter(col("k") === 1L).select("tag").head().isNullAt(0))
    spark.catalog.dropTempView("evo_t")
    spark.catalog.dropTempView("evo_s")
  }

  test("evolution composes with deletion vectors: widen + merge-on-read in sequence") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 12L).map(i => (i, i * 1.0)).toDF("k", "x").repartition(1),
      path) // v0
    val src = Seq((3L, -3.0, "t3"), (7L, -7.0, "t7"), (30L, -30.0, "ins"))
      .toDF("k", "x", "tag")
    val v = TxLogTable.mergeByKey(spark, path, src, Seq("k"),
      schemaEvolution = true, useDv = true)
    // addcolumns(1) then a dv merge(2): the seed file's bytes NEVER
    // rewrite — old images mask, new images append
    assert(v == 2L)
    val ops = TxLogTable.historyDf(spark, path)
      .orderBy("version").select("operation").collect()
      .map(_.getString(0)).toSeq
    assert(ops == Seq("append", "addcolumns", "dvmerge"), ops)
    assert(TxLogTable.filesAt(path, 0).forall(
      TxLogTable.filesAt(path, 2).contains),
      "dv merge must keep the seed file (append-only listing)")
    assert(TxLogTable.deletionVectors(path, 2).values.map(_._2).sum == 2)
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 13)
    assert(head.filter(col("k") === 3L).select("x", "tag").head()
      == org.apache.spark.sql.Row(-3.0, "t3"))
    assert(head.filter(col("k") === 1L).select("tag").head().isNullAt(0))
    assert(head.filter(col("k") === 30L).select("tag").head().getString(0)
      == "ins")
  }

  test("SQL evolution: an EXPLICIT SET list never auto-assigns the widened column") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 6L).map(i => (i, i * 1.0)).toDF("k", "x").repartition(1), path)
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("evx_t")
    Seq((2L, -2.0, "two"), (99L, -99.0, "ins"))
      .toDF("k", "x", "tag").createOrReplaceTempView("evx_s")
    // Delta's WITH SCHEMA EVOLUTION contract: only UPDATE SET * / INSERT *
    // auto-assign new columns; 'UPDATE SET x = s.x' writes exactly x, so
    // the matched row's freshly widened tag stays NULL — while INSERT *
    // still carries it for inserted rows
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO evx_t t USING evx_s s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET x = s.x
      WHEN NOT MATCHED THEN INSERT *""")
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "x", "tag"))
    assert(head.filter(col("k") === 2L).select("x").head().getDouble(0)
      == -2.0)
    assert(head.filter(col("k") === 2L).select("tag").head().isNullAt(0),
      "explicit SET must not silently write the widened column")
    assert(head.filter(col("k") === 99L).select("tag").head().getString(0)
      == "ins", "INSERT * still carries the widened column")
    spark.catalog.dropTempView("evx_t")
    spark.catalog.dropTempView("evx_s")
  }

  test("SQL evolution: an EXPLICIT INSERT column list pads unassigned columns with NULL") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 6L).map(i => (i, i * 1.0)).toDF("k", "x").repartition(1), path)
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("evi_t")
    Seq((3L, -3.0, "thr"), (88L, -88.0, "new"))
      .toDF("k", "x", "tag").createOrReplaceTempView("evi_s")
    spark.sql("""
      MERGE WITH SCHEMA EVOLUTION INTO evi_t t USING evi_s s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT (k, x) VALUES (s.k, s.x)""")
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("k", "x", "tag"))
    // star update DOES carry the widened column onto the matched row
    assert(head.filter(col("k") === 3L).select("tag").head().getString(0)
      == "thr")
    // the explicit insert list never mentioned tag → NULL (Delta's
    // explicit-clause contract), even though the source carries it
    assert(head.filter(col("k") === 88L).select("tag").head().isNullAt(0),
      "explicit INSERT (cols) must NULL-pad the widened column")
    spark.catalog.dropTempView("evi_t")
    spark.catalog.dropTempView("evi_s")
  }

  test("a merge rejected by validation leaves the target UNWIDENED (no orphan addcolumns commit)") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 4L).map(i => (i, i * 1.0)).toDF("k", "x").repartition(1), path)
    // duplicate keys in the source → the merge must refuse BEFORE the
    // durable widen commit
    val dup = Seq((2L, -2.0, "a"), (2L, -2.5, "b")).toDF("k", "x", "tag")
    intercept[IllegalArgumentException] {
      TxLogTable.mergeByKey(spark, path, dup, Seq("k"),
        schemaEvolution = true)
    }
    assert(TxLogTable.currentVersion(path) == 0L,
      "rejected merge must not commit the widen")
    assert(TxLogTable.read(spark, path).columns.toSeq == Seq("k", "x"))
    // a bad explicit SET (unknown column) refuses pre-widen too
    val src = Seq((2L, -2.0, "a")).toDF("k", "x", "tag")
    intercept[IllegalArgumentException] {
      TxLogTable.mergeByKey(spark, path, src, Seq("k"),
        whenMatchedSet = Some(Map("nope" -> "s.x")),
        insertUnmatched = false, schemaEvolution = true)
    }
    assert(TxLogTable.currentVersion(path) == 0L)
  }

  test("without schemaEvolution a widening whole-row merge still refuses loudly") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, 1.0)).toDF("k", "x"), path)
    val err = intercept[IllegalArgumentException] {
      TxLogTable.mergeByKey(spark, path,
        Seq((1L, 2.0, "t")).toDF("k", "x", "tag"), Seq("k"))
    }
    assert(err.getMessage.contains("schemaEvolution"))
  }
}
