package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** COLUMN MAPPING — metadata-only RENAME/DROP COLUMN
  * ([[TxLogTable.renameColumn]] / [[TxLogTable.dropColumn]], the delta
  * world's `columnMapping.mode = name`): the recorded schema renames or
  * narrows while every parquet file keeps its bytes; reads scan under
  * PHYSICAL names and project to logical, writes rename
  * logical→physical at stage time, and time travel below the DDL
  * serves the old spelling. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-colmap").toString

  private def seed(path: String): Unit =
    (0 until 3).foreach { b =>
      TxLogTable.append(spark,
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"r$i", i % 3))
          .toDF("id", "v", "grp").repartition(1), path)
    }

  test("rename: metadata-only commit, read-back under the new name, time travel below") {
    val path = tmp
    seed(path)
    val at0 = TxLogTable.filesAt(path, 2)
    val v = TxLogTable.renameColumn(spark, path, "v", "label")
    assert(v == 3)
    // LISTING IDENTITY — zero data bytes moved
    assert(TxLogTable.filesAt(path, 3).toSet == at0.toSet,
      "rename must be metadata-only")
    val t = TxLogTable.read(spark, path)
    assert(t.columns.toSeq == Seq("id", "label", "grp"))
    // values came from the files' physical column
    assert(t.filter(col("id") === 7).select("label").as[String].head()
      == "r7")
    assert(t.count() == 30)
    // time travel BELOW the DDL serves the old name
    val old = TxLogTable.readVersion(spark, path, 2)
    assert(old.columns.toSeq == Seq("id", "v", "grp"))
    assert(old.filter(col("id") === 7).select("v").as[String].head() == "r7")
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "renamecolumn")
  }

  test("appends after a rename write physical names; reads stay uniform") {
    val path = tmp
    seed(path)
    TxLogTable.renameColumn(spark, path, "v", "label")
    TxLogTable.append(spark,
      Seq((100L, "new100", 1)).toDF("id", "label", "grp"), path)
    val t = TxLogTable.read(spark, path)
    assert(t.count() == 31)
    assert(t.filter(col("id") === 100).select("label").as[String].head()
      == "new100")
    // the staged file spells the column PHYSICALLY (old name), so one
    // physical read schema covers every file — prove it by reading the
    // new file raw
    val newFile = TxLogTable.filesAt(path, 4)
      .diff(TxLogTable.filesAt(path, 3)).head
    val raw = spark.read.parquet(s"$path/$newFile")
    assert(raw.columns.contains("v") && !raw.columns.contains("label"),
      s"staged file must carry the physical name; got ${raw.columns.toSeq}")
    // appends may not smuggle in unknown columns (no physical name)
    val e = intercept[IllegalArgumentException](TxLogTable.append(spark,
      Seq((101L, "x", 1, 9.9)).toDF("id", "label", "grp", "extra"), path))
    assert(e.getMessage.contains("addColumns"), e.getMessage)
  }

  test("DML on a renamed column: update/delete resolve logically, prune physically") {
    val path = tmp
    seed(path)
    TxLogTable.renameColumn(spark, path, "v", "label")
    val at = TxLogTable.filesAt(path, 3)
    TxLogTable.updateWhere(spark, path,
      Map("label" -> lit("upd")), col("id") === 15)
    // file pruning still works: only the file holding id=15 rewrote
    val after = TxLogTable.filesAt(path, 4)
    assert(at.diff(after).size == 1, "exactly one file may rewrite")
    assert(TxLogTable.read(spark, path).filter(col("id") === 15)
      .select("label").as[String].head() == "upd")
    TxLogTable.deleteWhere(spark, path, col("label") === "upd")
    assert(TxLogTable.read(spark, path).count() == 29)
  }

  test("drop: metadata-only, re-added name does NOT resurrect dropped bytes") {
    val path = tmp
    seed(path)
    val at0 = TxLogTable.filesAt(path, 2)
    val v = TxLogTable.dropColumn(spark, path, "v")
    assert(v == 3)
    assert(TxLogTable.filesAt(path, 3).toSet == at0.toSet,
      "drop must be metadata-only")
    val t = TxLogTable.read(spark, path)
    assert(t.columns.toSeq == Seq("id", "grp"))
    // time travel still serves the column
    assert(TxLogTable.readVersion(spark, path, 2).columns.contains("v"))
    // re-add the SAME logical name: born NULL everywhere — the old
    // files' physical "v" bytes must not bleed through (fresh physical)
    TxLogTable.addColumns(spark, path, Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val t2 = TxLogTable.read(spark, path)
    assert(t2.columns.toSeq == Seq("id", "grp", "v"))
    assert(t2.filter(col("v").isNotNull).count() == 0,
      "re-added column must be born NULL, not resurrect dropped bytes")
    // and it is writable under the fresh physical name
    TxLogTable.updateWhere(spark, path, Map("v" -> lit("fresh")),
      col("id") === 3)
    assert(TxLogTable.read(spark, path).filter(col("v") === "fresh")
      .select("id").as[Long].head() == 3L)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "dropcolumn")
  }

  test("refusals: partition column, constraint reference, duplicate target, last column") {
    val p1 = tmp
    TxLogTable.append(spark,
      (0 until 10).map(i => (i.toLong, s"r$i", s"p${i % 2}"))
        .toDF("id", "v", "part"), p1, partitionBy = Seq("part"))
    val e1 = intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, p1, "part", "bucket"))
    assert(e1.getMessage.contains("partition"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      TxLogTable.dropColumn(spark, p1, "part"))
    assert(e2.getMessage.contains("partition"), e2.getMessage)

    val p2 = tmp
    seed(p2)
    TxLogTable.addCheckConstraint(spark, p2, "v_nonempty", "length(v) > 0")
    val e3 = intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, p2, "v", "w"))
    assert(e3.getMessage.contains("constraint"), e3.getMessage)
    val e4 = intercept[IllegalArgumentException](
      TxLogTable.dropColumn(spark, p2, "v"))
    assert(e4.getMessage.contains("constraint"), e4.getMessage)
    val e5 = intercept[IllegalArgumentException](
      TxLogTable.renameColumn(spark, p2, "id", "grp"))
    assert(e5.getMessage.contains("already exists"), e5.getMessage)

    val p3 = tmp
    TxLogTable.append(spark, Seq(1L, 2L).toDF("only"), p3)
    val e6 = intercept[IllegalArgumentException](
      TxLogTable.dropColumn(spark, p3, "only"))
    assert(e6.getMessage.contains("only column"), e6.getMessage)
  }

  test("connector reads apply the mapping; raw scans without extensions fail loudly") {
    val path = tmp
    seed(path)
    TxLogTable.renameColumn(spark, path, "v", "label")
    // fresh view through the session WITH extensions: the read rewrite
    // scans physical, projects logical
    val df = spark.read.format("graftlog").load(path)
    assert(df.columns.toSeq == Seq("id", "label", "grp"))
    df.createOrReplaceTempView("cm_t")
    assert(spark.sql("SELECT label FROM cm_t WHERE id = 7").head()
      .getString(0) == "r7")
    assert(spark.sql("SELECT count(*) FROM cm_t WHERE label LIKE 'r%'")
      .head().getLong(0) == 30L)
    // SQL DML over the mapped view routes to the head
    spark.sql("UPDATE cm_t SET label = 'sqlu' WHERE id = 9")
    assert(TxLogTable.read(spark, path).filter(col("id") === 9)
      .select("label").as[String].head() == "sqlu")
    spark.catalog.dropTempView("cm_t")
    // a RAW index (no rewrite approval) must throw, never serve NULLs
    val idx = new graft.sources.GraftLogFileIndex(spark, path, None,
      org.apache.spark.sql.types.StructType(Nil))
    val e = intercept[IllegalStateException](idx.listFiles(Nil, Nil))
    assert(e.getMessage.contains("column mapping"), e.getMessage)
    // PLAN GUARD: the rewrite keeps the vectorized scan, and a filter
    // on the LOGICAL name pushes to parquet under the PHYSICAL name
    // with column pruning intact — the mapping costs one Project, not
    // the scan's pushdown
    val plan = spark.read.format("graftlog").load(path)
      .filter(col("label") === "r7").select("id", "label")
      .queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), plan)
    assert("PushedFilters: \\[[^\\]]*EqualTo\\(v,r7\\)".r
      .findFirstIn(plan).isDefined, plan)
    assert("ReadSchema: struct<id:bigint,v:string>".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("deletion vectors + rename compose: masks and mapping both apply") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 5)
    TxLogTable.renameColumn(spark, path, "v", "label")
    val t = TxLogTable.read(spark, path)
    assert(t.count() == 29)
    assert(t.columns.toSeq == Seq("id", "label", "grp"))
    assert(t.filter(col("id") === 5).isEmpty)
    assert(t.filter(col("id") === 6).select("label").as[String].head()
      == "r6")
    // connector path too
    val df = spark.read.format("graftlog").load(path)
    assert(df.count() == 29)
    assert(df.filter(col("label") === "r6").count() == 1)
    // dv update on the RENAMED column
    TxLogTable.updateWhereDv(spark, path, Map("label" -> lit("z")),
      col("id") === 8)
    assert(TxLogTable.read(spark, path).filter(col("id") === 8)
      .select("label").as[String].head() == "z")
  }

  test("a running stream fails LOUDLY on a mid-stream rename; restart serves the new spelling") {
    val path = tmp
    seed(path)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-cm-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def start() = spark.readStream.format("graftlog").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got.add(b.columns.mkString(",")); ()
      }.start()
    val q = start()
    q.processAllAvailable()
    // rename mid-stream, then commit data under the new spelling: the
    // pinned-at-start schema cannot represent it — the stream must
    // fail loudly (the gained-column guard), never silently project
    TxLogTable.renameColumn(spark, path, "v", "label")
    TxLogTable.append(spark,
      Seq((50L, "n50", 1)).toDF("id", "label", "grp"), path)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
    }
    assert(e.getCause.getMessage.contains("pinned at stream start"),
      e.getCause.getMessage)
    // a fresh start picks up the renamed schema from the log and
    // resumes at the checkpointed version
    got.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.toArray.toSeq.nonEmpty &&
      got.toArray.forall(_.toString.contains("label")),
      s"restarted stream must serve the new spelling: $got")
  }

  test("compact and purge preserve the mapping (rewrites stay physical)") {
    val path = tmp
    seed(path)
    TxLogTable.renameColumn(spark, path, "v", "label")
    TxLogTable.deleteWhereDv(spark, path, col("id") === 9)
    // OPTIMIZE folds the 3 files (and the dv mask) into a rewrite; the
    // staged files must spell the column PHYSICALLY and the commit must
    // carry the mapped schema, so post-compaction reads stay logical
    val v = TxLogTable.compact(spark, path)
    val t = TxLogTable.read(spark, path)
    assert(t.columns.toSeq == Seq("id", "label", "grp"))
    assert(t.count() == 29)
    assert(t.filter(col("id") === 8).select("label").as[String].head()
      == "r8")
    val newFile = TxLogTable.filesAt(path, v).head
    assert(spark.read.parquet(s"$path/$newFile").columns.contains("v"),
      "compacted files must keep the physical spelling")
    // dv purge after a fresh mask, same contract
    TxLogTable.deleteWhereDv(spark, path, col("id") === 8)
    TxLogTable.purgeDeletes(spark, path)
    val t2 = TxLogTable.read(spark, path)
    assert(t2.count() == 28 && t2.columns.toSeq ==
      Seq("id", "label", "grp"))
    assert(t2.filter(col("id") === 7).select("label").as[String].head()
      == "r7")
  }

  test("change feed crosses a rename boundary with each side's own spelling") {
    val path = tmp
    seed(path)
    TxLogTable.renameColumn(spark, path, "v", "label")
    TxLogTable.append(spark,
      Seq((200L, "n200", 2)).toDF("id", "label", "grp"), path)
    // the rename commit itself is a no-row diff (identical listing,
    // identical dv pointers)
    assert(TxLogTable.changesBetween(spark, path, 2, 3).count() == 0)
    // the post-rename append streams under the NEW name
    val ch = TxLogTable.changesBetween(spark, path, 3, 4)
    assert(ch.columns.contains("label"))
    assert(ch.filter(col("_change_type") === "insert")
      .select("label").as[String].collect().toSeq == Seq("n200"))
  }
}
