package graft.sources

import graft.SparkSpec
import graft.operators.TxLogTable
import org.apache.spark.sql.functions._

/** SQL spellings for the OPERATIONAL surface ([[GraftSqlParser]] —
  * the delegating-parser integration): DESCRIBE HISTORY/DETAIL,
  * VACUUM [RETAIN n HOURS], OPTIMIZE [ZORDER BY], REORG … APPLY
  * (PURGE), ALTER TABLE RENAME/DROP COLUMN, and CTAS — each over
  * views, catalog tables, and the graftlog.`/path` literal form. */
class GraftOpsSqlSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-opssql").toString
    (0 until 3).foreach { b =>
      TxLogTable.append(spark,
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"r$i", i % 3))
          .toDF("id", "v", "grp").repartition(1), path)
    }
    path
  }

  test("DESCRIBE HISTORY / DETAIL over path literal, view, and catalog table") {
    val path = fresh()
    // path-literal form
    val h = spark.sql(s"DESCRIBE HISTORY graftlog.`$path`")
    assert(h.columns.toSeq ==
      Seq("version", "timestamp", "operation", "is_rebase", "num_files"))
    assert(h.count() == 3)
    assert(h.orderBy("version").select("operation").as[String]
      .collect().toSeq == Seq("append", "append", "append"))
    val d = spark.sql(s"DESC DETAIL graftlog.`$path`").head()
    assert(d.getAs[Long]("version") == 2L)
    assert(d.getAs[Long]("num_files") == 3L)
    // temp-view target
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("ops_v")
    assert(spark.sql("DESCRIBE HISTORY ops_v").count() == 3)
    // catalog-table target
    spark.sql("DROP TABLE IF EXISTS ops_ct")
    spark.sql(s"CREATE TABLE ops_ct USING graftlog OPTIONS (path '$path')")
    assert(spark.sql("DESCRIBE DETAIL ops_ct").head()
      .getAs[Long]("num_files") == 3L)
    spark.sql("DROP TABLE ops_ct")
    spark.catalog.dropTempView("ops_v")
  }

  test("OPTIMIZE compacts (one commit); ZORDER BY clusters; plain DESCRIBE still works") {
    val path = fresh()
    val v = spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0)
    assert(v == 3L)
    assert(TxLogTable.read(spark, path).count() == 30)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "compact")
    val v2 = spark.sql(s"OPTIMIZE graftlog.`$path` ZORDER BY (id, grp)")
      .head().getLong(0)
    assert(v2 == 4L)
    assert(TxLogTable.read(spark, path).count() == 30)
    // the graft parser must not shadow ordinary statements
    spark.read.format("graftlog").load(path).createOrReplaceTempView("opt_v")
    assert(spark.sql("DESCRIBE opt_v").count() > 0)
    assert(spark.sql("SELECT count(*) FROM opt_v").head().getLong(0) == 30)
    spark.catalog.dropTempView("opt_v")
  }

  test("plain OPTIMIZE is bin-packed small-files-only by default; FULL is the rewrite opt-in") {
    val path = fresh()
    // default path: the three small files merge once...
    val v = spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0)
    assert(v == 3L)
    assert(TxLogTable.filesAt(path, 3).size == 1)
    assert(TxLogTable.read(spark, path).count() == 30)
    // ...and a second plain OPTIMIZE is a NO-OP (-1): the merged file
    // is the only candidate and plain OPTIMIZE never rewrites a
    // lone already-compacted file — Delta's posture
    assert(spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0)
      == -1L)
    assert(TxLogTable.currentVersion(path) == 3L)
    // OPTIMIZE FULL is the explicit whole-table rewrite: it commits
    // even where the bin-packed default found nothing to do
    val vf = spark.sql(s"OPTIMIZE graftlog.`$path` FULL").head().getLong(0)
    assert(vf == 4L)
    assert(TxLogTable.read(spark, path).count() == 30)
  }

  test("OPTIMIZE on a partition-evolved (mixed-layout) table compacts correctly both ways") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-mixed").toString
    // partition EVOLUTION: unpartitioned appends, then partitioned ones
    // (string partition values that cannot re-infer as a numeric type)
    def pOf(i: Int) = if (i % 2 == 0) "pa" else "pb"
    (0 until 2).foreach { b =>
      TxLogTable.append(spark,
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, pOf(i)))
          .toDF("id", "p").repartition(1), path)
    }
    (2 until 4).foreach { b =>
      TxLogTable.append(spark,
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, pOf(i)))
          .toDF("id", "p").repartition(1), path,
        partitionBy = Seq("p"))
    }
    val before = TxLogTable.read(spark, path).orderBy("id").collect().toSeq
    // plain OPTIMIZE: bins are partition-aligned, so the flat files
    // merge together and each p=v group merges within itself — rows
    // and schema survive the mixed layout
    val v = spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0)
    assert(v >= 4L)
    assert(TxLogTable.read(spark, path).orderBy("id").collect().toSeq
      == before)
    // FULL on the evolved table: the union-of-observed-partition-cols
    // rewrite also preserves every row
    val vf = spark.sql(s"OPTIMIZE graftlog.`$path` FULL").head().getLong(0)
    assert(vf > v)
    assert(TxLogTable.read(spark, path).orderBy("id").collect().toSeq
      == before)
  }

  test("REORG APPLY (PURGE) folds dvs; VACUUM RETAIN reaps by wall clock") {
    val path = fresh()
    TxLogTable.deleteWhereDv(spark, path, col("id").isin(3L, 13L))
    assert(TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path)).nonEmpty)
    val v = spark.sql(s"REORG TABLE graftlog.`$path` APPLY (PURGE)")
      .head().getLong(0)
    assert(v == 4L)
    assert(TxLogTable.deletionVectors(path, v).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 28)
    // default retention (168h): everything is fresh → nothing reaps
    assert(spark.sql(s"VACUUM graftlog.`$path`").count() == 0)
    // explicit zero retention: superseded dirs (incl. the dv dir) reap
    val reaped = spark.sql(s"VACUUM graftlog.`$path` RETAIN 0 HOURS")
      .as[String].collect()
    assert(reaped.exists(_.startsWith("data-dvs-")), reaped.toSeq.toString)
    assert(TxLogTable.read(spark, path).count() == 28)
  }

  test("ALTER TABLE RENAME/DROP COLUMN on a catalog graftlog table; non-graft delegates") {
    val path = fresh()
    spark.sql("DROP TABLE IF EXISTS ops_alter")
    spark.sql(s"CREATE TABLE ops_alter USING graftlog OPTIONS (path '$path')")
    spark.sql("ALTER TABLE ops_alter RENAME COLUMN v TO label")
    assert(spark.table("ops_alter").columns.toSeq ==
      Seq("id", "label", "grp"))
    assert(spark.sql("SELECT label FROM ops_alter WHERE id = 7").head()
      .getString(0) == "r7")
    // a NEW session resolves the renamed schema from the shared catalog
    val s2 = spark.newSession()
    assert(s2.sql("SELECT label FROM ops_alter WHERE id = 8").head()
      .getString(0) == "r8")
    spark.sql("ALTER TABLE ops_alter DROP COLUMN grp")
    assert(spark.table("ops_alter").columns.toSeq == Seq("id", "label"))
    assert(spark.sql("SELECT count(*) FROM ops_alter").head()
      .getLong(0) == 30)
    // time travel below both DDLs serves the original shape
    assert(TxLogTable.readVersion(spark, path, 2).columns.toSeq ==
      Seq("id", "v", "grp"))
    // a non-graftlog table keeps Spark's own unsupported error
    spark.sql("DROP TABLE IF EXISTS ops_pq")
    spark.range(3).write.saveAsTable("ops_pq")
    val e = intercept[Exception](
      spark.sql("ALTER TABLE ops_pq RENAME COLUMN id TO x"))
    assert(e.getMessage.contains("RENAME COLUMN"), e.getMessage)
    spark.sql("DROP TABLE ops_pq")
    spark.sql("DROP TABLE ops_alter")
  }

  test("RESTORE TABLE TO VERSION AS OF re-points the log in one commit") {
    val path = fresh()
    TxLogTable.deleteWhere(spark, path, col("id") >= 20)
    assert(TxLogTable.read(spark, path).count() == 20)
    val v = spark.sql(s"RESTORE TABLE graftlog.`$path` TO VERSION AS OF 2")
      .head().getLong(0)
    assert(v == 4L)
    assert(TxLogTable.read(spark, path).count() == 30)
    // undo-the-restore is just another restore
    spark.sql(s"RESTORE graftlog.`$path` TO VERSION AS OF 3")
    assert(TxLogTable.read(spark, path).count() == 20)
  }

  test("SET/UNSET/SHOW TBLPROPERTIES route to the LOG's store; dv routing follows") {
    val path = fresh()
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("props_v")
    spark.sql("ALTER TABLE props_v SET TBLPROPERTIES " +
      "('graft.enableDeletionVectors' = 'true', 'owner' = 'pipeline')")
    assert(TxLogTable.tableProperties(path) ==
      Map("graft.enableDeletionVectors" -> "true", "owner" -> "pipeline"))
    val shown = spark.sql("SHOW TBLPROPERTIES props_v").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(shown("owner") == "pipeline")
    // the SQL-set property routes the next SQL DELETE to the dv path
    val before = TxLogTable.filesAt(path, TxLogTable.currentVersion(path))
    spark.sql("DELETE FROM props_v WHERE id = 11")
    assert(TxLogTable.filesAt(path,
      TxLogTable.currentVersion(path)).toSet == before.toSet,
      "SQL-set property must route DELETE merge-on-read")
    spark.sql("ALTER TABLE props_v UNSET TBLPROPERTIES ('owner')")
    assert(TxLogTable.tableProperties(path) ==
      Map("graft.enableDeletionVectors" -> "true"))
    // a NON-graft table keeps Spark's native TBLPROPERTIES semantics
    spark.sql("DROP TABLE IF EXISTS props_pq")
    spark.range(3).write.saveAsTable("props_pq")
    spark.sql("ALTER TABLE props_pq SET TBLPROPERTIES ('a' = 'b')")
    assert(spark.sql("SHOW TBLPROPERTIES props_pq").collect()
      .exists(r => r.getString(0) == "a" && r.getString(1) == "b"))
    spark.sql("DROP TABLE props_pq")
    spark.catalog.dropTempView("props_v")
  }

  test("SET/UNSET TBLPROPERTIES refuse a time-travel-pinned catalog alias; SHOW serves it") {
    val path = fresh()
    spark.sql("DROP TABLE IF EXISTS props_pin")
    spark.sql(s"CREATE TABLE props_pin USING graftlog " +
      s"OPTIONS (path '$path', versionAsOf '0')")
    // a WRITE DDL through the pinned alias would mutate the LIVE
    // table's log property store (e.g. flip dv routing for every
    // writer) — refuse, like every other write DDL on a pinned alias
    val e1 = intercept[Exception](
      spark.sql("ALTER TABLE props_pin SET TBLPROPERTIES ('a' = 'b')"))
    assert(e1.getMessage.contains("time-travel"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE props_pin UNSET TBLPROPERTIES ('a')"))
    assert(e2.getMessage.contains("time-travel"), e2.getMessage)
    assert(TxLogTable.tableProperties(path).isEmpty,
      "the live property store must be untouched")
    // the read-only probe still serves the pinned alias
    spark.sql("SHOW TBLPROPERTIES props_pin").collect()
    spark.sql("DROP TABLE props_pin")
  }

  test("SQL time travel: VERSION AS OF / TIMESTAMP AS OF on tables and views") {
    val path = fresh()
    spark.sql("DROP TABLE IF EXISTS tt_ct")
    spark.sql(s"CREATE TABLE tt_ct USING graftlog OPTIONS (path '$path')")
    TxLogTable.deleteWhere(spark, path, col("id") >= 10)
    assert(spark.sql("SELECT count(*) FROM tt_ct").head().getLong(0) == 10)
    assert(spark.sql("SELECT count(*) FROM tt_ct VERSION AS OF 2")
      .head().getLong(0) == 30)
    assert(spark.sql("SELECT count(*) FROM tt_ct VERSION AS OF 0")
      .head().getLong(0) == 10)
    // joins of two versions of the SAME table
    assert(spark.sql("""
      SELECT count(*) FROM tt_ct VERSION AS OF 2 a
      LEFT ANTI JOIN tt_ct b ON a.id = b.id""").head().getLong(0) == 20)
    // temp views travel too
    spark.read.format("graftlog").load(path).createOrReplaceTempView("tt_v")
    assert(spark.sql("SELECT max(id) FROM tt_v VERSION AS OF 1")
      .head().getLong(0) == 19L)
    // timestamp form: the head's exact commit wall clock (epoch millis
    // — a seconds-truncated string would land BEFORE the commit and
    // resolve the prior version, the monotonized-timestamp contract)
    val ms = TxLogTable.history(path).last._2
    assert(spark.sql(
      s"SELECT count(*) FROM tt_ct TIMESTAMP AS OF '$ms'")
      .head().getLong(0) == 10)
    spark.sql("DROP TABLE tt_ct")
    spark.catalog.dropTempView("tt_v")
  }

  test("readChangeFeed batch option: inclusive version range, delta column contract") {
    val path = fresh()
    TxLogTable.deleteWhere(spark, path, col("id") === 5) // v3
    val feed = spark.read.format("graftlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1)
      .load(path)
    assert(feed.columns.takeRight(3).toSeq ==
      Seq("_change_type", "_commit_version", "_commit_timestamp"))
    // versions 1..3: two 10-row appends + one 1-row delete
    assert(feed.filter(col("_change_type") === "insert").count() == 20)
    assert(feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSeq == Seq(5L))
    assert(feed.select("_commit_version").distinct().as[Long]
      .collect().sorted.toSeq == Seq(1L, 2L, 3L))
    // bounded range [2, 2]: exactly that commit's rows
    val one = spark.read.format("graftlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", 2).option("endingVersion", 2)
      .load(path)
    assert(one.count() == 10)
    assert(one.select("_commit_version").distinct().as[Long].head() == 2L)
  }

  test("CTAS: CREATE TABLE … USING graftlog AS SELECT lands as the ACID v0") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-ctas").toString + "/t"
    spark.sql("DROP TABLE IF EXISTS ops_ctas")
    spark.sql(s"""
      CREATE TABLE ops_ctas USING graftlog OPTIONS (path '$path')
      AS SELECT id, id * 10 AS v FROM range(50)""")
    // exactly ONE commit — the table's v0 IS the select result
    assert(TxLogTable.currentVersion(path) == 0L)
    assert(spark.table("ops_ctas").count() == 50)
    assert(spark.sql("SELECT v FROM ops_ctas WHERE id = 7").head()
      .getLong(0) == 70L)
    // a new session reads by name; time travel to v0 works
    assert(spark.newSession().table("ops_ctas").count() == 50)
    assert(TxLogTable.readVersion(spark, path, 0).count() == 50)
    // and it is a full ACID table from birth
    spark.sql("DELETE FROM ops_ctas WHERE id < 10")
    assert(spark.table("ops_ctas").count() == 40)
    assert(TxLogTable.currentVersion(path) == 1L)
    spark.sql("DROP TABLE ops_ctas")
  }

  test("VACUUM ... DRY RUN reports the blast radius without deleting") {
    val path = fresh()
    spark.sql(s"OPTIMIZE graftlog.`$path`") // supersedes the 3 small dirs
    val dry = spark.sql(s"VACUUM graftlog.`$path` RETAIN 0 HOURS DRY RUN")
      .as[String].collect().toSet
    assert(dry.size == 3, s"3 superseded dirs expected, got $dry")
    // nothing deleted: time travel below the compaction still reads
    assert(TxLogTable.readVersion(spark, path, 0).count() == 10)
    // the real pass reaps exactly what the dry run named
    val real = spark.sql(s"VACUUM graftlog.`$path` RETAIN 0 HOURS")
      .as[String].collect().toSet
    assert(real == dry)
    assert(TxLogTable.read(spark, path).count() == 30)
  }

  test("CREATE TABLE ... SHALLOW CLONE: zero-copy clone via SQL, independent evolution") {
    val path = fresh()
    TxLogTable.deleteWhere(spark, path, col("id") === 5L) // v3 on source
    val destPath = java.nio.file.Files
      .createTempDirectory("graft-opssql-clone").toString + "/t"
    // clone the PRE-delete snapshot by version, path-literal dest
    val v = spark.sql(
      s"CREATE TABLE graftlog.`$destPath` SHALLOW CLONE graftlog.`$path` " +
        "VERSION AS OF 2").head().getLong(0)
    assert(v == 0L)
    assert(TxLogTable.read(spark, destPath).count() == 30,
      "the clone serves the pre-delete snapshot")
    // zero-copy: the cloned bytes are hard links (same inode)
    val rel = TxLogTable.filesAt(destPath, 0).head
    def ino(p: String) = java.nio.file.Files.getAttribute(
      java.nio.file.Paths.get(p), "unix:ino")
    assert(ino(s"$destPath/$rel") == ino(s"$path/$rel"),
      "clone must hard-link, not copy")
    // independent evolution: DML on the clone never touches the source
    TxLogTable.deleteWhere(spark, destPath, col("id") < 10L)
    assert(TxLogTable.read(spark, destPath).count() == 20)
    assert(TxLogTable.read(spark, path).count() == 29)
    // catalog-name dest with LOCATION registers the table
    spark.sql("DROP TABLE IF EXISTS ops_clone_ct")
    val destPath2 = java.nio.file.Files
      .createTempDirectory("graft-opssql-clone2").toString + "/t"
    spark.sql(s"CREATE TABLE ops_clone_ct SHALLOW CLONE " +
      s"graftlog.`$path` LOCATION '$destPath2'")
    assert(spark.table("ops_clone_ct").count() == 29)
    spark.sql("DROP TABLE ops_clone_ct")
  }
}
