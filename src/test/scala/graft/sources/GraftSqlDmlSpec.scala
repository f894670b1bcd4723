package graft.sources

import graft.SparkSpec
import graft.operators.TxLogTable
import org.apache.spark.sql.functions._

/** SQL row-level DML (`UPDATE` / `DELETE FROM` / `MERGE INTO` as plain
  * `spark.sql` statements) on graftlog tables: each statement must land
  * as ONE file-pruned ACID commit — untouched files carry into the new
  * version BY REFERENCE, the operation names itself in DESCRIBE
  * HISTORY, and every prior version stays time-travelable. */
class GraftSqlDmlSpec extends SparkSpec {
  import spark.implicits._

  /** 3 commits of disjoint id ranges, 4 files each — so range-scoped
    * DML has 8 files it must NOT rewrite. */
  private def freshTable(): String = {
    val path = java.nio.file.Files
      .createTempDirectory("graft-sqldml").toString
    (0 until 3).foreach { c =>
      TxLogTable.append(spark,
        spark.range(c * 100, (c + 1) * 100)
          .select($"id", ($"id" * 10).as("v"),
            concat(lit("g"), ($"id" % 4).cast("string")).as("k"))
          .repartition(4), path)
    }
    path
  }

  private def files(path: String): Seq[String] =
    TxLogTable.snapshotFiles(path, TxLogTable.currentVersion(path))

  /** Files ADDED at version `v` of the 3-commit fixture (snapshot diff
    * — the public surface for "which files did commit v stage"). */
  private def commitFiles(path: String, v: Long): Seq[String] = {
    val at = TxLogTable.snapshotFiles(path, v)
    if (v == 0) at else at.diff(TxLogTable.snapshotFiles(path, v - 1))
  }

  test("SQL DELETE FROM: one ACID commit, file-pruned, history intact") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_del")
    val before = files(path)
    val v0 = TxLogTable.currentVersion(path)

    spark.sql("DELETE FROM t_del WHERE id >= 100 AND id < 110")

    assert(TxLogTable.currentVersion(path) == v0 + 1, "exactly one commit")
    val after = files(path)
    // only commit-1's files (ids 100..199) may rewrite; commits 0 and
    // 2's 8 files must carry into the new version BY REFERENCE
    val mustCarry = commitFiles(path, 0) ++ commitFiles(path, 2)
    assert(mustCarry.size == 8 && mustCarry.forall(after.contains),
      s"out-of-range files must carry by reference; lost ${
        mustCarry.filterNot(after.contains)}")
    assert(before.size == 12)
    // semantics: through the live view AND a fresh read
    assert(spark.sql("SELECT count(*) c FROM t_del").as[Long].head == 290)
    assert(TxLogTable.read(spark, path)
      .filter($"id" >= 100 && $"id" < 110).isEmpty)
    // history: the delete names itself; the pre-delete version reads
    val h = TxLogTable.historyDf(spark, path)
      .orderBy(desc("version")).select("operation").as[String].head()
    assert(h == "delete")
    assert(TxLogTable.readVersion(spark, path, v0).count() == 300)
  }

  test("SQL DELETE FROM without WHERE deletes everything (one commit)") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_da")
    spark.sql("DELETE FROM t_da")
    assert(spark.sql("SELECT count(*) c FROM t_da").as[Long].head == 0)
    assert(TxLogTable.currentVersion(path) == 3)
  }

  test("SQL UPDATE: SET expressions over the pre-update row, file-pruned, NULL-predicate rows survive") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_upd")
    val before = files(path)
    val v0 = TxLogTable.currentVersion(path)

    // swap semantics: RHS evaluates against the PRE-update row
    spark.sql(
      "UPDATE t_upd SET v = v + id, k = upper(k) WHERE id >= 200 AND id < 205")

    assert(TxLogTable.currentVersion(path) == v0 + 1)
    val after = files(path)
    // ids 200..204 live only in commit 2's files: commits 0 and 1 carry
    val mustCarry = commitFiles(path, 0) ++ commitFiles(path, 1)
    assert(mustCarry.size == 8 && mustCarry.forall(after.contains),
      "untouched commits' files carry by reference")
    assert(before.size == 12)
    val got = spark.sql(
      "SELECT id, v, k FROM t_upd WHERE id >= 200 AND id < 205 ORDER BY id")
      .as[(Long, Long, String)].collect()
    assert(got.toSeq == (200L until 205L).map(i =>
      (i, i * 10 + i, s"G${i % 4}")))
    // out-of-range rows untouched
    assert(spark.sql(
      "SELECT count(*) c FROM t_upd WHERE v = id * 10 AND k = concat('g', cast(id % 4 AS string))")
      .as[Long].head == 295)
    val op = TxLogTable.historyDf(spark, path)
      .orderBy(desc("version")).select("operation").as[String].head()
    assert(op == "update")
  }

  test("SQL MERGE INTO: conditional update + delete + INSERT *, one commit, delete-before-update order") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_mrg")
    // source: updates for ids 0..9 (big v), 5..14 overlap, inserts 300..304
    Seq.tabulate(15)(i => (i.toLong, 1000L + i, "src"))
      .++(Seq.tabulate(5)(i => (300L + i, 7L, "new")))
      .toDF("id", "v", "k").createOrReplaceTempView("s_mrg")
    val v0 = TxLogTable.currentVersion(path)

    spark.sql("""
      MERGE INTO t_mrg USING s_mrg ON t_mrg.id = s_mrg.id
      WHEN MATCHED AND s_mrg.id < 5 THEN DELETE
      WHEN MATCHED AND s_mrg.v > 1010 THEN UPDATE SET v = s_mrg.v, k = s_mrg.k
      WHEN NOT MATCHED THEN INSERT *
    """)

    assert(TxLogTable.currentVersion(path) == v0 + 1, "exactly one commit")
    val t = TxLogTable.read(spark, path)
    assert(t.filter($"id" < 5).isEmpty, "delete clause")
    // ids 5..10: matched, v = 1005..1010 NOT > 1010 → carried unchanged
    assert(t.filter($"id" >= 5 && $"id" <= 10 && $"k" === "src").isEmpty,
      "non-qualifying matches carry unchanged")
    // ids 11..14: updated
    assert(t.filter($"k" === "src").select("id").as[Long].collect().sorted
      .toSeq == (11L to 14L))
    assert(t.filter($"id" === 13L).select("v").as[Long].head() == 1013L)
    // inserts landed
    assert(t.filter($"k" === "new").count() == 5)
    assert(t.count() == 300 - 5 + 5)
    val op = TxLogTable.historyDf(spark, path)
      .orderBy(desc("version")).select("operation").as[String].head()
    assert(op == "merge")
  }

  test("SQL MERGE INTO with aliases, cross-referencing SET, explicit INSERT projection, conditional insert") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_m2")
    Seq((1L, 5L), (2L, 6L), (400L, 8L), (401L, 99L))
      .toDF("id", "delta").createOrReplaceTempView("s_m2")

    spark.sql("""
      MERGE INTO t_m2 AS tgt USING s_m2 AS src ON tgt.id = src.id
      WHEN MATCHED THEN UPDATE SET v = tgt.v + src.delta
      WHEN NOT MATCHED AND src.delta < 50
        THEN INSERT (id, v, k) VALUES (src.id, src.delta * 2, 'ins')
    """)

    val t = TxLogTable.read(spark, path)
    assert(t.filter($"id" === 1L).select("v").as[Long].head() == 15L)
    assert(t.filter($"id" === 2L).select("v").as[Long].head() == 26L)
    assert(t.filter($"id" === 400L).select("v", "k").as[(Long, String)]
      .head() == ((16L, "ins")), "projected conditional insert")
    assert(t.filter($"id" === 401L).isEmpty,
      "insert condition filters the source")
    assert(t.count() == 301)
  }

  test("MERGE results match the API-level mergeByKey on the same inputs") {
    val pSql = freshTable(); val pApi = freshTable()
    spark.read.format("graftlog").load(pSql).createOrReplaceTempView("t_eq")
    val src = Seq.tabulate(20)(i => (i * 7L, 5000L + i, "x"))
      .toDF("id", "v", "k")
    src.createOrReplaceTempView("s_eq")
    spark.sql("""
      MERGE INTO t_eq USING s_eq ON t_eq.id = s_eq.id
      WHEN MATCHED AND s_eq.v % 2 = 0 THEN UPDATE SET v = s_eq.v, k = s_eq.k
      WHEN NOT MATCHED THEN INSERT *
    """)
    TxLogTable.mergeByKey(spark, pApi, src, Seq("id"),
      whenMatchedUpdateIf = Some("s.v % 2 = 0"))
    val a = TxLogTable.read(spark, pSql).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    val b = TxLogTable.read(spark, pApi).orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(a == b, "SQL MERGE and mergeByKey must agree row-for-row")
  }

  test("unsupported MERGE shapes and pinned targets fail loudly; non-graftlog DML untouched") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_er")
    Seq((1L, 2L, "z")).toDF("id", "v", "k").createOrReplaceTempView("s_er")
    // non-equi ON
    val e1 = intercept[Exception](spark.sql(
      "MERGE INTO t_er USING s_er ON t_er.id < s_er.id " +
        "WHEN MATCHED THEN DELETE"))
    assert(e1.getMessage.contains("equi-key"), e1.getMessage)
    // UPDATE declared before DELETE
    val e2 = intercept[Exception](spark.sql("""
      MERGE INTO t_er USING s_er ON t_er.id = s_er.id
      WHEN MATCHED AND t_er.v > 5 THEN UPDATE SET v = s_er.v
      WHEN MATCHED THEN DELETE"""))
    assert(e2.getMessage.contains("declared before"), e2.getMessage)
    // DML against a pinned time-travel view
    spark.read.format("graftlog").option("versionAsOf", 0).load(path)
      .createOrReplaceTempView("t_pin")
    val e3 = intercept[Exception](
      spark.sql("DELETE FROM t_pin WHERE id = 1"))
    assert(e3.getMessage.contains("time-travel"), e3.getMessage)
    // a plain parquet temp view still gets Spark's own v2-only error,
    // not a graft rewrite
    spark.range(5).toDF("id").createOrReplaceTempView("plain_tv")
    intercept[Exception](spark.sql("DELETE FROM plain_tv WHERE id = 1"))
  }

  test("MERGE with no UPDATE clause carries matched rows UNCHANGED") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_nou")
    // source overlaps ids 0..4 with DIFFERENT v values + inserts 900..901
    Seq.tabulate(5)(i => (i.toLong, 7777L, "src"))
      .++(Seq((900L, 1L, "new"), (901L, 2L, "new")))
      .toDF("id", "v", "k").createOrReplaceTempView("s_nou")
    // insert-only merge: matched rows must NOT take source values
    spark.sql("""
      MERGE INTO t_nou USING s_nou ON t_nou.id = s_nou.id
      WHEN NOT MATCHED THEN INSERT *
    """)
    assert(spark.sql("SELECT count(*) FROM t_nou WHERE v = 7777")
      .head().getLong(0) == 0L,
      "matched rows overwritten by an insert-only MERGE")
    assert(spark.sql("SELECT v FROM t_nou WHERE id = 3").head()
      .getLong(0) == 30L)
    assert(spark.sql("SELECT count(*) FROM t_nou").head().getLong(0) == 302)
    // conditional-delete-only merge: non-qualifying matches carry
    spark.sql("""
      MERGE INTO t_nou USING s_nou ON t_nou.id = s_nou.id
      WHEN MATCHED AND s_nou.k = 'new' THEN DELETE
    """)
    assert(spark.sql("SELECT count(*) FROM t_nou").head().getLong(0) == 300)
    assert(spark.sql("SELECT v FROM t_nou WHERE id = 2").head()
      .getLong(0) == 20L, "non-deleted matches must carry unchanged")
    spark.catalog.dropTempView("t_nou")
    spark.catalog.dropTempView("s_nou")
  }

  test("DELETE/UPDATE with a subquery in the condition fails loudly") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_sub")
    spark.range(5).toDF("id").createOrReplaceTempView("s_sub")
    val e1 = intercept[Exception](spark.sql(
      "DELETE FROM t_sub WHERE id IN (SELECT id FROM s_sub)"))
    assert(e1.getMessage.contains("subqueries"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      "UPDATE t_sub SET v = 0 WHERE EXISTS " +
        "(SELECT 1 FROM s_sub WHERE s_sub.id = t_sub.id)"))
    assert(e2.getMessage.contains("subqueries"), e2.getMessage)
    // nothing committed by either refusal
    assert(spark.sql("SELECT count(*) FROM t_sub").head().getLong(0) == 300)
    spark.catalog.dropTempView("t_sub")
    spark.catalog.dropTempView("s_sub")
  }

  test("persistent catalog table (CREATE TABLE USING graftlog): survives to a new session, INSERT and row-level DML by name, time travel via OPTIONS") {
    val path = freshTable()
    spark.sql("DROP TABLE IF EXISTS graft_cat_t")
    spark.sql("DROP TABLE IF EXISTS graft_cat_t0")
    spark.sql(s"CREATE TABLE graft_cat_t USING graftlog " +
      s"OPTIONS (path '$path')")
    assert(spark.table("graft_cat_t").count() == 300)

    // a NEW session (fresh session state, shared catalog — the
    // restart-equivalent): the table resolves by NAME, reads, and
    // accepts INSERT routed to the ACID commit path
    val s2 = spark.newSession()
    assert(s2.table("graft_cat_t").count() == 300)
    val v0 = TxLogTable.currentVersion(path)
    s2.sql("INSERT INTO graft_cat_t VALUES (9001, 1, 'ins'), (9002, 2, 'ins')")
    assert(TxLogTable.currentVersion(path) == v0 + 1,
      "INSERT by catalog name must land as one ACID commit")
    assert(TxLogTable.read(spark, path).count() == 302)

    // row-level SQL DML resolves through the catalog name too
    spark.sql("DELETE FROM graft_cat_t WHERE k = 'ins'")
    assert(TxLogTable.read(spark, path).count() == 300)
    spark.sql("UPDATE graft_cat_t SET v = 1 WHERE id = 0")
    assert(TxLogTable.read(spark, path).filter($"id" === 0L)
      .select("v").as[Long].head() == 1L)

    // time travel pins through OPTIONS
    spark.sql(s"CREATE TABLE graft_cat_t0 USING graftlog " +
      s"OPTIONS (path '$path', versionAsOf '0')")
    assert(spark.table("graft_cat_t0").count() == 100,
      "the pinned catalog table must read version 0's snapshot")
    spark.sql("DROP TABLE graft_cat_t")
    spark.sql("DROP TABLE graft_cat_t0")
  }

  test("SQL DELETE/UPDATE keep recorded sizes+schema in the new commit (planning stays O(1) after DML)") {
    val path = freshTable()
    spark.read.format("graftlog").load(path).createOrReplaceTempView("t_sz")
    spark.sql("DELETE FROM t_sz WHERE id = 7")
    spark.sql("UPDATE t_sz SET v = 0 WHERE id = 8")
    val v = TxLogTable.currentVersion(path)
    val (fs2, sizes) = TxLogTable.snapshotWithSizes(path, v)
    assert(sizes.keySet == fs2.toSet,
      "every file of the post-DML snapshot has a recorded size")
    assert(TxLogTable.schemaAt(path, v).exists(
      _.fieldNames.toSeq == Seq("id", "v", "k")))
  }
}
