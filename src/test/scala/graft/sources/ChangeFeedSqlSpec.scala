package graft.sources

import graft.SparkSpec
import graft.operators.TxLogTable
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Round-17 change-feed + operational-SQL surface: the `table_changes`
  * TVF (parse-time rewrite over the batch readChangeFeed relation),
  * timestamp anchors on the stream source and the batch feed
  * (`startingTimestamp` / `endingTimestamp`), `OPTIMIZE … WHERE`, the
  * parse-time graft probe (non-graft targets fall through to Spark's
  * own parse error), and the RESTORE date-only literal. */
class ChangeFeedSqlSpec extends SparkSpec {
  import spark.implicits._

  private def threeCommits(): String = {
    val path = Files.createTempDirectory("graft-cfsql").toString
    (0 until 3).foreach { b =>
      TxLogTable.append(spark,
        Seq((b * 10L, s"b$b")).toDF("id", "v").repartition(1), path)
    }
    path
  }

  test("table_changes TVF ≡ readChangeFeed row-for-row; timestamp bounds resolve") {
    val path = threeCommits()
    TxLogTable.deleteWhere(spark, path, col("id") === 10L) // v3
    val tvf = spark.sql(
      s"SELECT * FROM table_changes('graftlog.`$path`', 1, 3)")
    val opt = spark.read.format("graftlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", 1).option("endingVersion", 3)
      .load(path)
    assert(tvf.columns.toSeq == opt.columns.toSeq)
    assert(tvf.exceptAll(opt).isEmpty && opt.exceptAll(tvf).isEmpty,
      "TVF must equal the readChangeFeed option row-for-row")
    assert(tvf.filter(col("_change_type") === "delete").count() == 1)
    // end defaults to the head
    assert(spark.sql(
      s"SELECT count(*) FROM table_changes('graftlog.`$path`', 0)")
      .head().getLong(0) == 3 + 1) // 3 inserts + 1 delete image
    // timestamp bounds: everything at-or-after commit 2's wall clock
    // (a STRING literal — a bare number is a version, Delta's contract)
    val ts2 = TxLogTable.history(path).toMap.apply(2L)
    val fromTs = spark.sql(
      s"SELECT * FROM table_changes('graftlog.`$path`', '$ts2')")
    assert(fromTs.select("_commit_version").as[Long].collect().toSet
      == Set(2L, 3L))
    // a view name resolves too
    spark.read.format("graftlog").load(path)
      .createOrReplaceTempView("cf_view")
    assert(spark.sql("SELECT * FROM table_changes('cf_view', 0, 1)")
      .count() == 2)
    spark.catalog.dropTempView("cf_view")
    // an unknown TVF still raises Spark's own error
    intercept[Exception] {
      spark.sql("SELECT * FROM table_changes_nope('x', 0)")
    }
  }

  test("batch readChangeFeed accepts startingTimestamp/endingTimestamp") {
    val path = threeCommits()
    val h = TxLogTable.history(path).toMap
    val feed = spark.read.format("graftlog")
      .option("readChangeFeed", "true")
      .option("startingTimestamp", h(1L).toString)
      .option("endingTimestamp", h(2L).toString)
      .load(path)
    assert(feed.select("_commit_version").as[Long].collect().toSet
      == Set(1L, 2L))
    intercept[Exception] {
      spark.read.format("graftlog")
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .option("startingTimestamp", h(1L).toString)
        .load(path)
    }
  }

  test("stream startingTimestamp resolves to the earliest at-or-after version") {
    val path = threeCommits()
    val ckpt = Files.createTempDirectory("graft-cfsql-ckpt").toString
    val ts1 = TxLogTable.history(path).toMap.apply(1L)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val q = spark.readStream.format("graftlog")
      .option("startingTimestamp", ts1.toString)
      .load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("_commit_version")).as[Long].collect()
          .foreach(got.add)
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(got.toArray.map(_.asInstanceOf[Long]).toSet == Set(1L, 2L),
      s"stream from ts(v1) must deliver commits 1..2 only, got $got")
  }

  test("OPTIMIZE ... WHERE compacts only the in-scope partition via SQL") {
    val path = Files.createTempDirectory("graft-optwhere").toString
    (1 to 3).foreach { i =>
      TxLogTable.append(spark,
        Seq(("a", i.toLong), ("b", i + 100L)).toDF("p", "id"),
        path, partitionBy = Seq("p"))
    }
    val before = TxLogTable.filesAt(path, 2)
    val bFiles = before.filter(_.contains("p=b"))
    val v = spark.sql(
      s"OPTIMIZE graftlog.`$path` WHERE p = 'a'").head().getLong(0)
    assert(v == 3L)
    val after = TxLogTable.filesAt(path, 3)
    assert(bFiles.forall(after.contains),
      "out-of-scope partition must carry by reference")
    assert(after.count(_.contains("p=a")) == 1)
    assert(TxLogTable.read(spark, path).count() == 6)
    // WHERE + ZORDER BY compose
    val v2 = spark.sql(
      s"OPTIMIZE graftlog.`$path` WHERE p = 'b' ZORDER BY (id)")
      .head().getLong(0)
    assert(v2 == 4L)
    assert(TxLogTable.read(spark, path).count() == 6)
  }

  test("operational statements on non-graft targets fall through to Spark's parse error") {
    val pq = Files.createTempDirectory("graft-plainpq").toString + "/t"
    Seq((1, "a")).toDF("id", "v").write.parquet(pq)
    spark.sql("DROP TABLE IF EXISTS plain_pq")
    spark.sql(s"CREATE TABLE plain_pq USING parquet LOCATION '$pq'")
    // stock Spark has no grammar for these — the error must be SPARK'S
    // (a ParseException, or for DESC HISTORY the analysis error of the
    // DESCRIBE-COLUMN shape Spark parses it as), never the graft
    // run-time "not a graftlog catalog table" refusal
    Seq(s"VACUUM plain_pq", s"OPTIMIZE plain_pq",
        s"RESTORE plain_pq TO VERSION AS OF 0",
        s"DESCRIBE HISTORY plain_pq",
        s"REORG TABLE plain_pq APPLY (PURGE)").foreach { stmt =>
      val err = intercept[Exception] { spark.sql(stmt) }
      assert((err.isInstanceOf[
          org.apache.spark.sql.catalyst.parser.ParseException] ||
          err.isInstanceOf[org.apache.spark.sql.AnalysisException]) &&
        !err.getMessage.toLowerCase.contains("graftlog"),
        s"'$stmt' must fall through to Spark's own error, got: " +
          err.getMessage.take(120))
    }
    spark.sql("DROP TABLE plain_pq")
  }

  test("RESTORE TO TIMESTAMP accepts a date-only literal") {
    val path = threeCommits()
    // all commits happened today, so restoring to tomorrow's date picks
    // the head — the point is the literal PARSES (date-only used to
    // throw DateTimeParseException while SELECT time travel accepted it)
    val tomorrow = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
      .plusDays(1).toString
    val v = spark.sql(
      s"RESTORE graftlog.`$path` TO TIMESTAMP AS OF '$tomorrow'")
      .head().getLong(0)
    assert(v == 3L)
    assert(TxLogTable.read(spark, path).count() == 3)
  }
}
