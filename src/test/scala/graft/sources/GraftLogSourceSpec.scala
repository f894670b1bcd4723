package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.TxLogTable
import org.apache.spark.sql.functions._

class GraftLogSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-dsrc").toString

  test("format(\"graftlog\"): head read, versionAsOf and timestampAsOf time travel") {
    val path = tmp
    TxLogTable.append(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)      // v0
    TxLogTable.deleteWhere(spark, path, col("id") === 1L)   // v1
    TxLogTable.append(spark, Seq((3L, "c")).toDF("id", "v"), path) // v2

    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("id").as[Long].collect().toSet
    assert(ids(spark.read.format("graftlog").load(path)) == Set(2L, 3L),
      "head read must match the current snapshot")
    assert(ids(spark.read.format("graftlog")
      .option("versionAsOf", 0).load(path)) == Set(1L, 2L),
      "versionAsOf must time-travel through the delete")
    val ts1 = TxLogTable.history(path).find(_._1 == 1L).get._2
    assert(ids(spark.read.format("graftlog")
      .option("timestampAsOf", ts1).load(path)) == Set(2L),
      "timestampAsOf must resolve to v1")
    intercept[IllegalArgumentException] {
      spark.read.format("graftlog").option("versionAsOf", 0)
        .option("timestampAsOf", ts1).load(path)
    }
  }

  test("SQL surface: CREATE TEMPORARY VIEW … USING graftlog") {
    val path = tmp
    TxLogTable.append(spark,
      Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("id", "x"), path)
    spark.sql(s"""CREATE OR REPLACE TEMPORARY VIEW graft_t
      USING graftlog OPTIONS (path '$path')""")
    val got = spark.sql("SELECT id, x FROM graft_t WHERE x > 15.0 ORDER BY id")
      .as[(Long, Double)].collect().toSeq
    assert(got == Seq((2L, 20.0), (3L, 30.0)))
  }

  test("filters push into the scan and results stay exact (advisory pruning)") {
    val path = tmp
    // three single-file commits with disjoint id ranges → provable
    // stats exclusion for a range predicate
    Seq(0L until 100L, 100L until 200L, 200L until 300L).foreach { r =>
      TxLogTable.append(spark,
        r.map(i => (i, i * 2L)).toDF("id", "x").repartition(1), path)
    }
    val df = spark.read.format("graftlog").load(path)
      .filter(col("id") >= 150L && col("id") < 160L)
      .select("id")
    // Catalyst must hand the predicate to buildScan (PushedFilters on
    // the V1 scan node) — that is what reaches the log-level skipping
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,150)"),
      s"filter must reach the relation scan:\n$plan")
    assert(df.as[Long].collect().toSet == (150L until 160L).toSet)
    // column pruning: the scan node's output carries only what's asked
    val scanOut = df.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(scanOut == Seq("id"), s"pruned scan output: $scanOut")
    // exactness when the predicate is untranslatable for pruning:
    // Spark still applies it to every surviving row
    val odd = spark.read.format("graftlog").load(path)
      .filter(col("id") % 7L === 0L)
    assert(odd.count() == (0L until 300L).count(_ % 7 == 0))
  }

  test("the connector scan is Spark's vectorized FileSourceScan; log-level skipping prunes the physical listing") {
    val path = tmp
    Seq(0L until 100L, 100L until 200L, 200L until 300L).foreach { r =>
      TxLogTable.append(spark,
        r.map(i => (i, i * 2L)).toDF("id", "x").repartition(1), path)
    }
    val df = spark.read.format("graftlog").load(path)
      .filter(col("id") >= 150L && col("id") < 160L)
      .select("id")
    val scans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1,
      "the graftlog read must plan as Spark's own FileSourceScanExec " +
        s"(vectorized parquet), got:\n${df.queryExecution.executedPlan}")
    assert(scans.head.supportsColumnar,
      "the connector scan must be columnar (vectorized parquet reader)")
    // execute THIS plan (a derived Dataset would execute a clone whose
    // metrics stay zero), then read its metrics
    assert(df.collect().map(_.getLong(0)).toSet == (150L until 160L).toSet)
    // the log-level stats skipping pruned the LISTING itself: of the
    // three disjoint-range files, exactly one reached the scan
    assert(scans.head.metrics("numFiles").value == 1,
      s"log-level skipping must prune the listing to 1 file, " +
        s"scanned ${scans.head.metrics("numFiles").value}")
  }

  test("connector reads hive-partitioned tables: values recover, partition pruning reaches the listing, NULL partition round-trips") {
    val path = tmp
    Seq((1L, "us", 10.0), (2L, "eu", 20.0), (3L, "us", 30.0),
      (4L, null.asInstanceOf[String], 40.0))
      .toDF("id", "region", "amount")
      .write.format("graftlog").option("partitionBy", "region").save(path)
    val df = spark.read.format("graftlog").load(path)
    assert(df.select("id", "region", "amount")
      .as[(Long, String, Double)].collect().toSet
      == Set((1L, "us", 10.0), (2L, "eu", 20.0), (3L, "us", 30.0),
        (4L, null, 40.0)),
      "partition values (incl. NULL) must round-trip through the index")
    val us = df.filter(col("region") === "us").select("id")
    assert(us.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val scan = us.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head
    // exact partition pruning: only region=us files scan — the eu AND
    // the NULL-partition dirs are both excluded (the bound-predicate
    // evaluation prunes what a min/max interval model cannot)
    val usFiles = TxLogTable.snapshotFiles(path, 0L)
      .count(_.contains("region=us"))
    assert(scan.metrics("numFiles").value == usFiles,
      s"partition pruning must reach the physical listing, scanned " +
        s"${scan.metrics("numFiles").value} of expected $usFiles file(s)")
    // IS NULL finds the default-partition rows
    assert(df.filter(col("region").isNull).select("id")
      .as[Long].collect().toSet == Set(4L))
  }

  test("a LIVE partitioned view fails loudly when a later commit changes the partition layout") {
    val path = tmp
    Seq((1L, "us", 10.0)).toDF("id", "region", "amount")
      .write.format("graftlog").option("partitionBy", "region").save(path)
    val df = spark.read.format("graftlog").load(path) // head = LIVE
    assert(df.count() == 1)
    // partition evolution AFTER view creation: region moves in-file —
    // reading it as a path constant would silently null it
    TxLogTable.append(spark,
      Seq((2L, "eu", 20.0)).toDF("id", "region", "amount"), path)
    val e = intercept[Exception] { df.count() }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: chain(t.getCause)
    assert(chain(e).exists(m =>
        m != null && m.contains("partition layout")),
      s"layout drift must fail loudly, got: $e")
    // a recreated view takes the exact row fallback
    assert(spark.read.format("graftlog").load(path)
      .select("id", "region").as[(Long, String)].collect().toSet
      == Set((1L, "us"), (2L, "eu")))
  }

  test("mixed hive-partition layouts fall back to the row relation and stay exact") {
    val path = tmp
    Seq((1L, "us", 10.0)).toDF("id", "region", "amount")
      .write.format("graftlog").option("partitionBy", "region").save(path)
    // partition evolution: the second commit carries region IN-FILE
    TxLogTable.append(spark,
      Seq((2L, "eu", 20.0)).toDF("id", "region", "amount"), path)
    val df = spark.read.format("graftlog").load(path)
    val fileScans = df.queryExecution.executedPlan.collectLeaves().collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(fileScans.isEmpty,
      "a mixed-layout snapshot must take the row-relation fallback " +
        "(one HadoopFsRelation cannot declare both layouts)")
    assert(df.select("id", "region", "amount")
      .as[(Long, String, Double)].collect().toSet
      == Set((1L, "us", 10.0), (2L, "eu", 20.0)))
  }

  test("write side: SaveModes map onto ACID commits; partitionBy option; constraints hold") {
    val path = tmp
    def w(df: org.apache.spark.sql.DataFrame,
        mode: String): Unit =
      df.write.format("graftlog").mode(mode).save(path)
    w(Seq((1L, "a")).toDF("id", "v"), "append")                 // v0
    w(Seq((2L, "b")).toDF("id", "v"), "append")                 // v1
    assert(TxLogTable.currentVersion(path) == 1L,
      "each append is one ACID commit")
    intercept[IllegalStateException] {
      w(Seq((3L, "c")).toDF("id", "v"), "error")
    }
    w(Seq((9L, "z")).toDF("id", "v"), "ignore") // table exists: no-op
    assert(TxLogTable.currentVersion(path) == 1L)
    w(Seq((3L, "c")).toDF("id", "v"), "overwrite")              // v2 rebase
    assert(spark.read.format("graftlog").load(path)
      .select("id").as[Long].collect().toSet == Set(3L))
    // history intact through the overwrite (it's a rebase, not a wipe)
    assert(spark.read.format("graftlog").option("versionAsOf", 1)
      .load(path).select("id").as[Long].collect().toSet == Set(1L, 2L))
    // CHECK constraints gate connector writes like any other commit
    TxLogTable.addCheckConstraint(spark, path, "id_pos", "id > 0")
    intercept[IllegalStateException] {
      w(Seq((-1L, "bad")).toDF("id", "v"), "append")
    }
    // hive partitioning via option (DataFrameWriter.partitionBy is not
    // forwarded to V1 sources)
    val p2 = tmp
    Seq((1L, "x", 1.0), (2L, "y", 2.0)).toDF("id", "grp", "amount")
      .write.format("graftlog").option("partitionBy", "grp")
      .mode("append").save(p2)
    val (kept, skipped) = TxLogTable.prunedFiles(spark, p2, col("grp") === "x")
    assert(kept.nonEmpty && kept.forall(_.contains("grp=x")) &&
      skipped.forall(!_.contains("grp=x")),
      s"connector write must produce a partition-pruned layout: $kept")
  }

  test("streaming source: per-commit change feed, exactly-once across a restart") {
    val path = tmp
    val ckpt = Files.createTempDirectory("graft-dsrc-ckpt").toString
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amount"),
      path) // v0
    val got =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    def start() = spark.readStream.format("graftlog").load(path)
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("id"), col("_change_type"), col("_commit_version"))
          .collect()
          .foreach(r => got.add((r.getLong(0), r.getString(1), r.getLong(2))))
        ()
      }
      .start()

    val q = start()
    q.processAllAvailable()
    assert(got.toArray.toSet == Set((1L, "insert", 0L), (2L, "insert", 0L)),
      s"first batch must deliver the initial snapshot: $got")

    // DML while the stream runs: the delete's old image arrives tagged
    TxLogTable.deleteWhere(spark, path, col("id") === 1L)            // v1
    TxLogTable.append(spark,
      Seq((3L, "c", 30.0)).toDF("id", "grp", "amount"), path)        // v2
    q.processAllAvailable()
    assert(got.toArray.toSet == Set(
      (1L, "insert", 0L), (2L, "insert", 0L),
      (1L, "delete", 1L), (3L, "insert", 2L)), s"live feed: $got")
    q.stop()

    // restart from the checkpoint: ONLY commits after it arrive —
    // nothing from v0..v2 replays
    got.clear()
    TxLogTable.upsertByKey(spark, path,
      Seq((2L, "b", 25.0)).toDF("id", "grp", "amount"), Seq("id"))   // v3
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(got.toArray.toSet == Set(
      (2L, "delete", 3L), (2L, "insert", 3L)),
      s"restart must resume at the checkpointed version: $got")
  }

  test("streaming source: startingVersion skips history; empty table refuses") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, 1.0)).toDF("id", "x"), path)   // v0
    TxLogTable.append(spark, Seq((2L, 2.0)).toDF("id", "x"), path)   // v1
    TxLogTable.append(spark, Seq((3L, 3.0)).toDF("id", "x"), path)   // v2
    val ckpt = Files.createTempDirectory("graft-dsrc-ckpt2").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val q = spark.readStream.format("graftlog")
      .option("startingVersion", 2).load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select(col("id"), col("_commit_version")).collect()
          .foreach(r => got.add((r.getLong(0), r.getLong(1))))
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(got.toArray.toSet == Set((3L, 2L)),
      s"startingVersion=2 must skip v0/v1: $got")
    intercept[Exception] {
      spark.readStream.format("graftlog").load(tmp) // no commits
        .writeStream.format("noop")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-dsrc-ckpt3").toString)
        .start()
    }
  }

  test("maxBytesPerTrigger: drain batches respect the byte budget (±1 commit); union equals the unthrottled feed; restart resumes exactly") {
    val path = tmp
    // 20 commits of ~equal size; budget ~ 3 commits' bytes
    for (i <- 0 until 20)
      TxLogTable.append(spark,
        (0 until 50).map(j => (i * 100L + j, s"row$i-$j")).toDF("id", "s")
          .repartition(1), path)
    val perCommit = (0 until 20)
      .map(v => TxLogTable.commitBytes(path, v))
    assert(perCommit.forall(_ > 0), "appends must be size-priced")
    val budget = perCommit.take(3).sum + perCommit.head / 2
    val expect = TxLogTable.changesPerVersion(spark, path, -1L, 19L)
      .select(col("id"), col("_commit_version")).as[(Long, Long)]
      .collect().toSet

    val ckpt = Files.createTempDirectory("graft-dsrc-bytes").toString
    val batches = new scala.collection.concurrent.TrieMap[Long,
      Set[(Long, Long)]]()
    def start() = spark.readStream.format("graftlog")
      .option("maxBytesPerTrigger", budget.toString).load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches(id) = b.select(col("id"), col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        ()
      }.start()
    // stop mid-drain, then restart: the union must still be exact
    val q = start()
    val deadline = System.currentTimeMillis + 60000
    while (batches.isEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(25)
    q.stop()
    assert(batches.nonEmpty, "no batch arrived within 60s")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(batches.values.flatten.toSet == expect,
      "drained union must equal the unthrottled feed exactly")
    // every batch's admitted commits price within budget ±1 commit
    // (the last admitted version may overshoot by less than itself)
    batches.values.foreach { rows =>
      val vs = rows.map(_._2)
      val bytes = vs.toSeq.map(v => perCommit(v.toInt)).sum
      assert(bytes <= budget + perCommit.max,
        s"batch covering $vs priced $bytes > budget $budget + one commit")
    }
    assert(batches.size >= 4,
      s"20 commits under a ~3.5-commit budget need >= 4 batches, " +
        s"got ${batches.size}")
  }

  test("maxVersionsPerTrigger: a 50-commit history drains in bounded batches; mid-drain restart resumes exactly") {
    val path = tmp
    for (i <- 0 until 50)
      TxLogTable.append(spark, Seq((i.toLong, i.toString)).toDF("id", "s"),
        path)
    val expect = TxLogTable.changesPerVersion(spark, path, -1L, 49L)
      .select(col("id"), col("_commit_version")).as[(Long, Long)]
      .collect().toSet
    assert(expect.size == 50)

    val ckpt = Files.createTempDirectory("graft-dsrc-ckpt4").toString
    // an idempotent sink keyed by batchId: a replayed batch overwrites
    // its own slot, so the union below is the exactly-once contract
    val batches = new scala.collection.concurrent.TrieMap[Long,
      Set[(Long, Long)]]()
    def start() = spark.readStream.format("graftlog")
      .option("maxVersionsPerTrigger", 10).load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches(id) = b.select(col("id"), col("_commit_version"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        ()
      }.start()

    // stop as soon as the first batch lands — almost always mid-drain
    val q = start()
    val deadline = System.currentTimeMillis + 60000
    while (batches.isEmpty && System.currentTimeMillis < deadline)
      Thread.sleep(25)
    q.stop()
    assert(batches.nonEmpty, "no batch arrived within 60s")

    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val union = batches.values.flatten.toSet
    assert(union == expect,
      s"drained union must equal the unthrottled feed exactly — " +
        s"missing ${expect -- union}, extra ${union -- expect}")
    assert(batches.size >= 5,
      s"50 commits at maxVersionsPerTrigger=10 need >= 5 batches, " +
        s"got ${batches.size}")
    batches.foreach { case (id, rows) =>
      assert(rows.map(_._2).size <= 10,
        s"batch $id covers ${rows.map(_._2).size} commits > 10")
    }
  }

  test("streaming source: a mid-stream widened schema fails loudly; restart picks it up") {
    val path = tmp
    val ckpt = Files.createTempDirectory("graft-dsrc-ckpt5").toString
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "s"), path) // v0
    val cols = new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
    val ids = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def start() = spark.readStream.format("graftlog").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        cols.add(b.columns.toSeq)
        b.select(col("id")).collect().foreach(r => ids.add(r.getLong(0)))
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    assert(ids.toArray.toSet == Set(1L))
    // the table gains a column mid-stream: silently projecting it away
    // would lose data — the batch must fail loudly instead
    TxLogTable.overwrite(spark,
      Seq((2L, "b", 9.9)).toDF("id", "s", "extra"), path) // v1
    val err = intercept[Exception] { q.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("widened schema")),
      s"expected the widened-schema error, got: ${messages(err)}")
    q.stop()
    // restart from the SAME checkpoint: the failed range replays under
    // the new pinned schema — the extra column arrives, nothing lost
    cols.clear(); ids.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(cols.toArray.forall(_.asInstanceOf[Seq[String]].contains("extra")),
      s"restart must pick up the widened schema: $cols")
    assert(ids.toArray.toSet == Set(1L, 2L),
      s"the replayed range must deliver the overwrite's rows: $ids")
  }

  test("SQL surface: INSERT INTO a graftlog view is one ACID commit; pinned views refuse; constraint abort stages nothing") {
    val path = tmp
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "s"), path) // v0
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW glv " +
      s"USING graftlog OPTIONS (path '$path')")
    spark.sql("INSERT INTO glv SELECT CAST(2 AS BIGINT), 'b'")     // v1
    assert(TxLogTable.currentVersion(path) == 1L,
      "the insert must land as exactly one commit")
    // the LIVE view sees its own insert without re-creation
    assert(spark.sql("SELECT id FROM glv").as[Long].collect().toSet
      == Set(1L, 2L))
    // time travel still sees the pre-insert version
    assert(spark.read.format("graftlog").option("versionAsOf", 0)
      .load(path).select("id").as[Long].collect().toSet == Set(1L))
    // a constraint abort commits nothing and advances nothing
    TxLogTable.addCheckConstraint(spark, path, "pos_id", "id > 0")
    intercept[Exception] {
      spark.sql("INSERT INTO glv SELECT CAST(-5 AS BIGINT), 'x'")
    }
    assert(TxLogTable.currentVersion(path) == 1L,
      "an aborted insert must not advance the version")
    assert(spark.sql("SELECT id FROM glv").as[Long].collect().toSet
      == Set(1L, 2L))
    // INSERT OVERWRITE routes to the atomic rebase commit
    spark.sql("INSERT OVERWRITE glv SELECT CAST(9 AS BIGINT), 'z'") // v2
    assert(spark.sql("SELECT id FROM glv").as[Long].collect().toSet
      == Set(9L))
    assert(spark.read.format("graftlog").option("versionAsOf", 1)
      .load(path).select("id").as[Long].collect().toSet == Set(1L, 2L),
      "overwrite must keep history time-travelable")
    // a time-travel view is read-only
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW glv0 " +
      s"USING graftlog OPTIONS (path '$path', versionAsOf '0')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO glv0 SELECT CAST(7 AS BIGINT), 'q'")
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("time-travel")),
      s"expected the time-travel refusal, got: ${messages(e)}")
  }

  test("missing path and empty tables fail loudly") {
    intercept[IllegalArgumentException] {
      spark.read.format("graftlog").load()
    }
    val path = tmp // exists but has no committed version
    intercept[IllegalArgumentException] {
      spark.read.format("graftlog").load(path)
    }
  }

  test("streaming sink: one ACID commit per batch, partitionBy, exactly-once across a restart") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp
    val ckpt = Files.createTempDirectory("graft-dsink-ckpt").toString
    val in = MemoryStream[(Long, String, Double)]
    def start() = in.toDF().toDF("id", "grp", "amount")
      .writeStream.format("graftlog")
      .partitionBy("grp")
      .option("checkpointLocation", ckpt)
      .start(path)

    in.addData((1L, "a", 10.0), (2L, "b", 20.0))
    val q = start()
    q.processAllAvailable()
    in.addData((3L, "a", 30.0))
    q.processAllAvailable()
    q.stop()
    assert(TxLogTable.currentVersion(path) == 1L,
      "two non-empty triggers = two ACID commits")
    assert(TxLogTable.snapshotFiles(path, 1L).forall(_.contains("grp=")),
      "writeStream.partitionBy must reach the hive layout")
    assert(spark.read.format("graftlog").load(path)
      .select("id", "amount").as[(Long, Double)].collect().toSet
      == Set((1L, 10.0), (2L, 20.0), (3L, 30.0)))

    // restart from the checkpoint: only NEW data lands, no replay
    in.addData((4L, "b", 40.0))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.format("graftlog").load(path)
      .select("id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L, 4L),
      "restart must deliver each row exactly once")
  }

  test("streaming sink: a replayed batchId commits nothing (txn fast path)") {
    val path = tmp
    val sink = new GraftLogStreamSink(spark.sqlContext, path,
      Seq.empty, complete = false)
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", "spec-q1")
    try {
      sink.addBatch(0L, Seq((1L, 1.0)).toDF("id", "amount"))
      assert(TxLogTable.currentVersion(path) == 0L)
      // crash-between-commit-and-checkpoint: the engine re-delivers
      // batch 0 — the SetTransaction fast path must commit NOTHING
      sink.addBatch(0L, Seq((1L, 1.0)).toDF("id", "amount"))
      assert(TxLogTable.currentVersion(path) == 0L,
        "replayed batch must not commit")
      assert(TxLogTable.read(spark, path).count() == 1L)
      sink.addBatch(1L, Seq((2L, 2.0)).toDF("id", "amount"))
      assert(TxLogTable.currentVersion(path) == 1L)
      // a DIFFERENT query's batch 0 is not a replay of ours
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", "spec-q2")
      sink.addBatch(0L, Seq((3L, 3.0)).toDF("id", "amount"))
      assert(TxLogTable.read(spark, path).count() == 3L,
        "idempotency is scoped per queryId, not global")
    } finally
      spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
  }

  test("streaming sink: Complete mode overwrites per trigger and stays time-travelable; Update refuses") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val path = tmp
    val ckpt = Files.createTempDirectory("graft-dsink-cmp").toString
    val in = MemoryStream[String]
    val agg = in.toDF().toDF("grp").groupBy("grp")
      .agg(count(lit(1)).as("n"))
    in.addData("a", "b", "a")
    val q = agg.writeStream.format("graftlog").outputMode("complete")
      .option("checkpointLocation", ckpt).start(path)
    q.processAllAvailable()
    in.addData("b")
    q.processAllAvailable()
    q.stop()
    assert(spark.read.format("graftlog").load(path)
      .as[(String, Long)].collect().toSet == Set(("a", 2L), ("b", 2L)),
      "the table IS the query's current state")
    // every trigger's state stays in the history (rebase commits)
    val v0 = spark.read.format("graftlog").option("versionAsOf", 0L)
      .load(path).as[(String, Long)].collect().toSet
    assert(v0 == Set(("a", 2L), ("b", 1L)),
      s"the first trigger's state must time-travel: $v0")
    val e = intercept[Exception] {
      in.toDF().toDF("grp").writeStream.format("graftlog")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("graft-dsink-upd").toString)
        .start(tmp)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("Append and Complete")),
      s"Update mode must refuse loudly: ${messages(e)}")
  }

  test("ACID-to-ACID streaming pipeline: readStream graftlog -> transform -> writeStream graftlog, exactly-once end to end") {
    val src = tmp
    val dst = tmp
    val ckpt = Files.createTempDirectory("graft-a2a-ckpt").toString
    TxLogTable.append(spark,
      Seq((1L, 10.0), (2L, 200.0)).toDF("id", "amount"), src) // v0
    def start() = spark.readStream.format("graftlog").load(src)
      .filter(col("_change_type") === "insert" && col("amount") > 50.0)
      .select(col("id"), col("amount"), col("_commit_version").as("src_v"))
      .writeStream.format("graftlog")
      .option("checkpointLocation", ckpt)
      .start(dst)
    val q = start()
    q.processAllAvailable()
    TxLogTable.append(spark,
      Seq((3L, 60.0), (4L, 5.0)).toDF("id", "amount"), src)   // v1
    q.processAllAvailable()
    q.stop()
    // restart: nothing replays into the destination
    TxLogTable.append(spark, Seq((5L, 70.0)).toDF("id", "amount"), src) // v2
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(spark.read.format("graftlog").load(dst)
      .select("id", "src_v").as[(Long, Long)].collect().toSet
      == Set((2L, 0L), (3L, 1L), (5L, 2L)),
      "table-to-table pipeline must deliver each qualifying change " +
        "exactly once across restarts")
  }
}
