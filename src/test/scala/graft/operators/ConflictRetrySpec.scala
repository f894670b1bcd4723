package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Logical conflict detection for rebase commits
  * ([[TxLogTable.commitRebaseRetry]]) — the delta world's
  * ConcurrentAppend rules in place of the round-16 blanket
  * "anything committed → abort". Interleavings are DETERMINISTIC via
  * the path-keyed pre-commit test hook (a thread race would be
  * timing-dependent): the hook fires exactly once, immediately before
  * the rebase commit's first publish attempt — i.e. after the rewrite
  * staged from its pinned snapshot, the worst-case window. */
class ConflictRetrySpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-conflict").toString

  private def hook(path: String)(body: => Unit): Unit =
    TxLogTable.testPreCommitHooks.put(
      new org.apache.hadoop.fs.Path(path).toString, () => body)

  test("compact survives a concurrent append: BOTH commit, appended rows intact") {
    val path = tmp
    (1 to 4).foreach(i => TxLogTable.append(spark,
      Seq((i.toLong, s"v$i")).toDF("id", "v"), path))
    val v0 = TxLogTable.currentVersion(path)
    // the append lands between compact's snapshot read and its publish
    hook(path) {
      TxLogTable.append(spark, Seq((100L, "raced")).toDF("id", "v"), path)
    }
    val cv = TxLogTable.compact(spark, path, targetFiles = 1)
    // the appended commit won v0+1; the compact retried and took v0+2
    assert(cv == v0 + 2, s"compact must commit AFTER the append, got $cv")
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 5)
    assert(head.filter(col("id") === 100).count() == 1,
      "the raced append's row must survive the compaction")
    // the raced append's file carried into the rebase listing BY REFERENCE
    val appended = TxLogTable.filesAt(path, v0 + 1)
      .diff(TxLogTable.filesAt(path, v0))
    assert(appended.nonEmpty)
    val atHead = TxLogTable.filesAt(path, cv)
    assert(appended.forall(atHead.contains),
      "the interleaved append's files must carry into the compact listing")
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === cv).select("operation")
      .head().getString(0) == "compact")
  }

  test("compact still aborts on a concurrent listing-replacing commit") {
    val path = tmp
    (1 to 3).foreach(i => TxLogTable.append(spark,
      Seq((i.toLong, s"v$i")).toDF("id", "v"), path))
    hook(path) { TxLogTable.deleteWhere(spark, path, col("id") === 2L) }
    intercept[java.util.ConcurrentModificationException] {
      TxLogTable.compact(spark, path, targetFiles = 1)
    }
    // the table is undamaged and the interleaved delete stands
    assert(TxLogTable.read(spark, path).count() == 2)
    // the aborted compact's staged dir was reaped (nothing orphaned
    // beyond what the log references)
    val referenced = TxLogTable.allVersions(path)
      .flatMap(v => TxLogTable.filesAt(path, v))
      .map(_.split('/').head).toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-"))
      .map(_.getName).toSet
    assert(onDisk.subsetOf(referenced),
      s"aborted compact left orphan dirs: ${onDisk.diff(referenced)}")
  }

  test("dv delete survives a stats-disjoint concurrent append; an overlapping one aborts") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 50L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), path)
    TxLogTable.append(spark,
      (51L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), path)
    // disjoint: the raced append's ids sit far above the delete range
    hook(path) {
      TxLogTable.append(spark,
        (1000L to 1009L).map(i => (i, s"n$i")).toDF("id", "v")
          .repartition(1), path)
    }
    val dv = TxLogTable.deleteWhereDv(spark, path, col("id") <= 10L)
    assert(dv == 3, s"dv delete must retry past the append, got $dv")
    assert(TxLogTable.read(spark, path).count() == 100 - 10 + 10)
    assert(TxLogTable.deletionVectors(path, dv).values.map(_._2).sum == 10)

    // overlapping: the appended file's id range intersects the predicate
    hook(path) {
      TxLogTable.append(spark,
        Seq((11L, "overlap")).toDF("id", "v"), path)
    }
    intercept[java.util.ConcurrentModificationException] {
      TxLogTable.deleteWhereDv(spark, path, col("id") <= 12L)
    }
    // abort is clean: the raced append committed, no masks recorded
    // beyond the first delete's, and no orphan dv dirs remain
    val head = TxLogTable.currentVersion(path)
    assert(TxLogTable.deletionVectors(path, head).values.map(_._2).sum == 10)
    val liveDvDirs = TxLogTable.allVersions(path)
      .flatMap(v => TxLogTable.deletionVectors(path, v).values.map(_._1))
      .toSet
    val onDisk = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("data-dvs-"))
      .map(_.getName).toSet
    assert(onDisk == liveDvDirs,
      s"aborted dv delete left orphan dv dirs: ${onDisk.diff(liveDvDirs)}")
  }

  test("30 interleaved commits: appends and dv deletes on disjoint key ranges never abort each other") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), path)
    var expected = 100L
    (1 to 15).foreach { i =>
      // each dv delete is raced by one append in a far-away key range
      hook(path) {
        TxLogTable.append(spark,
          (i * 1000L to i * 1000L + 9L).map(j => (j, s"n$j"))
            .toDF("id", "v").repartition(1), path)
      }
      val v = TxLogTable.deleteWhereDv(spark, path,
        col("id") === (i * 2L)) // one row per delete, ids 2..30
      assert(v >= 0, s"delete $i must commit")
      expected += 10 - 1
    }
    assert(TxLogTable.currentVersion(path) == 30,
      "15 appends + 15 dv deletes = 30 commits, none aborted")
    assert(TxLogTable.read(spark, path).count() == expected)
    assert(TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path)).values.map(_._2).sum == 15)
  }

  test("scoped compact: OPTIMIZE WHERE rewrites only in-scope files, the rest carry by reference") {
    val path = tmp
    // 4 small files per partition key
    (1 to 4).foreach { i =>
      TxLogTable.append(spark,
        Seq(("a", i.toLong), ("b", i.toLong + 100)).toDF("p", "id"),
        path, partitionBy = Seq("p"))
    }
    val v0 = TxLogTable.currentVersion(path)
    val before = TxLogTable.filesAt(path, v0)
    val aFiles = before.filter(_.contains("p=a"))
    val bFiles = before.filter(_.contains("p=b"))
    assert(aFiles.size == 4 && bFiles.size == 4)
    val cv = TxLogTable.compact(spark, path, targetFiles = 1,
      where = Some(col("p") === "a"))
    val after = TxLogTable.filesAt(path, cv)
    // every out-of-scope file carries BY REFERENCE (identical names)
    assert(bFiles.forall(after.contains),
      "p=b files must carry by reference through a p=a-scoped compact")
    // the in-scope files all rewrote into the compacted dir
    assert(after.count(_.contains("p=a")) < aFiles.size)
    assert(aFiles.forall(f => !after.contains(f)))
    // rows unchanged, partition column recovered
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 8)
    assert(head.filter(col("p") === "a").count() == 4)
  }

  test("small-files-only compact: minFileMB leaves already-compacted files in place") {
    val path = tmp
    // one big file (~> 1 MB of parquet) + three tiny ones
    val big = spark.range(0, 200000)
      .select(col("id"),
        sha2(concat(col("id").cast("string"), lit("pad")), 256).as("v"))
    TxLogTable.append(spark, big.repartition(1), path)
    (1 to 3).foreach(i => TxLogTable.append(spark,
      Seq((1000000L + i, s"small$i")).toDF("id", "v"), path))
    val v0 = TxLogTable.currentVersion(path)
    val before = TxLogTable.filesAt(path, v0)
    val (_, sizes) = TxLogTable.snapshotWithSizes(path, v0)
    val bigFiles = before.filter(f => sizes(f) >= 1024 * 1024)
    assert(bigFiles.nonEmpty, "fixture needs a >=1MB file")
    val cv = TxLogTable.compact(spark, path, targetFiles = 1, minFileMB = 1)
    val after = TxLogTable.filesAt(path, cv)
    assert(bigFiles.forall(after.contains),
      "files at or over minFileMB must carry by reference")
    assert(after.size == bigFiles.size + 1,
      "the under-target files must bin-pack into one")
    assert(TxLogTable.read(spark, path).count() == 200000 + 3)
    // nothing under target → -1, no commit, no log churn
    assert(TxLogTable.compact(spark, path, targetFiles = 1,
      minFileMB = 1) == -1L)
    assert(TxLogTable.currentVersion(path) == cv)
  }

  test("merge survives a key-range-disjoint concurrent append") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 20L).map(i => (i, i * 10.0)).toDF("k", "x").repartition(1),
      path)
    hook(path) {
      TxLogTable.append(spark,
        (500L to 509L).map(i => (i, i * 1.0)).toDF("k", "x")
          .repartition(1), path)
    }
    val v = TxLogTable.upsertByKey(spark, path,
      Seq((1L, -1.0), (21L, -21.0)).toDF("k", "x"), Seq("k"))
    assert(v == 2, s"upsert must retry past the append, got $v")
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 20 + 10 + 1)
    assert(head.filter(col("k") === 1L).select("x").head().getDouble(0)
      == -1.0)
    assert(head.filter(col("k") === 505L).count() == 1,
      "the raced append's rows must survive the upsert")
  }

  test("compactIncremental: one durable commit per partition-aligned bin, big files untouched") {
    val path = tmp
    // 3 small files in each of two partitions + one >=1MB file in p=c
    (1 to 3).foreach { i =>
      TxLogTable.append(spark,
        Seq(("a", i.toLong), ("b", i + 100L)).toDF("p", "id"),
        path, partitionBy = Seq("p"))
    }
    val big = spark.range(0, 120000).select(lit("c").as("p"), col("id"))
      .select(col("p"),
        (col("id") + 1000L).as("id"),
        sha2(concat(col("id").cast("string"), lit("pad")), 256).as("fill"))
    // align schemas: the small files lack `fill`; widen via a plain
    // append (schema merges on read)
    TxLogTable.append(spark, big.repartition(1), path,
      partitionBy = Seq("p"))
    val v0 = TxLogTable.currentVersion(path)
    val before = TxLogTable.filesAt(path, v0)
    val (_, sizes) = TxLogTable.snapshotWithSizes(path, v0)
    val bigFiles = before.filter(f => sizes(f) >= 1024 * 1024)
    assert(bigFiles.nonEmpty, "fixture needs a >=1MB file")
    val vs = TxLogTable.compactIncremental(spark, path, minFileMB = 1)
    // one commit per partition bin (p=a and p=b; p=c's file is big)
    assert(vs.size == 2, s"expected 2 bin commits, got $vs")
    assert(vs == vs.sorted && vs.last == TxLogTable.currentVersion(path))
    val ops = TxLogTable.historyDf(spark, path)
      .filter(col("operation") === "compact").count()
    assert(ops == 2)
    val after = TxLogTable.filesAt(path, vs.last)
    assert(bigFiles.forall(after.contains),
      "over-target files must carry by reference")
    assert(after.count(_.contains("p=a")) == 1 &&
      after.count(_.contains("p=b")) == 1,
      s"each small-file partition must bin-pack to one file: $after")
    // every intermediate bin commit is durable and readable
    vs.foreach(v => assert(
      TxLogTable.readVersion(spark, path, v).count() == 6L + 120000L))
    // rows and partition recovery unchanged
    val head = TxLogTable.read(spark, path)
    assert(head.filter(col("p") === "a").count() == 3)
    assert(head.filter(col("p") === "c").count() == 120000)
    // idempotent: nothing under target remains grouped into a >=2 bin
    assert(TxLogTable.compactIncremental(spark, path, minFileMB = 1).isEmpty)
  }

  test("table property routes plain SQL OPTIMIZE to bin-packed incremental compaction") {
    val path = tmp
    (1 to 4).foreach(i => TxLogTable.append(spark,
      Seq(("a", i.toLong), ("b", i + 100L)).toDF("p", "id"),
      path, partitionBy = Seq("p")))
    TxLogTable.setTableProperty(path, "graft.optimize.minFileMB", "1")
    val v = spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0)
    // two partition bins → two commits; the returned version is the last
    assert(v == TxLogTable.currentVersion(path))
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("operation") === "compact").count() == 2)
    assert(TxLogTable.read(spark, path).count() == 8)
    // converged: a second plain OPTIMIZE finds nothing under target
    assert(spark.sql(s"OPTIMIZE graftlog.`$path`").head().getLong(0) == -1L)
    // explicit ZORDER keeps the single-commit semantics despite the prop
    val zv = spark.sql(s"OPTIMIZE graftlog.`$path` ZORDER BY (id)")
      .head().getLong(0)
    assert(zv == TxLogTable.currentVersion(path))
    assert(TxLogTable.read(spark, path).count() == 8)
  }

  test("threaded stress: a REAL concurrent appender during compact loses no rows") {
    val path = tmp
    TxLogTable.append(spark,
      spark.range(0, 100000).select(col("id"),
        (col("id") % 97).as("v")), path)
    (1 to 3).foreach(i => TxLogTable.append(spark,
      Seq((200000L + i, i.toLong)).toDF("id", "v"), path))
    // a real thread appends while the compact stages + publishes — the
    // timing is genuinely racy; whatever interleaving happens, the
    // invariants must hold: compact commits (retrying past appends),
    // no appended row is lost, every version stays readable
    val appended = new java.util.concurrent.atomic.AtomicInteger(0)
    val appender = new Thread(() => {
      (1 to 4).foreach { i =>
        TxLogTable.append(spark,
          Seq((300000L + i, i.toLong)).toDF("id", "v"), path)
        appended.incrementAndGet()
        Thread.sleep(60)
      }
    })
    appender.start()
    Thread.sleep(30) // let the first append overlap the compact window
    val cv = TxLogTable.compact(spark, path, targetFiles = 2)
    appender.join()
    assert(cv >= 0)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("operation") === "compact").count() == 1)
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 100000L + 3 + appended.get(),
      "no committed row may be lost across the race")
    assert(head.filter(col("id") >= 300000L).count() == appended.get())
    // every version (pre-, mid-, post-race) still resolves and reads
    TxLogTable.allVersions(path).foreach { v =>
      assert(TxLogTable.readVersion(spark, path, v).count() > 0)
    }
  }

  test("purge survives any concurrent append (layout-only rewrite)") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 30L).map(i => (i, s"v$i")).toDF("id", "v").repartition(1), path)
    TxLogTable.deleteWhereDv(spark, path, col("id") <= 5L)
    hook(path) {
      TxLogTable.append(spark, Seq((2L, "same-range-append"))
        .toDF("id", "v"), path) // even an in-range append is compatible
    }
    val v = TxLogTable.purgeDeletes(spark, path)
    assert(v == 3, s"purge must retry past the append, got $v")
    assert(TxLogTable.deletionVectors(path, v).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 25 + 1)
  }

  test("a streaming appender never aborts ALTER TABLE ADD COLUMNS: 30 interleaved commits") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    var appended = 0
    (1 to 15).foreach { i =>
      // worst case every round: the append lands between the DDL's
      // snapshot read and its publish
      hook(path) {
        TxLogTable.append(spark,
          Seq((100L + i, s"raced$i")).toDF("id", "v"), path)
        appended += 1
      }
      val v = TxLogTable.addColumns(spark, path, Seq(
        org.apache.spark.sql.types.StructField(s"extra$i",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
      assert(v == TxLogTable.currentVersion(path))
    }
    assert(appended == 15)
    val head = TxLogTable.read(spark, path)
    // every widen landed AND every raced append's row survived
    assert((1 to 15).forall(i => head.columns.contains(s"extra$i")))
    assert(head.count() == 10 + 15)
    assert(head.filter(col("id") >= 100L).count() == 15)
  }

  test("metadata DDL still aborts on a concurrent DML rebase") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    hook(path) { TxLogTable.deleteWhere(spark, path, col("id") === 3L) }
    intercept[java.util.ConcurrentModificationException] {
      TxLogTable.addColumns(spark, path, Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType, nullable = true)))
    }
    // the DML stands; the table is unwidened and intact
    assert(TxLogTable.read(spark, path).count() == 9)
    assert(!TxLogTable.read(spark, path).columns.contains("x"))
  }

  test("renameColumn survives a plain concurrent append; a WIDENING one aborts") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), path)
    hook(path) {
      TxLogTable.append(spark, Seq((50L, "raced")).toDF("id", "v"), path)
    }
    val v = TxLogTable.renameColumn(spark, path, "v", "val")
    assert(v == 2L, s"rename must retry past the append, got $v")
    val head = TxLogTable.read(spark, path)
    assert(head.columns.toSeq == Seq("id", "val"))
    assert(head.count() == 11, "the raced append's row must survive")
    // a WIDENING interleaved append would be hidden behind the rename's
    // pinned mapping recording — it must abort, not silently narrow.
    // (Only the FIRST rename can race a widening append: once mapping
    // is on, stage itself refuses unknown columns.)
    val path2 = tmp
    TxLogTable.append(spark,
      (1L to 5L).map(i => (i, s"v$i")).toDF("id", "v"), path2)
    hook(path2) {
      TxLogTable.append(spark,
        Seq((60L, "w", 1.5)).toDF("id", "v", "extra"), path2)
    }
    intercept[java.util.ConcurrentModificationException] {
      TxLogTable.renameColumn(spark, path2, "v", "val")
    }
    assert(TxLogTable.read(spark, path2).columns.contains("extra"),
      "the widening append must stand; the rename must be the loser")
  }

  test("restore survives a concurrent append: the raced rows ride on top of the restored listing") {
    val path = tmp
    TxLogTable.append(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v"), path) // v0
    TxLogTable.deleteWhere(spark, path, col("id") <= 5L) // v1
    hook(path) {
      TxLogTable.append(spark, Seq((99L, "raced")).toDF("id", "v"), path)
    }
    val v = TxLogTable.restore(spark, path, 0L)
    assert(v == 3L, s"restore must retry past the append, got $v")
    val head = TxLogTable.read(spark, path)
    assert(head.count() == 11,
      "restored v0 rows plus the raced append's row")
    assert(head.filter(col("id") === 99L).count() == 1)
    assert(head.filter(col("id") <= 5L).count() == 5,
      "the deleted rows are back (that IS the restore)")
  }
}
