package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Merge-on-read DELETE via deletion vectors ([[TxLogTable.deleteWhereDv]])
  * — the log-table analogue of the delta protocol's deletion-vector
  * table feature: a delete records (file, row_index) masks instead of
  * rewriting files; reads subtract them with a metadata-lineage
  * anti-join; purge/compact fold them back into rewrites. */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-dv").toString

  private def seed(path: String): Unit = {
    // three commits → three data dirs of ONE file each (deterministic
    // file↔id-range mapping the assertions lean on), ids 0..29
    (0 until 3).foreach { b =>
      TxLogTable.append(spark,
        (b * 10 until (b + 1) * 10).map(i => (i.toLong, s"r$i", i % 3))
          .toDF("id", "v", "grp").repartition(1), path)
    }
  }

  private def dataDirs(path: String): Set[String] =
    TxLogTable.filesAt(path, TxLogTable.currentVersion(path))
      .map(_.split('/').head).toSet

  test("dv delete: rows vanish, file listing unchanged, O(deleted) sidecar") {
    val path = tmp
    seed(path)
    val before = TxLogTable.filesAt(path, 2)
    val v = TxLogTable.deleteWhereDv(spark, path, col("id") % 10 === 3)
    assert(v == 3)
    // SAME data files — the whole point: no copy-on-write rewrite
    // (the rebase entry normalizes order; identity is the set)
    assert(TxLogTable.filesAt(path, 3).toSet == before.toSet)
    val dvs = TxLogTable.deletionVectors(path, 3)
    assert(dvs.nonEmpty && dvs.values.map(_._2).sum == 3L)
    // reads mask exactly the matching rows
    val ids = TxLogTable.read(spark, path).select("id")
      .as[Long].collect().toSet
    assert(ids == (0L until 30L).toSet -- Set(3L, 13L, 23L))
    // time travel BEFORE the dv commit still reads everything
    assert(TxLogTable.readVersion(spark, path, 2).count() == 30)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "dvdelete")
  }

  test("dv delete ≡ copy-on-write delete (same predicate, twin tables)") {
    val p1 = tmp; val p2 = tmp
    seed(p1); seed(p2)
    TxLogTable.deleteWhereDv(spark, p1, col("grp") === 1 && col("id") < 20)
    TxLogTable.deleteWhere(spark, p2, col("grp") === 1 && col("id") < 20)
    val a = TxLogTable.read(spark, p1).orderBy("id").collect().toSeq
    val b = TxLogTable.read(spark, p2).orderBy("id").collect().toSeq
    assert(a == b)
    // NULL predicate rows survive on both paths (SQL DELETE semantics)
    val p3 = tmp
    TxLogTable.append(spark,
      Seq((1L, "a", Some(1)), (2L, "b", None), (3L, "c", Some(2)))
        .toDF("id", "v", "grp"), p3)
    TxLogTable.deleteWhereDv(spark, p3, col("grp") === 1)
    assert(TxLogTable.read(spark, p3).select("id").as[Long]
      .collect().toSet == Set(2L, 3L))
  }

  test("second dv delete on the same file unions the masks") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 5)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 7)
    val dvs = TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path))
    // both masked rows live in data dir of commit 0 → ONE dv entry
    // (pointer replaced, union carried), total n = 2
    assert(dvs.size == 1 && dvs.values.head._2 == 2L)
    val ids = TxLogTable.read(spark, path).select("id")
      .as[Long].collect().toSet
    assert(ids == (0L until 30L).toSet -- Set(5L, 7L))
    // intermediate version still reads only its own mask
    assert(TxLogTable.readVersion(spark, path, 3).select("id").as[Long]
      .collect().toSet == (0L until 30L).toSet - 5L)
  }

  test("dv delete already-masked rows: re-deleting matches nothing") {
    val path = tmp
    seed(path)
    assert(TxLogTable.deleteWhereDv(spark, path, col("id") === 5) == 3)
    // the masked row is invisible to the probe → no commit
    assert(TxLogTable.deleteWhereDv(spark, path, col("id") === 5) == -1L)
  }

  test("later DML reads through dvs and clears them for rewritten files") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id").isin(5L, 15L, 25L))
    // COW update touches only the file holding id=6 (commit-0 dir);
    // its dv folds into the rewrite, other files' dvs carry
    TxLogTable.updateWhere(spark, path,
      Map("v" -> lit("upd")), col("id") === 6)
    val dvs = TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path))
    assert(dvs.values.map(_._2).sum == 2L) // id=5's mask folded away
    val rows = TxLogTable.read(spark, path)
    assert(rows.count() == 27) // 30 - 3 masked (5,15,25), none resurrected
    assert(rows.filter(col("id") === 6).select("v").head().getString(0)
      == "upd")
    assert(rows.filter(col("id").isin(5L, 15L, 25L)).isEmpty)
    // merge through the dv view: upsert id=15 back is an INSERT
    // (the masked row does not match)
    TxLogTable.upsertByKey(spark, path,
      Seq((15L, "back", 0)).toDF("id", "v", "grp"), Seq("id"))
    val after = TxLogTable.read(spark, path)
    assert(after.filter(col("id") === 15).count() == 1)
    assert(after.filter(col("id") === 15).select("v").head().getString(0)
      == "back")
  }

  test("purgeDeletes rewrites ONLY masked files; dv map empties") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 12)
    val before = TxLogTable.filesAt(path, 3)
    val masked = TxLogTable.deletionVectors(path, 3).keySet
    val v = TxLogTable.purgeDeletes(spark, path)
    assert(v == 4)
    val after = TxLogTable.filesAt(path, 4)
    // unmasked files carried by reference; masked files replaced
    assert(before.filterNot(masked).forall(after.contains))
    assert(masked.forall(f => !after.contains(f)))
    assert(TxLogTable.deletionVectors(path, 4).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 29)
    // purge with no dvs is a no-op
    assert(TxLogTable.purgeDeletes(spark, path) == -1L)
    // pre-purge dv version still time-travels
    assert(TxLogTable.readVersion(spark, path, 3).count() == 29)
    assert(TxLogTable.readVersion(spark, path, 2).count() == 30)
  }

  test("compact folds dvs; restore re-points dv state both ways") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") < 3) // v3
    TxLogTable.compact(spark, path, targetFiles = 2) // v4: dv-free
    assert(TxLogTable.deletionVectors(path, 4).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 27)
    // restore to the dv'd version: dv map comes back with the listing
    TxLogTable.restore(spark, path, 3) // v5
    assert(TxLogTable.deletionVectors(path, 5).nonEmpty)
    assert(TxLogTable.read(spark, path).count() == 27)
    // restore to the pre-dv version: masked rows resurrect (that IS
    // time travel)
    TxLogTable.restore(spark, path, 2) // v6
    assert(TxLogTable.deletionVectors(path, 6).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 30)
  }

  test("change feed reports dv-masked rows as deletes (batch + per-version)") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id").isin(4L, 14L))
    val feed = TxLogTable.changesBetween(spark, path, 2, 3)
    val changes = feed.select("_change_type", "id")
      .as[(String, Long)].collect().toSet
    assert(changes == Set(("delete", 4L), ("delete", 14L)))
    // per-version feed (the streaming source's shape) sees the same
    val pv = TxLogTable.changesPerVersion(spark, path, 2, 3)
      .select("_change_type", "id").as[(String, Long)].collect().toSet
    assert(pv == Set(("delete", 4L), ("delete", 14L)))
  }

  test("vacuum keeps live dv dirs; vacuumCompacted reaps superseded ones") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 1) // v3 → dv A
    TxLogTable.deleteWhereDv(spark, path, col("id") === 2) // v4 → dv B (A∪new)
    val dvDirs = Seq(3L, 4L)
      .flatMap(v => TxLogTable.deletionVectors(path, v).values.map(_._1))
      .distinct
    assert(dvDirs.size == 2)
    // stray-staging vacuum never touches them (referenced by versions)
    TxLogTable.vacuum(path, graceMs = 0L)
    dvDirs.foreach(d => assert(Files.exists(Paths.get(path, d))))
    // purge, then drop history before the purge: BOTH dv dirs reap
    val vPurge = TxLogTable.purgeDeletes(spark, path)
    val reaped = TxLogTable.vacuumCompacted(path, vPurge)
    dvDirs.foreach(d => assert(reaped.contains(d)))
    assert(TxLogTable.read(spark, path).count() == 28)
  }

  test("SQL reads over dv'd graftlog views and catalog tables apply the masks") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") >= 25)
    // temp view over the vectorized relation: the GraftDmlResolution
    // read rewrite must kick in (the raw index would throw)
    spark.read.format("graftlog").load(path).createOrReplaceTempView("dv_t")
    assert(spark.sql("SELECT count(*) FROM dv_t").head().getLong(0) == 25L)
    assert(spark.sql("SELECT max(id) FROM dv_t").head().getLong(0) == 24L)
    // filters still reach the rewritten scan (correctness under pushdown)
    assert(spark.sql("SELECT count(*) FROM dv_t WHERE grp = 0")
      .head().getLong(0) ==
      (0 until 25).count(_ % 3 == 0).toLong)
    // SQL DELETE on the same view: DML target detection sees through
    // the dv-rewrite wrapper and routes to the live head
    spark.sql("DELETE FROM dv_t WHERE id = 0")
    // the dv-rewritten VIEW is snapshot-pinned at its creation version
    // (scan and dv view must agree — documented semantics), so it
    // still serves 25; a fresh load sees the delete
    assert(spark.sql("SELECT count(*) FROM dv_t").head().getLong(0) == 25L)
    assert(spark.read.format("graftlog").load(path).count() == 24L)
    assert(TxLogTable.read(spark, path).count() == 24L)
    spark.catalog.dropTempView("dv_t")
  }

  test("raw FileIndex listing of a dv'd snapshot fails loudly without approval") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id") === 9)
    val idx = new graft.sources.GraftLogFileIndex(spark, path, None,
      org.apache.spark.sql.types.StructType(Nil))
    val e = intercept[IllegalStateException](idx.listFiles(Nil, Nil))
    assert(e.getMessage.contains("deletion vectors"))
    // the approved twin lists fine (the rewrite's inner scan)
    val ok = new graft.sources.GraftLogFileIndex(spark, path,
      Some(TxLogTable.currentVersion(path)),
      org.apache.spark.sql.types.StructType(Nil), dvApproved = true)
    assert(ok.listFiles(Nil, Nil).nonEmpty)
  }

  test("dv delete is SetTransaction-idempotent and disables the delta mirror") {
    val path = tmp
    seed(path)
    assert(Files.exists(Paths.get(path, "_delta_log"))) // mirror live
    val v = TxLogTable.deleteWhereDv(spark, path, col("id") === 8,
      txn = Some(("dv-app", 1L)))
    assert(v == 3)
    // replay: the txn fast path returns the committed head, no new commit
    assert(TxLogTable.deleteWhereDv(spark, path, col("id") === 8,
      txn = Some(("dv-app", 1L))) == 3)
    assert(TxLogTable.currentVersion(path) == 3)
    // the mirror is gone + marker explains why; later commits stay
    // native-only
    assert(!Files.exists(Paths.get(path, "_delta_log")))
    assert(Files.exists(Paths.get(path, "_delta_log_disabled")))
    TxLogTable.append(spark, Seq((99L, "x", 0)).toDF("id", "v", "grp"), path)
    assert(!Files.exists(Paths.get(path, "_delta_log")))
  }

  test("dv state survives a log checkpoint boundary") {
    val path = tmp
    seed(path) // v0..v2
    TxLogTable.deleteWhereDv(spark, path, col("id") === 11) // v3
    // push past the checkpoint interval (10) with appends
    (0 until 8).foreach { i =>
      TxLogTable.append(spark,
        Seq((100L + i, s"x$i", 0)).toDF("id", "v", "grp"), path)
    } // v4..v11, checkpoint at v10
    assert(Files.exists(Paths.get(path, "_log", "10.checkpoint.json")))
    // the checkpoint carried the dv map: reads resolve from it alone
    assert(TxLogTable.deletionVectors(path, 11).values.map(_._2).sum == 1L)
    assert(TxLogTable.read(spark, path).filter(col("id") === 11).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 29 + 8)
  }

  test("table property routes SQL DELETE to the dv path (Delta's enableDeletionVectors)") {
    val path = tmp
    seed(path)
    assert(TxLogTable.tableProperties(path).isEmpty)
    TxLogTable.setTableProperty(path, TxLogTable.PropEnableDv, "true")
    spark.read.format("graftlog").load(path).createOrReplaceTempView("dvp_t")
    val before = TxLogTable.filesAt(path, 2)
    spark.sql("DELETE FROM dvp_t WHERE id = 4")
    // the SQL statement committed a MASK, not a rewrite
    assert(TxLogTable.filesAt(path, 3).toSet == before.toSet)
    assert(TxLogTable.deletionVectors(path, 3).values.map(_._2).sum == 1L)
    assert(TxLogTable.read(spark, path).count() == 29)
    // property off → the same statement takes copy-on-write
    TxLogTable.unsetTableProperty(path, TxLogTable.PropEnableDv)
    spark.sql("DELETE FROM dvp_t WHERE id = 6")
    val at4 = TxLogTable.filesAt(path, 4)
    assert(at4.toSet != before.toSet) // one file rewrote
    assert(TxLogTable.read(spark, path).count() == 28)
    spark.catalog.dropTempView("dvp_t")
  }

  test("tableDetail reports the dv posture; vacuumRetain keys the closure by wall clock") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id").isin(2L, 12L))
    val d = TxLogTable.tableDetail(spark, path).head()
    assert(d.getAs[Long]("version") == 3L)
    assert(d.getAs[Long]("num_files") == 3L)
    assert(d.getAs[Long]("dv_masked_files") == 2L)
    assert(d.getAs[Long]("dv_masked_rows") == 2L)
    assert(d.getAs[String]("op_counts") == "append=3,dvdelete=1")
    assert(d.getAs[Long]("size_bytes") > 0L)
    // wall-clock retention: everything is newer than a day → nothing reaps
    assert(TxLogTable.vacuumRetain(path, 24L * 3600 * 1000).isEmpty)
    // zero retention keeps only dirs the HEAD references: purge then
    // retain-nothing reaps the superseded dv dir
    TxLogTable.purgeDeletes(spark, path)
    val reaped = TxLogTable.vacuumRetain(path, 0L)
    assert(reaped.exists(_.startsWith("data-dvs-")))
    assert(TxLogTable.read(spark, path).count() == 28)
  }

  test("a graftlog stream sees dv-masked rows as row-level deletes") {
    val path = tmp
    seed(path)
    val out = Files.createTempDirectory("graft-dv-sink").toString
    val ckpt = Files.createTempDirectory("graft-dv-ckpt").toString
    TxLogTable.deleteWhereDv(spark, path, col("id") === 17)
    val q = spark.readStream.format("graftlog").load(path)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val feed = spark.read.parquet(out)
    // three appends stream as inserts; the dv commit streams its one
    // masked row as a delete — same contract as a COW delete
    assert(feed.filter(col("_change_type") === "insert").count() == 30)
    val dels = feed.filter(col("_change_type") === "delete")
      .select("id").as[Long].collect().toSeq
    assert(dels == Seq(17L))
  }

  test("reads split clean vs masked: one anti-join over only the masked file") {
    val path = tmp
    seed(path) // 3 single-file commits
    TxLogTable.deleteWhereDv(spark, path, col("id") === 5) // masks 1 file
    // engine read: exactly ONE anti-join; the clean files union in as
    // plain scans (a wide table with one masked file reads at full
    // speed everywhere except that file)
    val df = TxLogTable.read(spark, path)
    val plan = df.queryExecution.executedPlan.toString
    assert("LeftAnti".r.findAllIn(plan).size == 1, s"plan:\n$plan")
    assert(df.count() == 29)
    // masked-side leg scans exactly one data file
    assert(plan.contains("InMemoryFileIndex(1 paths)"), s"plan:\n$plan")
    // connector/SQL read rewrite: same split (clean relation ∪ masked
    // anti-join), same single anti-join
    val sdf = spark.read.format("graftlog").load(path)
    val splan = sdf.queryExecution.executedPlan.toString
    assert("LeftAnti".r.findAllIn(splan).size == 1, s"plan:\n$splan")
    assert(sdf.count() == 29)
    sdf.createOrReplaceTempView("dv_split_t")
    assert(spark.sql("SELECT sum(id) FROM dv_split_t").head().getLong(0)
      == (0L until 30L).sum - 5L)
    spark.catalog.dropTempView("dv_split_t")
  }

  test("dv delete on a hive-partitioned table masks within the right partition") {
    val path = tmp
    TxLogTable.append(spark,
      (0 until 20).map(i => (i.toLong, s"r$i", s"p${i % 2}"))
        .toDF("id", "v", "part"),
      path, partitionBy = Seq("part"))
    TxLogTable.deleteWhereDv(spark, path,
      col("part") === "p1" && col("id") < 10)
    val rows = TxLogTable.read(spark, path)
    assert(rows.count() == 15)
    assert(rows.filter(col("part") === "p1").select("id").as[Long]
      .collect().toSet == Set(11L, 13L, 15L, 17L, 19L))
    assert(rows.filter(col("part") === "p0").count() == 10)
  }

  test("dv update: listing grows APPEND-ONLY — masks + new images, no rewrite") {
    val path = tmp
    seed(path)
    val before = TxLogTable.filesAt(path, 2)
    val v = TxLogTable.updateWhereDv(spark, path,
      Map("v" -> concat(lit("u"), col("id"))), col("id") % 10 === 3)
    assert(v == 3)
    val after = TxLogTable.filesAt(path, 3)
    // the dv-update contract: every pre-update file carries BY
    // REFERENCE (no rewrite, no removal); the only listing change is
    // the appended image files
    assert(before.toSet.subsetOf(after.toSet),
      "dv update must not remove or rewrite any existing file")
    assert((after.toSet -- before.toSet).nonEmpty,
      "dv update appends the new-image files")
    // O(updated rows) masks — exactly the 3 matched old images
    assert(TxLogTable.deletionVectors(path, 3).values.map(_._2).sum == 3L)
    val t = TxLogTable.read(spark, path)
    assert(t.count() == 30)
    assert(t.filter(col("id") % 10 === 3).select("v").as[String]
      .collect().toSet == Set("u3", "u13", "u23"))
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "dvupdate")
  }

  test("dv update ≡ copy-on-write update; NULL-predicate rows untouched") {
    val p1 = tmp; val p2 = tmp
    seed(p1); seed(p2)
    val set = Map("v" -> concat(col("v"), lit("!")),
      "grp" -> (col("grp") + 10))
    val pred = col("id") >= 5 && col("id") < 25
    TxLogTable.updateWhereDv(spark, p1, set, pred)
    TxLogTable.updateWhere(spark, p2, set, pred)
    assert(TxLogTable.read(spark, p1).orderBy("id").collect().toSeq ==
      TxLogTable.read(spark, p2).orderBy("id").collect().toSeq)
    // a NULL predicate value neither updates nor masks (SQL semantics)
    val p3 = tmp
    TxLogTable.append(spark,
      Seq((1L, "a", Some(1)), (2L, "b", None), (3L, "c", Some(2)))
        .toDF("id", "v", "grp"), p3)
    TxLogTable.updateWhereDv(spark, p3, Map("v" -> lit("X")),
      col("grp") === 1)
    assert(TxLogTable.read(spark, p3).filter(col("v") === "X")
      .select("id").as[Long].collect().toSeq == Seq(1L))
    assert(TxLogTable.read(spark, p3).count() == 3)
  }

  test("dv merge masks only clause-affected rows and appends images + inserts") {
    val p1 = tmp; val p2 = tmp
    seed(p1); seed(p2)
    val src = Seq.tabulate(12)(i => (i.toLong, s"s$i", 99))
      .++(Seq((40L, "n40", 7), (41L, "n41", 7)))
      .toDF("id", "v", "grp")
    def run(p: String, dv: Boolean): Long =
      TxLogTable.mergeByKey(spark, p, src, Seq("id"),
        whenMatchedUpdateIf = Some("s.id >= 8"),
        whenMatchedDeleteIf = Some("s.id < 4"),
        useDv = dv)
    val before = TxLogTable.filesAt(p1, 2)
    run(p1, dv = true); run(p2, dv = false)
    // identical table contents on both paths
    assert(TxLogTable.read(spark, p1).orderBy("id").collect().toSeq ==
      TxLogTable.read(spark, p2).orderBy("id").collect().toSeq)
    // dv side: append-only listing; masks = 4 deletes + 4 updates;
    // matched rows satisfying NEITHER clause (ids 4..7) stay untouched
    // bytes — no mask, no image
    val after = TxLogTable.filesAt(p1, 3)
    assert(before.toSet.subsetOf(after.toSet))
    assert(TxLogTable.deletionVectors(p1, 3).values.map(_._2).sum == 8L)
    val t = TxLogTable.read(spark, p1)
    assert(t.count() == 30 - 4 + 2)
    assert(t.filter(col("id").isin(8L, 9L, 10L, 11L))
      .select("v").as[String].collect().toSet ==
      Set("s8", "s9", "s10", "s11"))
    assert(t.filter(col("id").isin(4L, 5L, 6L, 7L))
      .select("v").as[String].collect().toSet ==
      Set("r4", "r5", "r6", "r7"))
    assert(TxLogTable.historyDf(spark, p1)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "dvmerge")
  }

  test("dv merge with nothing masked commits a plain append-shaped merge") {
    val path = tmp
    seed(path)
    // source matches nothing: pure insert under useDv — no dv sidecar,
    // no mirror disable, op stays 'merge'
    val src = Seq((50L, "n50", 1), (51L, "n51", 2)).toDF("id", "v", "grp")
    val v = TxLogTable.mergeByKey(spark, path, src, Seq("id"),
      useDv = true)
    assert(v == 3)
    assert(TxLogTable.deletionVectors(path, 3).isEmpty)
    assert(TxLogTable.read(spark, path).count() == 32)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === 3).select("operation").head().getString(0)
      == "merge")
  }

  test("change feed reports a dv update as old-image delete + new-image insert") {
    val path = tmp
    seed(path)
    TxLogTable.updateWhereDv(spark, path, Map("v" -> lit("upd")),
      col("id") === 7)
    val ch = TxLogTable.changesBetween(spark, path, 2, 3)
    val del = ch.filter(col("_change_type") === "delete")
      .select("id", "v").collect().toSeq
    val ins = ch.filter(col("_change_type") === "insert")
      .select("id", "v").collect().toSeq
    assert(del.map(r => (r.getLong(0), r.getString(1))) == Seq((7L, "r7")))
    assert(ins.map(r => (r.getLong(0), r.getString(1))) == Seq((7L, "upd")))
  }

  test("table property routes SQL UPDATE and MERGE to the dv paths") {
    val path = tmp
    seed(path)
    TxLogTable.setTableProperty(path, TxLogTable.PropEnableDv, "true")
    spark.read.format("graftlog").load(path).createOrReplaceTempView("dvum_t")
    val before = TxLogTable.filesAt(path,
      TxLogTable.currentVersion(path))
    spark.sql("UPDATE dvum_t SET v = 'sqlu' WHERE id = 9")
    val v1 = TxLogTable.currentVersion(path)
    assert(before.toSet.subsetOf(TxLogTable.filesAt(path, v1).toSet),
      "SQL UPDATE under the property must be merge-on-read")
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === v1).select("operation").head()
      .getString(0) == "dvupdate")
    // a dv-rewritten view pins at its creation snapshot — reads of the
    // post-DML state go through a FRESH load (documented semantics)
    spark.read.format("graftlog").load(path).createOrReplaceTempView("dvum_t")
    assert(spark.sql("SELECT v FROM dvum_t WHERE id = 9").head()
      .getString(0) == "sqlu")
    Seq((3L, "m3", 0), (60L, "m60", 1)).toDF("id", "v", "grp")
      .createOrReplaceTempView("dvum_s")
    spark.sql("""
      MERGE INTO dvum_t USING dvum_s ON dvum_t.id = dvum_s.id
      WHEN MATCHED THEN UPDATE SET v = dvum_s.v
      WHEN NOT MATCHED THEN INSERT *
    """)
    val v2 = TxLogTable.currentVersion(path)
    assert(TxLogTable.historyDf(spark, path)
      .filter(col("version") === v2).select("operation").head()
      .getString(0) == "dvmerge")
    spark.read.format("graftlog").load(path).createOrReplaceTempView("dvum_t")
    assert(spark.sql("SELECT v FROM dvum_t WHERE id = 3").head()
      .getString(0) == "m3")
    assert(spark.sql("SELECT count(*) FROM dvum_t").head().getLong(0) == 31)
    spark.catalog.dropTempView("dvum_t")
    spark.catalog.dropTempView("dvum_s")
  }

  test("shallowClone of a dv-masked snapshot carries the masks (no resurrection)") {
    val path = tmp
    seed(path)
    TxLogTable.deleteWhereDv(spark, path, col("id").isin(4L, 14L, 24L))
    val dest = tmp + "_clone"
    TxLogTable.shallowClone(spark, path, dest)
    // the clone's v0 must serve the MASKED view, not the raw files
    assert(TxLogTable.read(spark, dest).count() == 27)
    assert(TxLogTable.read(spark, dest).filter(col("id") === 14).isEmpty)
    assert(TxLogTable.deletionVectors(dest, 0).values.map(_._2).sum == 3L)
    // and it purges independently of the source
    TxLogTable.purgeDeletes(spark, dest)
    assert(TxLogTable.read(spark, dest).count() == 27)
    assert(TxLogTable.read(spark, path).count() == 27)
  }

  test("purgeDeletes folds dv-update masks back into plain files") {
    val path = tmp
    seed(path)
    TxLogTable.updateWhereDv(spark, path,
      Map("v" -> lit("z")), col("id").isin(1L, 21L))
    val masked = TxLogTable.read(spark, path).orderBy("id").collect().toSeq
    TxLogTable.purgeDeletes(spark, path)
    assert(TxLogTable.deletionVectors(path,
      TxLogTable.currentVersion(path)).isEmpty)
    assert(TxLogTable.read(spark, path).orderBy("id").collect().toSeq
      == masked)
  }
}
