package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-iv").toString

  private def viewRows(view: String): Map[String, (Long, Double)] =
    TxLogTable.read(spark, view)
      .select(col("grp"), col("cnt"), col("sum_amount").cast("double"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def recompute(source: String): Map[String, (Long, Double)] =
    TxLogTable.read(spark, source)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), sum(col("amount")).cast("double").as("s"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  test("maintained view tracks the base table through mixed DML, incrementally") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("id", "grp", "amount"), src) // v0
    // initial load
    assert(IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount")) == 0L)
    assert(viewRows(view) == recompute(src))
    assert(viewRows(view) == Map("a" -> ((2L, 40.0)), "b" -> ((1L, 20.0))))

    // append + upsert + delete, one maintain call applies the whole range
    TxLogTable.append(spark,
      Seq((4L, "c", 5.0)).toDF("id", "grp", "amount"), src)          // v1
    TxLogTable.upsertByKey(spark, src,
      Seq((1L, "a", 100.0)).toDF("id", "grp", "amount"), Seq("id"))  // v2
    TxLogTable.deleteWhere(spark, src, col("grp") === "b")           // v3
    assert(IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount")) == 3L)
    assert(viewRows(view) == recompute(src))
    // group b vanished entirely (cnt reached 0)
    assert(!viewRows(view).contains("b"))
    assert(viewRows(view) == Map("a" -> ((2L, 130.0)), "c" -> ((1L, 5.0))))

    // the second refresh was INCREMENTAL: the view's txn record tracks
    // the source head, and re-maintaining with no new source commits is
    // a no-op that leaves the view's own version unchanged
    val vv = TxLogTable.currentVersion(view)
    assert(IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount")) == 3L)
    assert(TxLogTable.currentVersion(view) == vv,
      "no-op maintain must not commit a new view version")

    // compaction in the source feeds an empty delta — view untouched
    TxLogTable.compact(spark, src, targetFiles = 1)                  // v4
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    assert(viewRows(view) == recompute(src))

    // the view is itself an ACID table: time travel shows the first
    // refresh's state
    val first = TxLogTable.readVersion(spark, view, 0L)
      .select(col("grp"), col("cnt")).as[(String, Long)].collect().toMap
    assert(first == Map("a" -> 2L, "b" -> 1L, "c" -> 0L).filter(_._2 > 0L) ||
      first == Map("a" -> 2L, "b" -> 1L),
      s"view v0 must be the initial load: $first")
  }

  test("delta-priced publish: a 3-group delta merges into a 5k-group view touching only those groups' files") {
    val src = tmp
    val view = tmp + "-view"
    // 5000 groups, one row each; the view state lands spread over many
    // files (the groupBy's shuffle partitioning)
    TxLogTable.append(spark,
      spark.range(5000).select(col("id"),
        concat(lit("g"), col("id")).as("grp"),
        (col("id") * 1.0).as("amount")), src) // v0
    // pin a multi-file first-load layout (AQE would coalesce this tiny
    // probe state into one file and the file-count REQUIRE below would
    // be vacuous)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val v0 = TxLogTable.currentVersion(view)
    val f0 = TxLogTable.snapshotFiles(view, v0).toSet
    assert(f0.size >= 8,
      s"the probe needs a multi-file view, got ${f0.size} file(s)")

    // a delta touching exactly 3 groups
    TxLogTable.append(spark,
      Seq((9001L, "g7", 1.0), (9002L, "g1234", 2.0), (9003L, "g4999", 3.0))
        .toDF("id", "grp", "amount"), src) // v1
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    val v1 = TxLogTable.currentVersion(view)
    val f1 = TxLogTable.snapshotFiles(view, v1).toSet
    val rewritten = f0 -- f1
    val added = f1 -- f0
    // the REQUIRE: the merge rewrote at most the files HOLDING the 3
    // touched groups — never the whole state
    assert(rewritten.size <= 3 && rewritten.nonEmpty,
      s"3-group delta must rewrite <= 3 files, rewrote ${rewritten.size}")
    assert(added.size <= 3 + 1, s"staged ${added.size} files for 3 groups")
    assert((f0 & f1).size >= f0.size - 3,
      "untouched groups' files must carry by reference")
    assert(viewRows(view) == recompute(src))
    assert(TxLogTable.historyDf(spark, view)
      .filter(col("version") === v1).select("operation")
      .as[String].head() == "merge")

    // zero-crossing groups DELETE through the merge, again file-pruned
    TxLogTable.deleteWhere(spark, src,
      col("grp") === "g42" || col("grp") === "g4321") // v2
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    val v2 = TxLogTable.currentVersion(view)
    val f2 = TxLogTable.snapshotFiles(view, v2).toSet
    assert((f1 -- f2).size <= 2,
      s"2-group delete must rewrite <= 2 files, rewrote ${(f1 -- f2).size}")
    assert(!viewRows(view).contains("g42") && !viewRows(view).contains("g4321"))
    assert(viewRows(view) == recompute(src))

    // a compaction-only range advances the watermark without touching
    // the state (empty txn-stamped append)
    TxLogTable.compact(spark, src, targetFiles = 1) // v3
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    assert(IncrementalView.appliedVersion(view, src)
      == TxLogTable.currentVersion(src),
      "the watermark must advance across a no-row-change range")
    assert(viewRows(view) == recompute(src))

    // replay-idempotent: re-maintaining commits nothing further
    val vv = TxLogTable.currentVersion(view)
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    assert(TxLogTable.currentVersion(view) == vv)
  }

  test("cost-based publish: a wide delta (most groups touched) republishes via overwrite, stays exact, and the narrow merge resumes after") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      spark.range(200).select(col("id"),
        (col("id") % 10).cast("string").as("grp"),
        (col("id") * 1.0).as("amount")), src) // v0: 10 groups
    // multi-file view so the decision below is the COUNT-based tier,
    // not the single-file shortcut
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val before = TxLogTable.snapshotFiles(view,
      TxLogTable.currentVersion(view)).toSet
    assert(before.size > 1, s"the probe needs a multi-file view: $before")

    // WIDE delta: rows land in 8 of 10 groups (>= half) — the publish
    // must take the atomic-overwrite path (a rebase commit, every
    // pre-refresh file replaced), not the merge
    TxLogTable.append(spark,
      spark.range(80).select((col("id") + 1000L).as("id"),
        (col("id") % 8).cast("string").as("grp"),
        lit(5.0).as("amount")), src) // v1
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    finally spark.conf.set(
      "spark.sql.adaptive.coalescePartitions.enabled", "true")
    val vWide = TxLogTable.currentVersion(view)
    assert(TxLogTable.historyDf(spark, view)
      .filter(col("version") === vWide).select("operation")
      .as[String].head() == "overwrite",
      "a wide delta must republish, not merge")
    assert((TxLogTable.snapshotFiles(view, vWide).toSet & before).isEmpty,
      "the republish rebases: no pre-refresh file survives")
    assert(viewRows(view) == recompute(src))
    assert(TxLogTable.snapshotFiles(view, vWide).size > 1,
      "the next leg needs the view still multi-file")

    // NARROW delta after the wide one: back on the merge path
    TxLogTable.append(spark,
      Seq((2000L, "3", 7.0)).toDF("id", "grp", "amount"), src) // v2
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    val vNarrow = TxLogTable.currentVersion(view)
    assert(TxLogTable.historyDf(spark, view)
      .filter(col("version") === vNarrow).select("operation")
      .as[String].head() == "merge",
      "a 1-of-10-group delta must merge")
    assert(viewRows(view) == recompute(src))

    // SINGLE-FILE shortcut: compact the view to one file — even a
    // 1-group delta republishes (carrying by reference can save
    // nothing when the one file must rewrite), with zero decision
    // actions
    TxLogTable.compact(spark, view, targetFiles = 1)
    TxLogTable.append(spark,
      Seq((3000L, "4", 9.0)).toDF("id", "grp", "amount"), src) // v3
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    val vSingle = TxLogTable.currentVersion(view)
    assert(TxLogTable.historyDf(spark, view)
      .filter(col("version") === vSingle).select("operation")
      .as[String].head() == "overwrite",
      "a single-file view must republish even for a narrow delta")
    assert(viewRows(view) == recompute(src))
  }

  test("min/max extremes: monotone on inserts, dirty-group recompute on extremum deletes") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0), (2L, "a", 90.0), (3L, "b", 50.0))
        .toDF("id", "grp", "amount"), src) // v0
    def refresh() = IncrementalView.maintain(spark, src, view,
      Seq("grp"), Seq("amount"), minCols = Seq("amount"), maxCols = Seq("amount"))
    def rows() = TxLogTable.read(spark, view)
      .select(col("grp"), col("cnt"), col("min_amount"), col("max_amount"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    refresh()
    assert(rows() == Map("a" -> ((2L, 10.0, 90.0)), "b" -> ((1L, 50.0, 50.0))))
    // insert-only delta: extremes merge monotonically from the delta
    TxLogTable.append(spark,
      Seq((4L, "a", 5.0), (5L, "b", 99.0)).toDF("id", "grp", "amount"), src)
    refresh()
    assert(rows() == Map("a" -> ((3L, 5.0, 90.0)), "b" -> ((2L, 50.0, 99.0))))
    // delete a's MAX (90): group a is dirty and recomputes its
    // extremes from the base; b's delete of a non-extremum (none here)
    // leaves it linear-only
    TxLogTable.deleteWhere(spark, src, col("id") === 2L)
    refresh()
    assert(rows() == Map("a" -> ((2L, 5.0, 10.0)), "b" -> ((2L, 50.0, 99.0))))
    // delete a NON-extremum row of b: no recompute needed, extremes
    // carry (the delta path alone must keep them right)
    TxLogTable.append(spark,
      Seq((6L, "b", 70.0)).toDF("id", "grp", "amount"), src)
    TxLogTable.deleteWhere(spark, src, col("id") === 6L)
    refresh()
    assert(rows() == Map("a" -> ((2L, 5.0, 10.0)), "b" -> ((2L, 50.0, 99.0))))
    // the maintained extremes always equal a recompute
    val direct = TxLogTable.read(spark, src).groupBy(col("grp"))
      .agg(count(lit(1)).as("cnt"), min(col("amount")), max(col("amount")))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows() == direct)
  }

  test("min/max: NULL group key recomputes on extremum delete (null-safe dirty joins)") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      Seq((1L, Option.empty[String], 10.0), (2L, Option.empty[String], 90.0),
          (3L, Some("b"), 50.0))
        .toDF("id", "grp", "amount"), src)
    def refresh() = IncrementalView.maintain(spark, src, view,
      Seq("grp"), Seq.empty, maxCols = Seq("amount"))
    refresh()
    TxLogTable.deleteWhere(spark, src, col("id") === 2L) // null group's max leaves
    refresh()
    val m = TxLogTable.read(spark, view)
      .select(col("grp"), col("max_amount"))
      .as[(Option[String], Double)].collect().toMap
    assert(m == Map(Option.empty[String] -> 10.0, Some("b") -> 50.0),
      s"null-keyed group must recompute its extremum: $m")
  }

  test("KMV distinct: lossless insert merge, dirty recompute only when a sketch hash leaves") {
    import graft.functions.TextFunctions.h60
    val src = tmp
    val view = tmp + "-view"
    val k = 4
    def refresh() = IncrementalView.maintain(spark, src, view,
      Seq("grp"), Seq.empty, distinctCols = Seq("v"), distinctK = k)
    def viewKmv(): Map[String, Seq[Long]] = TxLogTable.read(spark, view)
      .select(col("grp"), col("kmv_v")).as[(String, Seq[Long])]
      .collect().toMap
    // the ground truth: k smallest distinct hashes recomputed from base
    def directKmv(): Map[String, Seq[Long]] = TxLogTable.read(spark, src)
      .filter(col("v").isNotNull)
      .select(col("grp"), h60(col("v").cast("string")).as("h")).distinct()
      .groupBy(col("grp"))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("kmv"))
      .as[(String, Seq[Long])].collect().toMap

    // 8 distinct values in group a (sketch saturates at 4), 2 in b,
    // plus duplicates and a NULL (must not contribute)
    TxLogTable.append(spark,
      ((1L to 8L).map(i => (i, "a", Some(s"x$i"))) ++
        Seq((9L, "b", Some("y1")), (10L, "b", Some("y2")),
          (11L, "b", Some("y1")), (12L, "b", Option.empty[String])))
        .toDF("id", "grp", "v"), src) // v0
    refresh()
    assert(viewKmv() == directKmv(), "initial load must equal recompute")
    assert(viewKmv()("a").length == k, "saturated sketch holds exactly k")
    assert(viewKmv()("b").length == 2, "undersized sketch is exact")

    // insert-only delta (one duplicate, one fresh): lossless union
    TxLogTable.append(spark,
      Seq((13L, "a", Some("x1")), (14L, "a", Some("x99")),
        (15L, "b", Some("y3"))).toDF("id", "grp", "v"), src)
    refresh()
    assert(viewKmv() == directKmv(), "insert merge must equal recompute")

    // pick a's values by hash rank: the SMALLEST hash is in the sketch,
    // the LARGEST is not (9 distinct vs k=4)
    val byHash = TxLogTable.read(spark, src).filter(col("grp") === "a")
      .select(col("v"), h60(col("v").cast("string")).as("h")).distinct()
      .orderBy(col("h")).as[(String, Long)].collect()
    val inSketch = byHash.head._1
    val outOfSketch = byHash.last._1
    // deleting a value whose hash is OUTSIDE the sketch: the k minima
    // cannot change — the delta path alone must keep the state right
    val before = viewKmv()("a")
    TxLogTable.deleteWhere(spark, src, col("v") === outOfSketch)
    refresh()
    assert(viewKmv()("a") == before, "out-of-sketch delete must not disturb")
    assert(viewKmv() == directKmv())
    // deleting the value holding the sketch's minimum: group a is dirty
    // and recomputes; the 5th-smallest hash must step in
    TxLogTable.deleteWhere(spark, src, col("v") === inSketch)
    refresh()
    assert(viewKmv()("a") == directKmv()("a"),
      "in-sketch delete must recompute the group")
    assert(!viewKmv()("a").contains(byHash.head._2),
      "the deleted value's hash must leave the sketch")
    assert(viewKmv() == directKmv())
  }

  test("streaming materialized view: per-batch refresh, exactly-once under replay") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val table = tmp
    val view = tmp + "-view"
    val ckpt = Files.createTempDirectory("graft-mv-ckpt").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Double)]
    val q = graft.streaming.StreamingOps.startMaterializedView(
      mem.toDF().toDF("id", "grp", "amount"), table, view,
      Seq("grp"), Seq("amount"), ckpt,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData((1L, "a", 10.0), (2L, "b", 20.0))
      q.processAllAvailable()
      assert(viewRows(view) == Map("a" -> ((1L, 10.0)), "b" -> ((1L, 20.0))))
      mem.addData((3L, "a", 5.0))
      q.processAllAvailable()
      assert(viewRows(view) == Map("a" -> ((2L, 15.0)), "b" -> ((1L, 20.0))))
      assert(viewRows(view) == recompute(table),
        "streaming view must equal a batch recompute of the ACID table")
    } finally q.stop()
    // REPLAY the last batch verbatim (crash-after-commit window): the
    // append's SetTransaction record and the view's applied-version
    // record each no-op — same table, same view, no new versions
    val tv = TxLogTable.currentVersion(table)
    val vv = TxLogTable.currentVersion(view)
    graft.streaming.StreamingOps.materializedViewBatch(
      Seq((3L, "a", 5.0)).toDF("id", "grp", "amount"), 1L,
      table, view, Seq("grp"), Seq("amount"), ckpt)
    assert(TxLogTable.currentVersion(table) == tv, "replay double-appended")
    assert(TxLogTable.currentVersion(view) == vv, "replay double-applied")
    assert(viewRows(view) == Map("a" -> ((2L, 15.0)), "b" -> ((1L, 20.0))))
  }

  test("replayed maintain is idempotent per source version (crash safety)") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      Seq((1L, "a", 1.0)).toDF("id", "grp", "amount"), src)
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    TxLogTable.append(spark,
      Seq((2L, "a", 2.0)).toDF("id", "grp", "amount"), src)
    // two maintains racing / a replay after a crash: the overwrite's
    // SetTransaction record makes the second application a no-op
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    val vAfter = TxLogTable.currentVersion(view)
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"))
    assert(TxLogTable.currentVersion(view) == vAfter)
    assert(viewRows(view) == Map("a" -> ((2L, 3.0))))
    assert(IncrementalView.appliedVersion(view, src) == 1L)
  }

  test("maintain's dirty-group recompute pins to the watermark version under concurrent source appends") {
    val src = tmp
    val view = tmp + "-view"
    TxLogTable.append(spark,
      (0L until 200L).map(i => (i, s"g${i % 5}", (i % 40).toDouble))
        .toDF("id", "grp", "amount"), src) // v0
    IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"),
      minCols = Seq("amount"), maxCols = Seq("amount"))
    // strip every group's stored maximum → the NEXT maintain must run
    // the dirty-group recompute path (the read this spec pins)
    TxLogTable.deleteWhere(spark, src, col("amount") >= 35.0) // v1
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val f = Future {
      IncrementalView.maintain(spark, src, view, Seq("grp"), Seq("amount"),
        minCols = Seq("amount"), maxCols = Seq("amount"))
    }
    // race appends into the source while the maintain runs: rows that
    // RAISE maxima past the deleted extremes, so an unpinned recompute
    // (live-head read) would fold them in ahead of the watermark
    var i = 0
    while (!f.isCompleted && i < 30) {
      TxLogTable.append(spark,
        Seq((10000L + i, s"g${i % 5}", 90.0 + i)).toDF("id", "grp", "amount"),
        src)
      i += 1
    }
    val applied = Await.result(f, 5.minutes)
    // the view must equal the full recompute AT THE WATERMARK VERSION —
    // exactly the snapshot the recorded txn claims, concurrent appends
    // excluded
    def recomputeAt(v: Long): Map[String, (Long, Double, Double)] =
      TxLogTable.readVersion(spark, src, v)
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("cnt"), min(col("amount")).as("mn"),
          max(col("amount")).as("mx"))
        .select(col("grp"), col("cnt"), col("mn").cast("double"),
          col("mx").cast("double"))
        .as[(String, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = TxLogTable.read(spark, view)
      .select(col("grp"), col("cnt"), col("min_amount").cast("double"),
        col("max_amount").cast("double"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(applied == IncrementalView.appliedVersion(view, src))
    assert(got == recomputeAt(applied),
      s"view must equal the recompute at its watermark $applied")
    // and the next maintain catches the raced appends up exactly
    val head = IncrementalView.maintain(spark, src, view, Seq("grp"),
      Seq("amount"), minCols = Seq("amount"), maxCols = Seq("amount"))
    assert(head == TxLogTable.currentVersion(src))
    val after = TxLogTable.read(spark, view)
      .select(col("grp"), col("cnt"), col("min_amount").cast("double"),
        col("max_amount").cast("double"))
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(after == recomputeAt(head))
  }
}
