package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.TxLogTable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class ChangeFeedStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-cdf").toString

  // the downstream curation transform: keep every change image with its
  // commit tag — per-row, so per-range application must compose to the
  // full-feed recompute exactly
  private val transform: DataFrame => DataFrame =
    _.select(col("id"), col("amount"), col("_change_type"),
      col("_commit_version"))

  private def destRows(dest: String): Set[(Long, Double, String, Long)] =
    TxLogTable.read(spark, dest)
      .as[(Long, Double, String, Long)].collect().toSet

  test("consumer state equals full-feed recompute across appends, DML, and a restore") {
    val src = tmp
    val dest = tmp + "-down"
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amount"),
      src) // v0
    assert(ChangeFeedStream.applyOnce(spark, src, dest, transform) == 0L)
    assert(ChangeFeedStream.appliedVersion(dest, src) == 0L)

    // appends + whole-row upsert + predicate delete in one catch-up
    TxLogTable.append(spark,
      Seq((3L, "c", 30.0)).toDF("id", "grp", "amount"), src)       // v1
    TxLogTable.upsertByKey(spark, src,
      Seq((2L, "b", 25.0)).toDF("id", "grp", "amount"), Seq("id")) // v2
    TxLogTable.deleteWhere(spark, src, col("id") === 1L)           // v3
    assert(ChangeFeedStream.applyOnce(spark, src, dest, transform) == 3L)

    // a RESTORE is an ordinary commit: its feed step carries the
    // un-restored state as deletes + the restored rows as inserts
    TxLogTable.restore(spark, src, 1L)                             // v4
    assert(ChangeFeedStream.applyOnce(spark, src, dest, transform) == 4L)

    val recompute = transform(
      TxLogTable.changesPerVersion(spark, src, -1L, 4L))
      .as[(Long, Double, String, Long)].collect().toSet
    assert(destRows(dest) == recompute,
      "per-range application must equal the full-feed recompute")
    // the restore really surfaced: id 1 is re-inserted at commit 4
    assert(destRows(dest).contains((1L, 10.0, "insert", 4L)))

    // already-current consumer: no-op, no commit
    val dv = TxLogTable.currentVersion(dest)
    assert(ChangeFeedStream.applyOnce(spark, src, dest, transform) == 4L)
    assert(TxLogTable.currentVersion(dest) == dv)
  }

  test("a replayed range applies exactly once (crash in the txn window)") {
    val src = tmp
    val dest = tmp + "-down"
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0)).toDF("id", "grp", "amount"), src) // v0
    ChangeFeedStream.applyOnce(spark, src, dest, transform)
    TxLogTable.append(spark,
      Seq((2L, "b", 20.0)).toDF("id", "grp", "amount"), src) // v1
    ChangeFeedStream.applyOnce(spark, src, dest, transform)
    val rows = destRows(dest)
    val dv = TxLogTable.currentVersion(dest)
    // simulate the crash window: the range (0, 1] replays — same feed,
    // same watermark txn — as a restarted driver would re-deliver it
    val feed = TxLogTable.changesPerVersion(spark, src, 0L, 1L)
    TxLogTable.append(spark, transform(feed), dest,
      txn = Some(("cdf:" + src, 1L)))
    assert(destRows(dest) == rows, "replayed range must not duplicate rows")
    assert(TxLogTable.currentVersion(dest) == dv,
      "replayed range must not even commit")
  }

  test("concurrent consumers: racing applyOnce never duplicates a range") {
    val src = tmp
    val dest = tmp + "-down"
    for (i <- 0 until 5)
      TxLogTable.append(spark,
        Seq((i.toLong, s"g$i", i * 10.0)).toDF("id", "grp", "amount"), src)
    // four drivers race the same catch-up; the CAS lets exactly one
    // land the range, the rest retry into the advanced watermark
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    def race(): Unit = {
      val fs = (1 to 4).map(_ => Future {
        ChangeFeedStream.applyOnce(spark, src, dest, transform)
      })
      fs.foreach(Await.result(_, 120.seconds))
    }
    race()
    assert(TxLogTable.currentVersion(dest) == 0L,
      "four racing consumers must produce exactly ONE dest commit")
    val recompute = transform(
      TxLogTable.changesPerVersion(spark, src, -1L, 4L))
      .as[(Long, Double, String, Long)].collect().toSet
    assert(destRows(dest) == recompute)
    // and again after the source advances
    TxLogTable.append(spark,
      Seq((9L, "z", 90.0)).toDF("id", "grp", "amount"), src) // v5
    race()
    assert(TxLogTable.currentVersion(dest) == 1L)
    assert(destRows(dest) == transform(
      TxLogTable.changesPerVersion(spark, src, -1L, 5L))
      .as[(Long, Double, String, Long)].collect().toSet)
  }

  test("a stale driver's overlapping range is rejected by the CAS (the two-driver window)") {
    val src = tmp
    val dest = tmp + "-down"
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0)).toDF("id", "grp", "amount"), src) // v0
    // driver A reads the dest version, then stalls
    val staleDestV = TxLogTable.currentVersion(dest) // -1
    // driver B applies (-1, 0] and advances the watermark
    ChangeFeedStream.applyOnce(spark, src, dest, transform)
    TxLogTable.append(spark,
      Seq((2L, "b", 20.0)).toDF("id", "grp", "amount"), src) // v1
    val rows = destRows(dest)
    // driver A wakes with its stale snapshot and tries to land the
    // OVERLAPPING range (-1, 1] under a newer txn version — before the
    // CAS this committed (SetTransaction only skips <= recorded) and
    // duplicated (-1, 0] downstream; now it must abort stageless
    val feed = TxLogTable.changesPerVersion(spark, src, -1L, 1L)
    intercept[java.util.ConcurrentModificationException] {
      TxLogTable.append(spark, transform(feed), dest,
        txn = Some(("cdf:" + src, 1L)),
        expectedVersion = Some(staleDestV))
    }
    assert(destRows(dest) == rows, "the stale range must not land")
  }

  test("foreachBatch driver: AvailableNow tick catches the consumer up") {
    val src = tmp
    val dest = tmp + "-down"
    val ckpt = Files.createTempDirectory("graft-cdf-ckpt").toString
    TxLogTable.append(spark,
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "grp", "amount"),
      src) // v0
    TxLogTable.deleteWhere(spark, src, col("id") === 2L) // v1
    val q = ChangeFeedStream.start(spark, src, dest, transform, ckpt)
    q.awaitTermination(60000)
    assert(ChangeFeedStream.appliedVersion(dest, src) == 1L)
    assert(destRows(dest) == Set(
      (1L, 10.0, "insert", 0L), (2L, 20.0, "insert", 0L),
      (2L, 20.0, "delete", 1L)))
  }
}
