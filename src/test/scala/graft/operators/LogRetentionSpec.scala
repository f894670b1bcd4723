package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Log retention ([[TxLogTable.expireLog]]) — Delta's
  * `logRetentionDuration` contract: pre-checkpoint entries past the
  * horizon are deleted so a long-lived streaming table does not carry
  * one JSON file per commit forever; time travel below the horizon
  * refuses loudly, everything at or above it is byte-identical. */
class LogRetentionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp = Files.createTempDirectory("graft-retain").toString

  private def logFiles(path: String): Set[String] =
    new java.io.File(path, "_log").listFiles()
      .map(_.getName).filter(_.endsWith(".json"))
      .filterNot(_.startsWith(".")).toSet

  test("a 25-commit table expires to checkpoint + tail; head and recent time travel unchanged; pre-horizon refuses loudly") {
    val path = tmp
    (0 until 25).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path)
    } // v0..v24, checkpoints at 10 and 20
    val headBefore = TxLogTable.read(spark, path)
      .orderBy("id").collect().toSeq
    val v22Before = TxLogTable.readVersion(spark, path, 22).count()

    val deleted = TxLogTable.expireLog(path, retainMs = 0L)
    // entries 0..19 (below the newest checkpoint, past the horizon)
    // and the now-useless checkpoint 10 are gone
    assert(deleted.toSet ==
      ((0 until 20).map(v => s"$v.json") :+ "10.checkpoint.json").toSet,
      s"unexpected expiry set: $deleted")
    assert(logFiles(path) ==
      ((20 to 24).map(v => s"$v.json") :+ "20.checkpoint.json").toSet)

    // head reads and retained time travel are byte-identical
    assert(TxLogTable.read(spark, path).orderBy("id").collect().toSeq
      == headBefore)
    assert(TxLogTable.readVersion(spark, path, 22).count() == v22Before)
    assert(TxLogTable.readVersion(spark, path, 20).count() == 21)

    // below the horizon: loud refusal naming the contract
    val e = intercept[IllegalStateException](
      TxLogTable.readVersion(spark, path, 5).count())
    assert(e.getMessage.contains("retention horizon"), e.getMessage)

    // expiry is idempotent
    assert(TxLogTable.expireLog(path, 0L).isEmpty)

    // and the table keeps working: appends, DML, head reads
    TxLogTable.append(spark, Seq((100L, "new")).toDF("id", "v"), path)
    TxLogTable.deleteWhere(spark, path, col("id") === 3L)
    assert(TxLogTable.read(spark, path).count() == 25)
  }

  test("no checkpoint yet, or a long retention window: nothing expires") {
    val path = tmp
    (0 until 5).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path)
    }
    assert(TxLogTable.expireLog(path, 0L).isEmpty,
      "full replay still needs every entry when no checkpoint exists")
    val path2 = tmp
    (0 until 12).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path2)
    }
    assert(TxLogTable.expireLog(path2, retainMs = 24L * 3600 * 1000)
      .isEmpty, "entries inside the retention window must survive")
  }

  test("graft.logRetentionDuration: expiry runs automatically at checkpoint time") {
    val path = tmp
    TxLogTable.append(spark, Seq((0L, "seed")).toDF("id", "v"), path)
    TxLogTable.setTableProperty(path, TxLogTable.PropLogRetention,
      "interval 0 seconds")
    (1 until 21).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path)
    } // v0..v20; the checkpoint at 20 auto-expires the pre-10 history
    assert(!logFiles(path).contains("0.json"),
      s"auto-expiry must have reaped the pre-checkpoint prefix: " +
        s"${logFiles(path)}")
    assert(TxLogTable.read(spark, path).count() == 21)
    intercept[IllegalStateException](
      TxLogTable.readVersion(spark, path, 3).count())
    // the Delta interval spelling parses; garbage is ignored, not fatal
    assert(TxLogTable.parseDuration("interval 30 days")
      .contains(30L * 86400000))
    assert(TxLogTable.parseDuration("interval 2 hours")
      .contains(7200000L))
    assert(TxLogTable.parseDuration("86400000").contains(86400000L))
    assert(TxLogTable.parseDuration("soon").isEmpty)
  }

  test("streaming restart from a checkpointed offset still works after expiry") {
    val path = tmp
    (0 to 30).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path)
    } // v0..v30, checkpoints at 10, 20, 30
    val ckpt = Files.createTempDirectory("graft-retain-ckpt").toString
    val batches = new scala.collection.concurrent.TrieMap[Long,
      Set[Long]]()
    def start() = spark.readStream.format("graftlog").load(path)
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        batches(id) = b.select(col("id")).collect()
          .map(_.getLong(0)).toSet
        ()
      }.start()
    val q = start()
    q.processAllAvailable()
    // one more commit + drain so the stream's LAST batch range sits
    // entirely at-or-above the log checkpoint the expiry will keep —
    // the V1 recovery contract replays that range on restart, and its
    // diff base (v30) must stay resolvable
    TxLogTable.append(spark, Seq((31L, "v31")).toDF("id", "v"), path)
    q.processAllAvailable()
    q.stop()
    assert(batches.values.flatten.toSet == (0L to 31L).toSet)

    // expire the pre-checkpoint history (entries 0..29 go; the v30
    // checkpoint is the new horizon), then keep committing
    val deleted = TxLogTable.expireLog(path, 0L)
    assert(deleted.contains("0.json") && !deleted.contains("30.json"))
    (32 to 34).foreach { i =>
      TxLogTable.append(spark,
        Seq((i.toLong, s"v$i")).toDF("id", "v"), path)
    }
    batches.clear()
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = batches.values.flatten.toSet
    assert(got.subsetOf((31L to 34L).toSet) &&
      (32L to 34L).forall(got),
      s"the restarted stream must drain exactly the post-offset " +
        s"commits (a replayed final batch may re-deliver 31): $got")
  }
}
