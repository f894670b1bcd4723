package graft.operators

import java.nio.file.{Files, Path, Paths}

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}
import scala.jdk.CollectionConverters._

/** Conformance check of the `_delta_log` mirror against the public Delta
  * protocol's replay rules, WITHOUT any delta reader jar (none exists in
  * this environment): the spec re-implements the reader side — list
  * `<v>.json` in version order, apply remove/add actions, take the last
  * metaData/protocol — and verifies the reconstructed snapshot equals
  * the native TxLogTable read. */
class DeltaInteropSpec extends SparkSpec {
  import spark.implicits._

  private def dir(): String =
    Files.createTempDirectory("graft-delta").toString

  private def logFiles(path: String): Seq[Path] = {
    val d = Paths.get(path, "_delta_log")
    val s = Files.list(d)
    try s.iterator().asScala.filter(_.getFileName.toString.endsWith(".json"))
      .filter(!_.getFileName.toString.startsWith("_"))
      .toSeq.sortBy(_.getFileName.toString)
    finally s.close()
  }

  /** Independent replay: (active file set, last schemaString, sawProtocol). */
  private def replay(files: Seq[Path]): (Set[String], String, Boolean) = {
    var active = Set.empty[String]
    var schema: String = null
    var sawProtocol = false
    files.foreach { f =>
      val df = spark.read.json(f.toString)
      val cols = df.columns.toSet
      if (cols("protocol")) {
        val p = df.filter(col("protocol").isNotNull)
          .select("protocol.minReaderVersion").as[Long].collect()
        if (p.nonEmpty) { sawProtocol = true; assert(p.head == 1L) }
      }
      if (cols("metaData")) {
        val m = df.filter(col("metaData").isNotNull)
          .select("metaData.schemaString").as[String].collect()
        if (m.nonEmpty) schema = m.head
      }
      if (cols("remove")) {
        val r = df.filter(col("remove").isNotNull)
          .select("remove.path").as[String].collect()
        active = active -- r
      }
      if (cols("add")) {
        val a = df.filter(col("add").isNotNull)
          .select("add.path").as[String].collect()
        active = active ++ a
      }
    }
    (active, schema, sawProtocol)
  }

  private def rowsOf(df: DataFrame): Set[(Long, String)] =
    df.select("id", "v").as[(Long, String)].collect().toSet

  test("append mirror: 0-padded contiguous versions, protocol+metaData at v0, replay == native read") {
    val path = dir()
    TxLogTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((3L, "c")).toDF("id", "v"), path)
    val files = logFiles(path)
    assert(files.map(_.getFileName.toString) ==
      Seq("00000000000000000000.json", "00000000000000000001.json"))

    val (active, schemaString, sawProtocol) = replay(files)
    assert(sawProtocol, "v0 must carry the protocol action")
    // schemaString is a parseable Spark schema matching the table
    val parsed = DataType.fromJson(schemaString).asInstanceOf[StructType]
    assert(parsed.fieldNames.toSeq == Seq("id", "v"))

    // an external reader consuming exactly the add/remove file set sees
    // the same rows as the native snapshot read
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))

    // add.size must match the physical files (readers trust it)
    files.foreach { f =>
      val df = spark.read.json(f.toString)
      if (df.columns.contains("add"))
        df.filter(col("add").isNotNull).select("add.path", "add.size")
          .as[(String, Long)].collect().foreach { case (p, size) =>
            assert(new java.io.File(s"$path/$p").length() == size,
              s"declared size wrong for $p")
          }
    }
  }

  test("compaction mirrors as remove-all + add-all; replay still equals native read") {
    val path = dir()
    (0 until 4).foreach { i =>
      TxLogTable.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "v"), path)
    }
    val preActive = replay(logFiles(path))._1
    TxLogTable.compact(spark, path)
    val (active, _, _) = replay(logFiles(path))
    assert(active.intersect(preActive).isEmpty,
      "compaction must remove every pre-compaction file")
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))
  }

  test("checkpoint: single parquet file + _last_checkpoint; reader starting there matches full replay") {
    val path = dir()
    (0 to 11).foreach { i =>
      TxLogTable.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "v"), path)
    }
    val d = Paths.get(path, "_delta_log")
    val ckpt = d.resolve("00000000000000000010.checkpoint.parquet")
    assert(Files.isRegularFile(ckpt), "checkpoint must be a single parquet FILE")
    val hint = Files.readString(d.resolve("_last_checkpoint"))
    assert(hint.contains("\"version\":10"), s"_last_checkpoint: $hint")

    val cp = spark.read.parquet(ckpt.toString)
    assert(Seq("txn", "add", "remove", "metaData", "protocol")
      .forall(cp.columns.contains), s"checkpoint columns: ${cp.columns.toSeq}")
    assert(cp.filter(col("protocol").isNotNull).count() == 1)
    assert(cp.filter(col("metaData").isNotNull).count() == 1)

    // a reader that starts from the checkpoint and replays only v11+
    val fromCkpt = cp.filter(col("add").isNotNull)
      .select("add.path").as[String].collect().toSet
    val tail = logFiles(path).filter(
      _.getFileName.toString.stripSuffix(".json").toLong > 10)
    var active = fromCkpt
    tail.foreach { f =>
      val df = spark.read.json(f.toString)
      if (df.columns.contains("remove"))
        active = active -- df.filter(col("remove").isNotNull)
          .select("remove.path").as[String].collect()
      if (df.columns.contains("add"))
        active = active ++ df.filter(col("add").isNotNull)
          .select("add.path").as[String].collect()
    }
    assert(active == replay(logFiles(path))._1,
      "checkpoint + tail replay diverges from full JSON replay")
  }

  test("schema evolution: the replayed metaData carries the LATEST schema") {
    val path = dir()
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((2L, "b", 7.5)).toDF("id", "v", "extra"), path)
    val (_, schemaString, _) = replay(logFiles(path))
    val parsed = DataType.fromJson(schemaString).asInstanceOf[StructType]
    assert(parsed.fieldNames.toSeq == Seq("id", "v", "extra"),
      s"replay must surface the widened schema: ${parsed.fieldNames.toSeq}")
  }

  test("concurrent appenders: one mirror entry per serialized version, replay == read") {
    val path = dir()
    val threads = (1 to 5).map { i =>
      new Thread(() => {
        TxLogTable.append(spark, Seq((i.toLong, s"t$i")).toDF("id", "v"), path)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val names = logFiles(path).map(_.getFileName.toString)
    assert(names == (0 until 5).map(v => f"$v%020d.json"),
      s"mirror must hold exactly the serialized versions: $names")
    val (active, _, sawProtocol) = replay(logFiles(path))
    assert(sawProtocol)
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))
  }

  test("a mirror gap heals automatically on the next commit (contiguous versions)") {
    val path = dir()
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((2L, "b")).toDF("id", "v"), path)
    // simulate the crash window: v1's mirror never landed
    Files.delete(logFiles(path).last)
    TxLogTable.append(spark, Seq((3L, "c")).toDF("id", "v"), path)
    val names = logFiles(path).map(_.getFileName.toString)
    assert(names == (0 until 3).map(v => f"$v%020d.json"),
      s"the gap at v1 must be healed before v2 publishes: $names")
    val (active, _, _) = replay(logFiles(path))
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))
  }

  test("sync backfills missing mirror entries (crash between native commit and mirror)") {
    val path = dir()
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((2L, "b")).toDF("id", "v"), path)
    TxLogTable.compact(spark, path)
    // simulate the crash window: the latest mirror entry never landed
    val files = logFiles(path)
    Files.delete(files.last)
    // and a pre-mirror table: wipe one more
    Files.delete(files.head)
    val restored = DeltaInterop.sync(spark, path)
    assert(restored.toSet == Set(0L, 2L), s"backfilled: $restored")
    val (active, _, sawProtocol) = replay(logFiles(path))
    assert(sawProtocol)
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))
    assert(DeltaInterop.sync(spark, path).isEmpty, "sync must be idempotent")
  }

  test("sync backfill of a vacuumed version omits adds for missing files (never size 0)") {
    val path = dir()
    TxLogTable.append(spark, Seq((1L, "a")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((2L, "b")).toDF("id", "v"), path)
    val cv = TxLogTable.compact(spark, path)
    TxLogTable.vacuumCompacted(path, sinceVersion = cv) // v0/v1 data dirs gone
    // simulate a pre-mirror table: the vacuumed versions' entries missing
    val files = logFiles(path)
    Files.delete(files(0))
    Files.delete(files(1))
    val restored = DeltaInterop.sync(spark, path)
    assert(restored == Seq(0L, 1L), s"backfilled: $restored")
    // the backfilled entries must not fabricate add actions with size 0
    // for files that no longer exist — strict readers reject those
    Seq(0, 1).foreach { i =>
      val txt = Files.readString(logFiles(path)(i))
      assert(!txt.contains("\"add\""),
        s"v$i: vacuumed files must have their adds omitted, got: $txt")
      assert(txt.contains("\"metaData\""), s"v$i must still carry metaData")
    }
    // final-state replay is unaffected: the rebase's removes of the
    // never-added paths are no-ops, and the compacted files stand
    val (active, _, sawProtocol) = replay(logFiles(path))
    assert(sawProtocol, "v0 must still carry the protocol action")
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(rowsOf(external) == rowsOf(TxLogTable.read(spark, path)))
  }
}
