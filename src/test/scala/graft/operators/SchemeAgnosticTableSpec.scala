package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The 100 TB posture check for the ACID table: TxLogTable and its Delta
  * mirror must resolve EVERY log/data operation through Hadoop's
  * FileSystem API, so the commit log lives on the same store as the data
  * (`hdfs://`, `s3a://`, …). The proof: a full table lifecycle on a
  * custom `graftfs://` scheme ([[GraftTestFs]]) — any java.nio escape
  * would mis-resolve the scheme-qualified path string (nio sees a
  * relative path named "graftfs:") and the cycle would fail or leave
  * debris, which the spec also checks for. */
class SchemeAgnosticTableSpec extends SparkSpec {
  import spark.implicits._

  private def schemePath(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[GraftTestFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft-scheme").toString
    s"graftfs://$local"
  }

  test("full TxLogTable lifecycle on a non-file scheme: append, time travel, checkpoint, compact, vacuum") {
    val path = schemePath()
    (0 to 11).foreach { i =>
      TxLogTable.append(spark, Seq((i.toLong, s"r$i")).toDF("id", "v"), path)
    }
    assert(TxLogTable.currentVersion(path) == 11)
    assert(TxLogTable.read(spark, path).count() == 12)
    assert(TxLogTable.readVersion(spark, path, 4).count() == 5)
    // the log checkpoint rolled up through the Hadoop API at v10
    val (fs, root) = TxLogTable.fsFor(path)
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "_log/10.checkpoint.json")),
      "log checkpoint must land on the scheme filesystem")

    // compaction publishes a rebase through the same commit path
    val cv = TxLogTable.compact(spark, path)
    assert(TxLogTable.read(spark, path).count() == 12)
    assert(TxLogTable.readVersion(spark, path, 3).count() == 4, "time travel survives")
    TxLogTable.append(spark, Seq((99L, "z")).toDF("id", "v"), path)
    assert(TxLogTable.read(spark, path).count() == 13)

    // vacuums walk and delete through the scheme FS
    assert(TxLogTable.vacuumCompacted(path, sinceVersion = cv).size == 12)
    assert(TxLogTable.read(spark, path).count() == 13)
    assert(TxLogTable.vacuum(path, graceMs = 0L).isEmpty)

    // no java.nio escape: a nio call on "graftfs://…" would have created
    // a literal "graftfs:" directory under the working dir
    assert(!new java.io.File("graftfs:").exists(),
      "a java.nio call mis-resolved the scheme-qualified table path")
  }

  test("delta mirror on a non-file scheme: contiguous entries readable through the scheme FS, replay == native read") {
    val path = schemePath()
    TxLogTable.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), path)
    TxLogTable.append(spark, Seq((3L, "c")).toDF("id", "v"), path)
    val (fs, root) = TxLogTable.fsFor(path)
    val d = new org.apache.hadoop.fs.Path(root, "_delta_log")
    val names = fs.listStatus(d).map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("_")).sorted.toSeq
    assert(names == Seq("00000000000000000000.json", "00000000000000000001.json"),
      s"mirror entries must land on the scheme filesystem: $names")
    // replay the actions reading ONLY through the scheme FS
    var active = Set.empty[String]
    names.foreach { n =>
      val df = spark.read.json(s"$path/_delta_log/$n")
      if (df.columns.contains("remove"))
        active = active -- df.filter(col("remove").isNotNull)
          .select("remove.path").as[String].collect()
      if (df.columns.contains("add"))
        active = active ++ df.filter(col("add").isNotNull)
          .select("add.path").as[String].collect()
    }
    val external = spark.read.parquet(active.map(f => s"$path/$f").toSeq: _*)
    assert(external.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // declared sizes come from the scheme FS, matching physical files
    names.foreach { n =>
      val df = spark.read.json(s"$path/_delta_log/$n")
      if (df.columns.contains("add"))
        df.filter(col("add").isNotNull).select("add.path", "add.size")
          .as[(String, Long)].collect().foreach { case (p, size) =>
            assert(fs.getFileStatus(
              new org.apache.hadoop.fs.Path(root, p)).getLen == size,
              s"declared size wrong for $p")
          }
    }
  }

  test("CommitPoint.Fs: no-replace publish wins once, loses politely, surfaces real failures") {
    val path = schemePath()
    val (fs, root) = TxLogTable.fsFor(path)
    val logDir = new org.apache.hadoop.fs.Path(root, "_log")
    fs.mkdirs(logDir)
    assert(CommitPoint.Fs.putIfAbsent(fs, logDir, "0.json", """{"version":0}"""))
    assert(!CommitPoint.Fs.putIfAbsent(fs, logDir, "0.json", """{"version":0,"mine":1}"""),
      "second publish of the same version must lose")
    val in = fs.open(new org.apache.hadoop.fs.Path(logDir, "0.json"))
    val kept = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(kept == """{"version":0}""", "lost race must not replace the entry")
    // Auto on a non-file scheme routes to Fs (HardLink would throw: no
    // hard links in the Hadoop API)
    assert(CommitPoint.Auto.putIfAbsent(fs, logDir, "1.json", """{"version":1}"""))
    intercept[IllegalArgumentException] {
      CommitPoint.HardLink.putIfAbsent(fs, logDir, "2.json", "x")
    }
  }
}
