package graft.sources

import graft.SparkSpec
import graft.operators.{CountingFs, TxLogTable}
import org.apache.spark.sql.functions._

/** The 100 TB planning-metadata contract of the log-backed read path:
  * a FRESH relation over an N-file `graftlog` table must plan — schema
  * resolution, `sizeInBytes`, the split listing — with ZERO per-data-
  * file filesystem calls, because the commit log records every file's
  * name, size, and the snapshot schema (the Delta protocol's
  * `add.size` + `metaData.schemaString`). Without that, first-plan
  * hydration against a 100k-file object-store table is ~100k serial
  * HEAD requests (~an hour at 30 ms each) before a single byte scans.
  *
  * Counted through [[CountingFs]] (`countfs://`, the
  * SchemeAgnosticTableSpec harness shape): `getFileStatus`/`open`
  * calls touching `.parquet` paths. Log JSON and `_stats.json`
  * sidecars are metadata-scale (per commit / per data DIR) and stay
  * out of the count by construction. */
class LogMetadataPlanningSpec extends SparkSpec {
  import spark.implicits._

  private def countPath(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.countfs.impl", classOf[CountingFs].getName)
    val local = java.nio.file.Files.createTempDirectory("graft-count").toString
    s"countfs://$local"
  }

  test("fresh relation over a many-file table: schema + sizes + listing plan with zero per-data-file FS calls") {
    val path = countPath()
    // 3 commits × 16 files = 48 data files; O(N) hydration would show
    // up as ≥48 stats or opens
    (0 until 3).foreach { c =>
      TxLogTable.append(spark,
        spark.range(c * 1000, (c + 1) * 1000)
          .select($"id", ($"id" % 7).as("k")).repartition(16), path)
    }
    val (files, sizes) = TxLogTable.snapshotWithSizes(path, 2L)
    assert(files.size == 48, s"expected 48 data files, got ${files.size}")
    assert(sizes.keySet == files.toSet,
      "every committed file's size must be recorded in the log")

    CountingFs.reset()
    // fresh relation: schema resolves from the commit entry, statuses
    // synthesize from recorded sizes, splits come from the listing
    val df = spark.read.format("graftlog").load(path)
    assert(df.schema.fieldNames.toSeq == Seq("id", "k"))
    val filtered = df.filter($"id" >= 500)
    filtered.queryExecution.executedPlan // physical planning
    // materialize the scan's partitions (split computation needs every
    // file's size) WITHOUT reading data
    filtered.rdd.getNumPartitions
    assert(CountingFs.parquetStats.get() == 0,
      s"planning issued ${CountingFs.parquetStats.get()} getFileStatus " +
        "calls on data files — the log records sizes precisely so it " +
        "never has to")
    assert(CountingFs.parquetOpens.get() == 0,
      s"planning opened ${CountingFs.parquetOpens.get()} data files " +
        "(footer sweep) — the log records the snapshot schema " +
        "precisely so it never has to")

    // and the synthetic statuses are REAL enough to execute on
    assert(df.count() == 3000)
    assert(df.filter($"k" === 3).count() ==
      (0L until 3000L).count(_ % 7 == 3))
  }

  test("sizeInBytes served from the log equals physical bytes (planner join-size estimates stay honest)") {
    val path = countPath()
    TxLogTable.append(spark,
      spark.range(0, 500).select($"id", ($"id" * 2).as("v"))
        .repartition(8), path)
    val (files, sizes) = TxLogTable.snapshotWithSizes(path, 0L)
    val (fs, root) = TxLogTable.fsFor(path)
    val physical = files.map(f => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(root, f)).getLen).sum
    assert(sizes.values.sum == physical,
      "log-recorded sizes must sum to the physical snapshot size")

    val rel = spark.read.format("graftlog").load(path)
    val logical = rel.queryExecution.optimizedPlan
    assert(logical.stats.sizeInBytes.toLong == physical,
      s"planner sizeInBytes ${logical.stats.sizeInBytes} != physical $physical")
  }

  test("pre-size/pre-schema log entries (legacy form) still read: per-file fallback engages, results identical") {
    val path = countPath()
    TxLogTable.append(spark,
      spark.range(0, 300).select($"id", ($"id" % 5).as("k"))
        .repartition(4), path)
    // rewrite the commit entry into the LEGACY form: bare-string file
    // names, no schema — what a pre-round-15 log looks like on disk
    val (fs, root) = TxLogTable.fsFor(path)
    val entryPath = new org.apache.hadoop.fs.Path(root, "_log/0.json")
    val txt = {
      val in = fs.open(entryPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    val legacy = txt
      .replaceAll("""\{"p":("data-[^"]+"),"s":\d+\}""", "$1")
      .replaceAll(""""schema":"(?:[^"\\]|\\.)*",""", "")
    assert(legacy != txt, "rewrite must strip sizes and schema")
    fs.delete(entryPath, false)
    val out = fs.create(entryPath, false)
    try out.write(legacy.getBytes("UTF-8")) finally out.close()

    assert(TxLogTable.snapshotWithSizes(path, 0L)._2.isEmpty,
      "legacy entries record no sizes")
    assert(TxLogTable.schemaAt(path, 0L).isEmpty,
      "legacy entries record no schema")
    CountingFs.reset()
    val df = spark.read.format("graftlog").load(path)
    assert(df.count() == 300, "legacy logs must stay fully readable")
    assert(CountingFs.parquetStats.get() > 0 ||
      CountingFs.parquetOpens.get() > 0,
      "the legacy path is expected to fall back to per-file FS calls")
  }

  test("DML carries recorded sizes and schema through rebase commits and checkpoints") {
    val path = countPath()
    (0 until 11).foreach { c =>
      TxLogTable.append(spark,
        spark.range(c * 100, (c + 1) * 100)
          .select($"id", ($"id" % 3).as("k")).repartition(2), path)
    }
    // v11: delete rewrites touched files, carries the rest by reference
    // — carried files must KEEP their recorded sizes through the rebase
    TxLogTable.deleteWhere(spark, path, $"id" < 50)
    val v = TxLogTable.currentVersion(path)
    val (files, sizes) = TxLogTable.snapshotWithSizes(path, v)
    assert(files.nonEmpty && sizes.keySet == files.toSet,
      s"post-DML snapshot must have every size recorded " +
        s"(${files.size} files, ${sizes.size} sizes)")
    assert(TxLogTable.schemaAt(path, v).exists(
      _.fieldNames.toSeq == Seq("id", "k")),
      "DML commits record the snapshot schema")
    // the v10 checkpoint rolled sizes up too: resolving v10 must not
    // lose them (checkpoint + incrementals is the whole read path)
    val (f10, s10) = TxLogTable.snapshotWithSizes(path, 10L)
    assert(s10.keySet == f10.toSet, "checkpoint must preserve sizes")
  }
}
