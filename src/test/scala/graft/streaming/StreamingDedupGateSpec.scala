package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

class StreamingDedupGateSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup across batches and restarts against the durable hash index") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idx = Files.createTempDirectory("graft-gate-idx").toString
    val out = Files.createTempDirectory("graft-gate-out").toString
    val ckpt = Files.createTempDirectory("graft-gate-ckpt").toString

    val mem = MemoryStream[(Long, String)]
    val q = StreamingDedupGate.start(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, ckpt, trigger = Trigger.ProcessingTime(0))
    try {
      // batch 1: two distinct docs plus an in-batch duplicate (id 3 of id 1)
      mem.addData((1L, "alpha beta"), (2L, "gamma delta"), (3L, "alpha beta"))
      q.processAllAvailable()
      val b1 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b1 == Set(1L, 2L), "min-id keeper within the batch")

      // batch 2: a cross-batch duplicate and a new doc
      mem.addData((4L, "alpha beta"), (5L, "epsilon zeta"))
      q.processAllAvailable()
      val b2 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b2 == Set(1L, 2L, 5L), "cross-batch duplicate dropped")
    } finally q.stop()

    // restart with a FRESH checkpoint: the index alone must carry the
    // dedup memory
    val mem2 = MemoryStream[(Long, String)]
    val q2 = StreamingDedupGate.start(
      mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idx, out, Files.createTempDirectory("graft-gate-ckpt2").toString,
      trigger = Trigger.ProcessingTime(0))
    try {
      mem2.addData((6L, "gamma delta"), (7L, "brand new content"))
      q2.processAllAvailable()
      val b3 = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
      assert(b3 == Set(1L, 2L, 5L, 7L), "restart-era duplicate dropped via the index")
      assert(spark.read.parquet(idx).count() == 4, "index holds one hash per admitted doc")
    } finally q2.stop()
  }

  test("index is hash-prefix partitioned and the per-batch read prunes to the batch's prefixes") {
    val idx = Files.createTempDirectory("graft-gate-pidx").toString
    val out = Files.createTempDirectory("graft-gate-pout").toString
    val ckpt = Files.createTempDirectory("graft-gate-pckpt").toString
    val batch = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)

    // layout: hive hp= partition dirs
    val hpDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("hp="))
    assert(hpDirs.nonEmpty, "index not hive-partitioned by hash prefix")

    // the pruned read carries a partition filter on hp, so the scan
    // touches only the arriving prefixes' files
    val onePrefix = hpDirs.head.getName.stripPrefix("hp=")
    val pruned = StreamingDedupGate.prunedIndex(spark, idx, Seq(onePrefix))
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.exists(_.toString.contains("hp")),
      s"no partition filter on hp:\n${scan.partitionFilters}")
    assert(scan.selectedPartitions.partitionCount == 1,
      s"pruning did not reduce to one partition: ${scan.selectedPartitions.partitionCount}")
    assert(pruned.count() >= 1)
  }

  test("index scan prunes FILES by the batch's hash set, not just its prefixes") {
    val idx = Files.createTempDirectory("graft-gate-sidx").toString
    val out = Files.createTempDirectory("graft-gate-sout").toString
    val ckpt = Files.createTempDirectory("graft-gate-sckpt").toString
    // force every hash into ONE hp partition: craft texts whose md5
    // (contentKey's hash) shares the first hex char
    import org.apache.spark.sql.functions.col
    val texts = (0 until 4000).map(i => s"doc body $i")
    val hashOf = texts.map { t =>
      t -> java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val samePrefix = hashOf.filter(_._2.startsWith("a")).take(120)
    assert(samePrefix.size >= 100, "need ≥100 docs sharing hash prefix 'a'")
    val docs = samePrefix.zipWithIndex
      .map { case ((t, _), i) => (i.toLong, t) }
    StreamingDedupGate.processBatch(docs.toDF("doc_id", "text"),
      0L, "doc_id", "text", idx, out, ckpt, 1)
    // range-sorted compaction: many files per prefix, tight h intervals
    StreamingDedupGate.compactIndex(spark, idx, targetFiles = 8)
    val prefixFiles = new java.io.File(s"$idx/hp=a").listFiles()
      .count(_.getName.startsWith("part-"))
    assert(prefixFiles >= 4,
      s"range compaction should split hp=a into several files: $prefixFiles")
    // a one-duplicate batch: prefix pruning alone keeps ALL hp=a files;
    // the batch-stats file prune must open only the file(s) whose
    // [min h, max h] interval contains that hash
    val dupHash = samePrefix.head._2
    val kept = StreamingDedupGate.statsPrunedIndexFiles(
      spark, idx, Seq(dupHash), 1)
    assert(kept.nonEmpty && kept.size < prefixFiles,
      s"file pruning must beat prefix pruning: kept ${kept.size} of $prefixFiles")
    // exactness: the duplicate is still blocked, a new doc admits
    StreamingDedupGate.processBatch(
      Seq((9001L, samePrefix.head._1), (9002L, "totally fresh body"))
        .toDF("doc_id", "text"),
      0L, "doc_id", "text", idx, out,
      Files.createTempDirectory("graft-gate-sckpt2").toString, 1)
    val admitted = spark.read.parquet(out)
      .filter(col("doc_id") >= 9000L).select("doc_id")
      .as[Long].collect().toSet
    assert(admitted == Set(9002L),
      s"stats-pruned gate must still block the duplicate: $admitted")
  }

  test("crash windows: replay never duplicates output or loses index entries") {
    val idx = Files.createTempDirectory("graft-gate-cidx").toString
    val out = Files.createTempDirectory("graft-gate-cout").toString
    val ckpt = Files.createTempDirectory("graft-gate-cckpt").toString
    val batch = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")

    // window 1: crash AFTER a (partial) output publish, BEFORE the out
    // marker — replay recomputes the same admitted set and REPLACES the
    // earlier files instead of appending a second copy
    BatchCommits.publishBatch(batch, out, BatchCommits.scopeFor(ckpt), 0L) // the crashed attempt's files
    StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)
    assert(spark.read.parquet(out).count() == 2, "replay duplicated the output")
    assert(spark.read.parquet(idx).count() == 2, "index incomplete after replay")

    // window 2: crash AFTER the out marker, BEFORE the index publish —
    // replay must re-derive hashes from the PUBLISHED output (not the
    // anti-join) and complete the index
    val batch2 = Seq((3L, "brand new"), (4L, "also new")).toDF("doc_id", "text")
    BatchCommits.publishBatch(batch2, out, BatchCommits.scopeFor(ckpt), 1L)
    BatchCommits.createMarker(spark, ckpt, "graft_out_commits", 1L)
    StreamingDedupGate.processBatch(batch2, 1L, "doc_id", "text", idx, out, ckpt, 2)
    assert(spark.read.parquet(out).count() == 4, "recovery altered the published output")
    assert(spark.read.parquet(idx).count() == 4, "recovery did not complete the index")

    // window 3: fully committed batch replays as a no-op
    StreamingDedupGate.processBatch(batch2, 1L, "doc_id", "text", idx, out, ckpt, 2)
    assert(spark.read.parquet(out).count() == 4)
    assert(spark.read.parquet(idx).count() == 4)
  }

  test("compactIndex: one file per prefix, every admission decision preserved") {
    val idx = Files.createTempDirectory("graft-gate-kidx").toString
    val out = Files.createTempDirectory("graft-gate-kout").toString
    val ckpt = Files.createTempDirectory("graft-gate-kckpt").toString
    // three batches → up to three files per touched prefix
    StreamingDedupGate.processBatch(
      Seq((1L, "aa"), (2L, "bb")).toDF("doc_id", "text"),
      0L, "doc_id", "text", idx, out, ckpt, 2)
    StreamingDedupGate.processBatch(
      Seq((3L, "cc"), (4L, "aa")).toDF("doc_id", "text"),
      1L, "doc_id", "text", idx, out, ckpt, 2)
    StreamingDedupGate.processBatch(
      Seq((5L, "dd")).toDF("doc_id", "text"),
      2L, "doc_id", "text", idx, out, ckpt, 2)
    val before = spark.read.parquet(idx).orderBy("h").collect().toSeq
    StreamingDedupGate.compactIndex(spark, idx)
    val after = spark.read.parquet(idx).orderBy("h").collect().toSeq
    assert(after == before, "compaction changed the hash set")
    val perPrefix = new java.io.File(idx).listFiles()
      .filter(_.getName.startsWith("hp="))
      .map(d => d.listFiles().count(_.getName.startsWith("part-")))
    assert(perPrefix.forall(_ == 1), s"not compacted to one file per prefix: ${perPrefix.toSeq}")

    // admission memory survives compaction across a restart: a dup of
    // doc 1 is still dropped, a new doc admitted
    StreamingDedupGate.processBatch(
      Seq((6L, "aa"), (7L, "zz")).toDF("doc_id", "text"),
      0L, "doc_id", "text", idx, out,
      Files.createTempDirectory("graft-gate-kckpt2").toString, 2)
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 2L, 3L, 5L, 7L), s"post-compaction admissions wrong: $ids")
  }

  test("flat legacy index fails loudly and migrateIndex restores admission memory") {
    val idx = Files.createTempDirectory("graft-gate-midx").toString
    val out = Files.createTempDirectory("graft-gate-mout").toString
    val ckpt = Files.createTempDirectory("graft-gate-mckpt").toString
    // a pre-partitioning index: flat part files of bare hashes
    Seq("0cc175b9c0f1b6a831c399e269772661", "92eb5ffee6ae2fec3ad71c777531578f")
      .map(Tuple1(_)).toDF("h")
      .write.mode("overwrite").parquet(idx) // flat layout, as the round-7 gate wrote it
    val batch = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val e = intercept[IllegalStateException] {
      StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)
    }
    assert(e.getMessage.contains("migrateIndex"), e.getMessage)

    StreamingDedupGate.migrateIndex(spark, idx)
    val hpDirs = new java.io.File(idx).listFiles().filter(_.getName.startsWith("hp="))
    assert(hpDirs.nonEmpty, "migration must produce the hp= layout")
    assert(spark.read.parquet(idx).select("h").as[String].collect().toSet ==
      Set("0cc175b9c0f1b6a831c399e269772661", "92eb5ffee6ae2fec3ad71c777531578f"))
    // the migrated hashes gate admissions: md5("alpha beta") is novel,
    // so it admits; a doc hashing to a migrated value would not
    StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)
    assert(spark.read.parquet(out).count() == 1)
    assert(StreamingDedupGate.migrateIndex(spark, idx) == (), "re-run is a no-op")
  }

  test("migrateIndex stamps _graft_prefix_len so a later mismatched gate fails loudly") {
    val idx = Files.createTempDirectory("graft-gate-mlidx").toString
    val out = Files.createTempDirectory("graft-gate-mlout").toString
    Seq("0cc175b9c0f1b6a831c399e269772661").map(Tuple1(_)).toDF("h")
      .write.mode("overwrite").parquet(idx)
    StreamingDedupGate.migrateIndex(spark, idx, prefixLen = 3)
    assert(new java.io.File(idx, "_graft_prefix_len").exists(),
      "migration must record its prefixLen as authoritative")
    // a gate started with a DIFFERENT prefixLen must refuse — without the
    // meta it would prune to zero matching partitions and re-admit every
    // duplicate silently
    val e = intercept[IllegalStateException] {
      StreamingDedupGate.processBatch(
        Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, "doc_id", "text",
        idx, out, Files.createTempDirectory("graft-gate-mlckpt").toString, 2)
    }
    assert(e.getMessage.contains("prefixLen"), e.getMessage)
    // and a migration against a CONFLICTING existing meta refuses too
    val idx2 = Files.createTempDirectory("graft-gate-mlidx2").toString
    StreamingDedupGate.processBatch(
      Seq((1L, "alpha")).toDF("doc_id", "text"), 0L, "doc_id", "text",
      idx2, Files.createTempDirectory("graft-gate-mlout2").toString,
      Files.createTempDirectory("graft-gate-mlckpt2").toString, 2)
    Seq("92eb5ffee6ae2fec3ad71c777531578f").map(Tuple1(_)).toDF("h")
      .write.mode("append").parquet(idx2) // stray flat files beside hp=
    val e2 = intercept[IllegalStateException] {
      StreamingDedupGate.migrateIndex(spark, idx2, prefixLen = 4)
    }
    assert(e2.getMessage.contains("prefixLen"), e2.getMessage)
  }

  test("out-marker recovery path checks prefixLen before republishing the index slice") {
    val idx = Files.createTempDirectory("graft-gate-rpidx").toString
    val out = Files.createTempDirectory("graft-gate-rpout").toString
    val ckpt = Files.createTempDirectory("graft-gate-rpckpt").toString
    val batch = Seq((1L, "alpha")).toDF("doc_id", "text")
    StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)
    // simulate a crash after batch 1's out marker, then a restart with a
    // CHANGED prefixLen whose first batch takes the recovery path — it
    // must refuse rather than publish mixed-width hp partitions that
    // pruned reads never match
    val batch2 = Seq((2L, "beta")).toDF("doc_id", "text")
    BatchCommits.publishBatch(batch2, out, BatchCommits.scopeFor(ckpt), 1L)
    BatchCommits.createMarker(spark, ckpt, "graft_out_commits", 1L)
    val e = intercept[IllegalStateException] {
      StreamingDedupGate.processBatch(batch2, 1L, "doc_id", "text", idx, out, ckpt, 3)
    }
    assert(e.getMessage.contains("prefixLen"), e.getMessage)
    // with the stored width the recovery completes normally
    StreamingDedupGate.processBatch(batch2, 1L, "doc_id", "text", idx, out, ckpt, 2)
    assert(spark.read.parquet(idx).count() == 2)
  }

  test("prefixLen mismatch across restarts fails loudly instead of re-admitting") {
    val idx = Files.createTempDirectory("graft-gate-plidx").toString
    val out = Files.createTempDirectory("graft-gate-plout").toString
    val ckpt = Files.createTempDirectory("graft-gate-plckpt").toString
    val batch = Seq((1L, "alpha")).toDF("doc_id", "text")
    StreamingDedupGate.processBatch(batch, 0L, "doc_id", "text", idx, out, ckpt, 2)
    val e = intercept[IllegalStateException] {
      StreamingDedupGate.processBatch(
        Seq((2L, "beta")).toDF("doc_id", "text"), 1L, "doc_id", "text",
        idx, out, ckpt, 3) // different prefixLen against the same index
    }
    assert(e.getMessage.contains("prefixLen"), e.getMessage)
    // the stored value still works
    StreamingDedupGate.processBatch(
      Seq((2L, "beta")).toDF("doc_id", "text"), 1L, "doc_id", "text",
      idx, out, ckpt, 2)
    assert(spark.read.parquet(out).count() == 2)
  }

  test("a failed rename aborts the publish instead of silently dropping the file") {
    // Hadoop rename reports most failures as `false` without throwing; a
    // swallowed false would delete the staged file and still commit the
    // marker — committed data loss
    val dir = Files.createTempDirectory("graft-rename").toString
    val (fs, p) = BatchCommits.fileSystem(spark, dir)
    intercept[java.io.IOException] {
      BatchCommits.renameOrThrow(fs,
        new org.apache.hadoop.fs.Path(p, "does-not-exist"),
        new org.apache.hadoop.fs.Path(p, "dest"))
    }
  }

  test("publishBatch is idempotent per batch and isolated across batches") {
    val dir = Files.createTempDirectory("graft-publish").toString
    val a = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    BatchCommits.publishBatch(a, dir, "run1", 7L)
    BatchCommits.publishBatch(a, dir, "run1", 7L) // replay: replaces, not appends
    assert(spark.read.parquet(dir).count() == 2)
    BatchCommits.publishBatch(Seq((3L, "z")).toDF("id", "v"), dir, "run1", 8L)
    assert(spark.read.parquet(dir).count() == 3, "second batch must append")
    // replaying batch 7 after batch 8 landed touches only batch 7's files
    BatchCommits.publishBatch(a, dir, "run1", 7L)
    assert(spark.read.parquet(dir).count() == 3)
    // a DIFFERENT run's batch 7 is isolated from run1's batch 7
    BatchCommits.publishBatch(Seq((9L, "w")).toDF("id", "v"), dir, "run2", 7L)
    assert(spark.read.parquet(dir).count() == 4, "cross-run batch ids must not collide")
  }
}
