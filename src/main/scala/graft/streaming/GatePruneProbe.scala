package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the near-dup gate's per-file index pruning at a
  * years-of-ingest-shaped index: build the band index from N seen
  * documents, range-compact it to `targetFiles`, then for a small
  * arriving batch report how many index files the candidate join
  * opens under (a) bp-prefix pruning alone vs (b) the per-file
  * footer-range prune layered under it. The measured quantity is the
  * I/O amplification a steady-state gate pays per micro-batch — at
  * scale the index is orders of magnitude larger than any batch, so
  * files-opened is the cost that matters, not rows-compared.
  *
  * Usage: GatePruneProbe [nDocs] [targetFiles] [batchDocs]
  */
object GatePruneProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(20000)
    val targetFiles = args.lift(1).map(_.toInt).getOrElse(1024)
    val batchDocs = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gate-prune-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val idx = java.nio.file.Files.createTempDirectory("graft-gateprobe-idx").toString
    val out = java.nio.file.Files.createTempDirectory("graft-gateprobe-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-gateprobe-ckpt").toString

    // distinct synthetic docs: 12 tokens each, all unique shingle sets
    def text(i: Long): String =
      (0 until 12).map(j => s"tok${i}x$j").mkString(" ")
    val seen = spark.range(0, nDocs.toLong)
      .select(col("id").as("doc_id"))
      .withColumn("text", udf(text _).apply(col("doc_id")))
    StreamingNearDupGate.processBatch(seen, 0L, "doc_id", "text",
      idx, out, ckpt, 1, 16, 4, 4, 0.8, 1000)
    StreamingNearDupGate.compactIndex(spark, idx, targetFiles = targetFiles)

    val allFiles = {
      val it = new java.io.File(idx).listFiles().filter(_.getName.startsWith("bp="))
      it.map(d => d.listFiles().count(_.getName.startsWith("part-"))).sum
    }

    // an arriving batch: near-dups of a few seen docs (the steady-state
    // shape — most bands hit existing prefixes)
    val batch = StreamingNearDupGate.bandRows(
      spark.range(0, batchDocs.toLong)
        .select((col("id") + 1000000L).as("doc_id"))
        .withColumn("text", udf((i: Long) => text(i - 1000000L)).apply(col("doc_id"))),
      "doc_id", "text", 1, 16, 4, 4)
    val bands = batch.select(col("band"), col("bp")).distinct()
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val prefixes = bands.map(_._2).distinct
    val prefixOnly = prefixes.map { pre =>
      val d = new java.io.File(s"$idx/bp=$pre")
      if (d.exists()) d.listFiles().count(_.getName.startsWith("part-")) else 0
    }.sum
    val t0 = System.nanoTime()
    val kept = StreamingNearDupGate.statsPrunedIndexFiles(spark, idx, bands)
    val pruneSec = (System.nanoTime() - t0) / 1e9

    println(f"index: $nDocs%d docs, ${nDocs * 4}%d band rows, $allFiles%d files " +
      f"after compact(targetFiles=$targetFiles%d)")
    println(f"batch: $batchDocs%d docs, ${bands.size}%d bands over ${prefixes.size}%d prefixes")
    println(f"files opened: prefix-only $prefixOnly%d -> file-pruned ${kept.size}%d " +
      f"(${prefixOnly.toDouble / math.max(kept.size, 1)}%.1fx fewer; prune pass $pruneSec%.2fs)")
    spark.stop()
  }
}
