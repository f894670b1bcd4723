package graft

import org.apache.spark.sql.SparkSession

/** ENCODE-side scale ladder for the BPE tokenizer (the mirror of
  * [[BpeProbe]], which ladders TRAINING): train a real merge list once,
  * pad it to ladder sizes with never-matching synthetic pairs (each pad
  * still costs a full literal-replace pass over the word table — the
  * plan-depth axis under test), and time [[graft.operators.TextAnalysis
  * .bpeEncode]] at k = 64 … 1024. With the chunked merge application
  * (bounded-depth projections, localCheckpoint every MergeChunk merges)
  * the ladder should be near-linear in k; the pre-chunking k-deep chain
  * could not run at all past depth ~50 (task-serialization stack
  * overflow).
  *
  * Run: java … graft.BpeEncodeProbe [sfDir] [maxK]
  */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(1024)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bpe-encode-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // the real tokenizer, trained once (the corpus exhausts near 89
    // merges at sf0.1 — pad beyond that with pairs over symbols the
    // corpus never contains, so every pad is a genuine replace pass
    // that can never match)
    val t0 = System.nanoTime()
    val real = graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = 64)
      .map(_._1)
    println(f"[encode-probe] trained ${real.length} real merges in " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    def padded(k: Int): Seq[String] =
      real ++ (real.length until k).map(i => s"§$i §${i + 1}")

    def run(label: String, k: Int): Double = {
      val m = padded(k)
      val t = System.nanoTime()
      val n = graft.operators.TextAnalysis
        .bpeEncode(docs, "doc_id", "text", m)
        .agg(org.apache.spark.sql.functions.sum("n_subwords")).collect()
        .head.getLong(0)
      val dt = (System.nanoTime() - t) / 1e9
      graft.operators.BlockRegistry.releaseAll()
      println(f"[encode-probe] $label%-8s k=$k%5d subwords=$n%12d " +
        f"${dt}%7.2f s  (${dt / k * 1000}%6.2f ms/merge)")
      dt
    }
    run("warmup", 64)
    val ks = Iterator.iterate(64)(_ * 2).takeWhile(_ <= maxK).toSeq
    val ts = ks.map(k => k -> run("ladder", k))
    for (((k1, t1), (k2, t2)) <- ts.zip(ts.tail))
      println(f"[encode-probe] $k1%5d -> $k2%5d merges: ${t2 / t1}%4.2fx " +
        f"time for ${k2.toDouble / k1}%3.1fx merges")
    spark.stop()
  }
}
