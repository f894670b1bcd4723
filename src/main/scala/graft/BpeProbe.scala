package graft

import org.apache.spark.sql.SparkSession

/** Scale probe for [[graft.operators.TextAnalysis.bpeTrain]]: trains on
  * the documents table at a doubling ladder of merge counts to show the
  * carried-forward merge application costs O(k) — near-linear wall time
  * in k — after the round-12 verdict flagged the from-scratch prefix
  * re-application as O(k²) with per-round plan-depth growth.
  *
  * Run: java <opens/cp from tools/run_verify.sh> graft.BpeProbe <sfDir> [maxK]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(256)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-bpe-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def run(label: String, k: Int): Double = {
      val t0 = System.nanoTime()
      val m = graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = k)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[bpe-probe] $label%-8s k=$k%4d merges=${m.length}%4d " +
        f"last=${m.lastOption.map(_._1).getOrElse("-")}%-12s ${dt}%7.2f s" +
        f"  (${dt / k * 1000}%6.1f ms/merge)")
      dt
    }
    run("warmup", 8)
    val ks = Iterator.iterate(32)(_ * 2).takeWhile(_ <= maxK).toSeq
    val ts = ks.map(k => k -> run("ladder", k))
    for (((k1, t1), (k2, t2)) <- ts.zip(ts.tail))
      println(f"[bpe-probe] $k1%4d -> $k2%4d merges: ${t2 / t1}%4.2fx time " +
        f"for ${k2.toDouble / k1}%3.1fx merges")
    spark.stop()
  }
}
