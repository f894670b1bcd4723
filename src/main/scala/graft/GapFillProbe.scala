package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.operators.EventAnalytics.gapFillInterpolate]]:
  * a minute-grain YEAR for a handful of keys (~526k spine buckets per
  * key) with sparse observations — the spine shape the round-11 verdict
  * flagged as one sorted window task per key. Times the two-phase
  * chunked fill (default, bounded tasks) against the whole-spine window
  * (chunkBuckets past the horizon ⇒ phase 1 degenerates to one task per
  * key) and cross-checks the outputs are identical.
  *
  * Run: java <opens/cp from tools/run_verify.sh> graft.GapFillProbe [keys]
  */
object GapFillProbe {
  def main(args: Array[String]): Unit = {
    val nKeys = args.headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gapfill-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~1% observation density over a year of minutes, per key
    val year = 365 * 24 * 60
    val events = spark.range(0, nKeys.toLong * (year / 100))
      .select(
        concat(lit("k"), (col("id") % nKeys)).as("k"),
        timestamp_seconds(lit(1704067200L) + // 2024-01-01 UTC
          (col("id") / nKeys) * 6000L + (col("id") % 97) * 60L).as("t"),
        (col("id") % 1000).cast("double").as("v"))

    def run(label: String, chunkBuckets: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val cnt = graft.operators.EventAnalytics.gapFillInterpolate(
        events, "k", "t", "v", unit = "minute",
        chunkBuckets = chunkBuckets).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[gapfill-probe] $label%-12s chunk=$chunkBuckets%8d " +
        f"rows=$cnt%9d  ${dt}%6.2f s")
      (dt, cnt)
    }
    // warmup (codegen/classloading)
    run("warmup", 8192)
    val (tChunked, c1) = run("two-phase", 8192)
    val (tWhole, c2) = run("whole-spine", 1 << 30)
    assert(c1 == c2, s"row counts diverge: $c1 vs $c2")
    println(f"[gapfill-probe] keys=$nKeys spine/key≈$year speedup=" +
      f"${tWhole / tChunked}%4.2fx (two-phase $tChunked%5.2f s vs " +
      f"whole-spine $tWhole%5.2f s)")
    spark.stop()
  }
}
