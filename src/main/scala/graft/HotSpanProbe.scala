package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: skew probe for [[graft.operators.Dedup.spanExcision]] on a
  * corpus with ONE hot boilerplate span — every document carries the
  * same 16-token header plus unique filler, so a single span hash owns
  * one occurrence per document (the navigation/license-boilerplate
  * shape ExactSubstr dedup exists for). Times the shipped mergeable-
  * aggregate shape against an inline replica of the retired
  * window-partitioned shape: the window funnels the hot hash's entire
  * occurrence set into one task, the aggregate reduces it map-side to
  * one (count, min) cell.
  *
  * Usage: HotSpanProbe [nDocs] [runs]  (defaults 100000, 2)
  */
object HotSpanProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 100000
    val runs = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val span = (1 to 16).map(i => s"boiler$i").mkString(" ")
    val corpus = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit(span), concat_ws(" ",
        (1 to 24).map(i => concat(lit(s"u${i}_"), col("id"))): _*)).as("text"))
      .repartition(32).persist()
    corpus.count()

    def time1(tag: String, i: Int)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }

    // shipped shape: groupBy(hash).agg(count, min(struct)) + join back
    def aggregateShape: DataFrame = graft.operators.Dedup.spanExcision(
      corpus, "doc_id", "text", n = 16)

    // retired shape, replicated inline for the A/B: count + canonical
    // via Window.partitionBy(span_hash) — the hot hash is ONE partition
    def windowShape: DataFrame = {
      val n = 16
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__h"))
      val tokens = split(col("text"), "\\s+")
      val toks = corpus.select(col("doc_id"), tokens.as("__t"))
      val occ = toks
        .filter(size(col("__t")) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("__t")) - lit(n - 1)),
            p => struct(p.as("pos"),
              md5(concat_ws(" ", slice(col("__t"), p, lit(n)))).as("h"))))
            .as("__o"))
        .select(col("doc_id"), col("__o.pos").as("__pos"), col("__o.h").as("__h"))
      val dup = occ
        .withColumn("__c", count(lit(1)).over(w))
        .withColumn("__canon", min(struct(col("doc_id"), col("__pos"))).over(w))
        .filter(col("__c") >= 2 && !(col("doc_id") === col("__canon.doc_id") &&
          col("__pos") === col("__canon.__pos")))
        .select(col("doc_id"), col("__pos"))
      val covered = dup
        .select(col("doc_id"),
          explode(sequence(col("__pos"), col("__pos") + lit(n - 1))).as("__tp"))
        .groupBy(col("doc_id"))
        .agg(collect_set(col("__tp")).as("__cov"))
      toks.join(covered, Seq("doc_id"), "left")
        .withColumn("__cov", coalesce(col("__cov"), array().cast("array<int>")))
        .select(col("doc_id"),
          size(col("__t")).as("n_tokens"),
          size(col("__cov")).as("removed_tokens"),
          concat_ws(" ", filter(col("__t"),
            (t, i) => !array_contains(col("__cov"), i + lit(1)))).as("clean_text"))
    }

    // interleaved A/B: alternating passes so JIT warmth and page cache
    // spread across both shapes instead of favoring whichever runs last
    (1 to runs).foreach { i =>
      time1("aggregate", i)(aggregateShape)
      time1("window", i)(windowShape)
    }
    spark.stop()
  }
}
