package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: ONE JSON line
  * {"metric":…,"value":N,"unit":"sec","queries":{…},"sf":…}.
  *
  * Honest-measurement choices:
  *  - a full warmup pass at sf0.001 first, so JIT/codegen compilation and
  *    classloading don't land on whichever query happens to run first;
  *  - queries run in sorted name order (stable across runs);
  *  - results are materialized through the `noop` sink — `count()` lets
  *    Catalyst prune every projection column and under-measures
  *    projection-heavy queries; noop forces full row production without
  *    paying sink I/O;
  *  - each query is timed in THREE full passes over the corpus
  *    (interleaved, so one query's samples land minutes apart) and the
  *    per-query MIN is reported: this virtualized host shows sustained
  *    multi-minute throttling windows (hypervisor steal) plus ~5s GC/
  *    load spikes, and back-to-back samples would all land in the same
  *    bad window — spread samples measure the engine, not the noise;
  *  - the cache is cleared between queries, so a query's own
  *    `.cache()` cost is inside its measurement and nothing leaks
  *    across queries.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_BENCH_ONLY=q34_…,q43_… narrows the corpus (A/B probes)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // warmup at the smallest SF: compiles codegen paths, loads classes
    names.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] WARMUP FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    graft.queries.Handoff.releaseAll()
    spark.catalog.clearCache()

    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val best = scala.collection.mutable.Map.empty[String, Double]
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    val failed = scala.collection.mutable.Set.empty[String]
    (1 to passes).foreach { pass =>
      names.foreach { name =>
        // release the PREVIOUS query's chain handoffs (registered via
        // Handoff.persist) before clearing the cache for this one
        graft.queries.Handoff.releaseAll()
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val ok =
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              // a failed query must never masquerade as a fast one
              System.err.println(s"[bench] FAILED $name (pass $pass): ${e.getClass.getName}: ${e.getMessage}")
              failed += name
              false
          }
        val t = (System.nanoTime() - t0) / 1e9
        if (ok) {
          samples(name) = t :: samples.getOrElse(name, Nil)
          if (!best.contains(name) || t < best(name)) best(name) = t
        }
      }
    }
    val results = names.map(n => n -> best.getOrElse(n, -1.0))
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val medResults = names.map(n =>
      n -> samples.get(n).map(median).getOrElse(-1.0))
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")

    // chain family: the four-stage curation chains swing ±2–3 s with
    // bench context (cache state, GC debt from neighboring queries), so
    // round-over-round comparison anchored on probes run as prose. Run
    // them back-to-back min-of-N probe-style here and carry the stable
    // numbers IN the artifact ("chains"). Not part of "value" — the
    // interleaved minima above remain the headline.
    val chainFamily = Seq(
      "q118_curation_chain_excision", "q127_curation_chain_quality",
      "q148_curation_chain_containment", "q153_chain_attrition",
      "q157_curation_chain_full", "q159_chain_attrition_full")
      .filter(names.contains)
    val chainProbeN = sys.env.getOrElse("SPARK_GRAFT_BENCH_CHAIN_PROBES", "3").toInt
    val chains =
      if (chainProbeN <= 0 || failed.nonEmpty) Map.empty[String, Double]
      else chainFamily.flatMap { name =>
        val times = (1 to chainProbeN).flatMap { _ =>
          graft.queries.Handoff.releaseAll()
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          try {
            SparkEntry.queries(name)(spark, sfDir)
              .write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch { case scala.util.control.NonFatal(_) => None }
        }
        times.minOption.map(name -> _)
      }.toMap
    val chainJson = chainFamily.flatMap(n => chains.get(n).map(v =>
      "\"" + n + "\":" + r3(v))).mkString("{", ",", "}")
    // a run with any failed query reports sentinel total -1 so the driver
    // can never mistake a broken run (failed queries contribute no time)
    // for a fast one
    val total =
      if (failed.nonEmpty) -1.0 else results.map(_._2.max(0.0)).sum
    val sfNum = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1)).getOrElse("0")
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries failed: ${failed.toSeq.sorted.mkString(",")}")
    val medJson = medResults.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    // THROTTLE SELF-DIAGNOSIS: this virtualized host shows sustained
    // uniform ~1.1x hypervisor-steal windows (BASELINE.md); compare this
    // run's per-query minima against the COMMITTED artifact (read before
    // it's overwritten below) and report the median ratio over queries
    // big enough to carry signal, so a throttled run is machine-readable
    // in the artifact instead of needing a judge-side probe.
    val fullPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_FULL", "BENCH_FULL.json")
    val committed: Map[String, Double] =
      try {
        val txt = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(fullPath)), "UTF-8")
        val key = "\"queries\":{"
        val from = txt.indexOf(key)
        if (from < 0) Map.empty
        else {
          // balanced-brace scan, not indexOf('}'): a nested value inside
          // the queries map would otherwise silently truncate the map
          // and degrade the ratio to null without warning
          val start = from + key.length
          var i = start
          var depth = 1
          while (i < txt.length && depth > 0) {
            val c = txt.charAt(i)
            if (c == '{') depth += 1 else if (c == '}') depth -= 1
            i += 1
          }
          val body = txt.substring(start, math.max(start, i - 1))
          val parsed = "\"([^\"]+)\":(-?[0-9.]+)".r.findAllMatchIn(body)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
          // loud degradation: a committed artifact whose map parses to
          // almost nothing means the format drifted, not that the run
          // was fast — say so instead of quietly reporting null
          if (depth != 0 || (body.length > 40 && parsed.size < 10))
            System.err.println(s"[bench] committed $fullPath queries map " +
              s"parsed to only ${parsed.size} entries (depth=$depth) — " +
              "format drift? median_ratio_vs_committed may degrade to null")
          parsed
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val ratios = results.collect {
      case (n, t) if t > 0 && committed.getOrElse(n, 0.0) >= 0.5 =>
        t / committed(n)
    }
    val medianRatio = if (ratios.size < 10) None else Some(median(ratios))
    val inflated = medianRatio.exists(_ >= 1.08)
    val ratioJson = medianRatio.map(r3).getOrElse("null")
    val fullLine =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"medians":$medJson,"chains":$chainJson,"median_ratio_vs_committed":$ratioJson,"uniform_inflation":$inflated,"sf":$sfNum,"failed":${failed.size}}"""
    // the driver's BENCH_r{N}.json captures only a tail of stdout, which
    // truncates the per-query map once the corpus passes ~100 queries —
    // ALSO persist the complete map as a sibling artifact so cross-round
    // per-query comparison never depends on stdout capture limits
    try java.nio.file.Files.write(java.nio.file.Paths.get(fullPath),
      (fullLine + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(e) =>
      // NonFatal only: an OOM/LinkageError here must crash the run, not
      // let it print a plausible-looking summary
      System.err.println(s"[bench] could not write $fullPath: ${e.getMessage}") }
    // full per-query line first; the compact contract line LAST — the driver
    // tail-parses the final JSON line (BENCH_r02 "parsed" was null with the
    // long line last, so the headline must be the terminal line and short)
    println(fullLine)
    println(terminalLine(results, total, sfNum, failed.size, ratioJson, inflated))
    spark.stop()
  }

  /** The driver-contract terminal stdout line.
    *
    * Round-19 fix (VERDICT r18 item 2): the driver stores only the LAST
    * ~2000 bytes of stdout and parses the FINAL JSON line, so a
    * total-only terminal line left PERF per_query/scaling EMPTY every
    * round, while the full per-query map (~5 KB at 184 queries) is too
    * long to BE the terminal line (the r02 failure). This line now
    * carries the per-query map compactly and self-describingly: keys are
    * the unique "qNN" name prefixes, values are integers in units of
    * 1/qdiv seconds, and qdiv is auto-selected (1000 → 100 → 10) as the
    * finest resolution whose line still fits the tail-capture budget
    * with headroom. Failed queries keep their negative sentinel. The
    * full-precision full-name map still prints as the FIRST stdout line
    * and persists in BENCH_FULL.json — nothing about the measurement
    * methodology changes, only what the terminal line carries. */
  private[graft] def terminalLine(results: Seq[(String, Double)],
      total: Double, sfNum: String, failedCount: Int,
      ratioJson: String, inflated: Boolean): String = {
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val base = s""""metric":"total","value":${r3(total)},"unit":"sec","sf":$sfNum,"failed":$failedCount,"median_ratio_vs_committed":$ratioJson,"uniform_inflation":$inflated"""
    val prefixes = results.map { case (n, _) => n.split("_")(0) }
    val compact =
      if (prefixes.distinct.size != prefixes.size) None // ambiguous → total-only
      else Iterator(1000, 100, 10).map { div =>
        val qs = results.zip(prefixes).map { case ((_, v), p) =>
          "\"" + p + "\":" + math.round(v * div) }.mkString("{", ",", "}")
        s"""{$base,"qdiv":$div,"queries":$qs}"""
      }.find(_.length <= 1900)
    compact.getOrElse(s"""{$base}""")
  }
}
