package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver bench contract of the TERMINAL stdout line: it must
  * fit the driver's ~2000-byte stdout tail capture AND carry a
  * per-query map (VERDICT r18 item 2 — a total-only terminal line left
  * the driver's PERF per_query/scaling empty every round). */
class BenchLineSpec extends AnyFunSuite {

  // a corpus the size and shape of the real one: 184 queries named
  // qNN_some_long_suffix with second-scale timings
  private val names =
    (1 to 47).map(i => f"q$i%02d_some_relational_query_name") ++
      (50 to 99).map(i => f"q$i%02d_dedup_or_text_query_name") ++
      (100 to 197).map(i => s"q${i}_llm_pipeline_query_long_name")
  private val results: Seq[(String, Double)] =
    names.zipWithIndex.map { case (n, i) => n -> (0.15 + (i % 70) * 0.1) }

  test("terminal line fits the driver tail budget and stays one line") {
    val line = Bench.terminalLine(results, 225.938, "0.1", 0, "0.952", false)
    assert(line.length <= 1900, s"terminal line too long: ${line.length}")
    assert(!line.contains("\n"))
  }

  test("terminal line is valid JSON carrying every query at qdiv resolution") {
    val line = Bench.terminalLine(results, 225.938, "0.1", 0, "null", false)
    // minimal structural parse (no JSON lib on the main classpath):
    // extract qdiv and the queries map and check exact recoverability
    val qdiv = "\"qdiv\":(\\d+)".r.findFirstMatchIn(line).map(_.group(1).toInt)
    assert(qdiv.nonEmpty, s"no qdiv in: ${line.take(200)}")
    val entries = "\"(q\\d+)\":(-?\\d+)".r.findAllMatchIn(
      line.substring(line.indexOf("\"queries\":"))).toSeq
    assert(entries.size == results.size)
    val byPrefix = results.map { case (n, v) => n.split("_")(0) -> v }.toMap
    entries.foreach { m =>
      val want = math.round(byPrefix(m.group(1)) * qdiv.get)
      assert(m.group(2).toLong == want, s"${m.group(1)}: ${m.group(2)} != $want")
    }
    // headline fields the driver has always parsed stay present
    assert(line.contains("\"metric\":\"total\""))
    assert(line.contains("\"value\":225.938"))
    assert(line.contains("\"failed\":0"))
  }

  test("failed-query sentinel stays negative in the compact map") {
    val withFail = results.updated(3, results(3)._1 -> -1.0)
    val line = Bench.terminalLine(withFail, -1.0, "0.1", 1, "null", false)
    val p = withFail(3)._1.split("_")(0)
    assert(("\"" + p + "\":-\\d+").r.findFirstIn(line).nonEmpty)
  }

  test("ambiguous prefixes degrade to the total-only line, never a wrong map") {
    val dup = Seq("q01_a" -> 1.0, "q01_b" -> 2.0)
    val line = Bench.terminalLine(dup, 3.0, "0.1", 0, "null", false)
    assert(!line.contains("\"queries\""))
    assert(line.contains("\"value\":3.000"))
  }
}
