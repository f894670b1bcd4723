package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Fraction of a token array's n-gram occurrences taken by the most
  * frequent n-gram, in one codegen'd loop: build each space-joined gram
  * once, count in a hash map, track the max — O(tokens) with exact
  * string equality (the mode is over true grams, not hashes).
  *
  * Replaces the composed HOF formulation (shingle transform → array_sort
  * → longest-equal-run fold), whose per-gram UTF8String allocations and
  * O(m log m) comparisons dominated the repetition queries at corpus
  * scale — the same allocation-storm pattern [[WinnowRolling]] removed
  * from winnowing. Values are identical (same " " join, same
  * best/total division), so the q91/q96 oracles replay unchanged.
  */
case class TopGramFrac(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"top_gram_frac expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    TopGramFrac.compute(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TopGramFrac.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TopGramFrac {
  private val FnName = "graft_top_gram_frac"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => TopGramFrac(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")

  /** Column-API entry point (n must be a literal). */
  def topGramFrac(toks: Column, n: Int): Column =
    call_function(FnName, toks, lit(n))

  /** Called from both interpreted eval and generated code. NULL array
    * elements are dropped before gram formation (grams never span a
    * null) — the registered SQL function is reachable with any
    * array<string>, not just tokens() output. */
  def compute(toks: ArrayData, n: Int): Double = {
    val m = toks.numElements()
    var nonNull = 0
    var k = 0
    while (k < m) { if (!toks.isNullAt(k)) nonNull += 1; k += 1 }
    val words = new Array[String](nonNull)
    k = 0
    var w = 0
    while (k < m) {
      if (!toks.isNullAt(k)) { words(w) = toks.getUTF8String(k).toString; w += 1 }
      k += 1
    }
    val total = nonNull - n + 1
    if (total <= 0) return 0.0
    val counts = new java.util.HashMap[String, Integer](total * 2)
    val sb = new java.lang.StringBuilder()
    var best = 0
    var i = 0
    while (i < total) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val c = counts.merge(sb.toString, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      if (c > best) best = c
      i += 1
    }
    best.toDouble / total.toDouble
  }
}
