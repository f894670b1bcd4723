package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Rabin–Karp rolling fingerprint: the polynomial hash of every k-char
  * window of the text, computed incrementally —
  *
  *   h(i) = Σ_j cp(i+j) · B^(k-1-j)  mod M,    j in [0, k)
  *   h(i+1) = (B·(h(i) − cp(i)·B^(k-1)) + cp(i+k))  mod M
  *
  * with B = 31, M = 1e9+7 and cp = Unicode code point, so the whole
  * document hashes in O(n) instead of the O(n·k) of hashing each k-gram
  * independently (the classic primitive under winnowing, Schleimer et
  * al. SIGMOD'03 §2; [[TextFunctions.winnow]] keeps the md5-derived
  * variant for its own oracle lineage).
  *
  * Only a per-row loop can carry h(i) into h(i+1) — SQL higher-order
  * functions have no scan/fold-with-index primitive, which is exactly
  * why this is a custom codegen'd expression. The values (not the cost)
  * replay in the oracle via the direct polynomial spelling (q64).
  * Texts shorter than k yield an empty array.
  */
case class RollingFingerprint(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"rolling_fingerprint expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    RollingFingerprint.compute(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingFingerprint.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  private val FnName = "graft_rolling_fingerprint"
  val B = 31L
  val M = 1000000007L

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => RollingFingerprint(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")

  /** Column-API entry point (k must be a literal). */
  def rollingFingerprint(text: Column, k: Int): Column =
    call_function(FnName, text, lit(k))

  /** Called from both interpreted eval and generated code. */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, k: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    // B^(k-1) mod M, for the outgoing-character subtraction
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = ((h - cps(i - 1) * bk % M + M * B) % M * B + cps(i + k - 1)) % M
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}
