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

/** The full winnowing pass over the Rabin–Karp recurrence in ONE tight
  * loop: k-gram hashes (same h(i) recurrence as [[RollingFingerprint]]),
  * sliding w-window minima via a monotonic deque (O(n), zero per-window
  * allocation), then sort + in-place dedup — semantically identical to
  * `array_sort(array_distinct(transform(…, array_min(slice(…)))))` over
  * [[RollingFingerprint]]'s output, but without materializing a slice
  * array per position. The HOF formulation allocates ~n intermediate
  * arrays per document and was the measured bottleneck of corpus-scale
  * winnowing (q85 at sf1-equivalent: the hash swap alone bought 12%,
  * this loop is what removes the allocation storm). Values replay in
  * the oracle exactly like the HOF version (q65's polynomial CTE).
  */
case class WinnowRolling(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_rolling expects string, got ${other.simpleString}")
    }

  override def nullSafeEval(s: Any): Any =
    RollingFingerprint.winnowCompute(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.RollingFingerprint.winnowCompute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  private val FnName = "graft_rolling_fingerprint"
  private val WinnowFnName = "graft_winnow_rolling"
  val B = 31L
  val M = 1000000007L

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => RollingFingerprint(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      WinnowFnName, exprs => WinnowRolling(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()), "built-in")
  }

  /** Column-API entry point for [[WinnowRolling]] (k, w literals). */
  def winnowRollingNative(text: Column, k: Int, w: Int): Column =
    call_function(WinnowFnName, text, lit(k), lit(w))

  /** Called from both interpreted eval and generated code: grams by the
    * rolling recurrence, window minima by monotonic deque, sorted
    * distinct output. */
  def winnowCompute(s: org.apache.spark.unsafe.types.UTF8String,
      k: Int, w: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val n = cps.length
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val m = n - k + 1
    val grams = new Array[Long](m)
    var bk = 1L
    var i = 0
    while (i < k - 1) { bk = bk * B % M; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * B + cps(i)) % M; i += 1 }
    grams(0) = h
    i = 1
    while (i <= n - k) {
      h = ((h - cps(i - 1) * bk % M + M * B) % M * B + cps(i + k - 1)) % M
      grams(i) = h
      i += 1
    }
    val mins: Array[Long] =
      if (m < w) {
        var mn = grams(0)
        i = 1
        while (i < m) { if (grams(i) < mn) mn = grams(i); i += 1 }
        Array(mn)
      } else {
        val out = new Array[Long](m - w + 1)
        val dq = new Array[Int](m)
        var head = 0
        var tail = 0
        i = 0
        while (i < m) {
          while (tail > head && grams(dq(tail - 1)) >= grams(i)) tail -= 1
          dq(tail) = i
          tail += 1
          if (dq(head) <= i - w) head += 1
          if (i >= w - 1) out(i - w + 1) = grams(dq(head))
          i += 1
        }
        out
      }
    java.util.Arrays.sort(mins)
    var u = 0
    i = 1
    while (i < mins.length) {
      if (mins(i) != mins(u)) { u += 1; mins(u) = mins(i) }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, u + 1))
  }

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
