package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** k-word shingles of a token array as ONE per-row codegen'd expression
  * — byte-identical to the higher-order-function formulation
  * `transform(sequence(1, n-k+1), j => concat_ws(" ", slice(t, j, k)))`
  * (and therefore to the DuckDB oracle replays), but with a single tight
  * loop over the row instead of an INTERPRETED lambda per shingle: HOF
  * lambdas are CodegenFallback, and the slice+concat_ws tree evaluation
  * profiled as a top executor frame in the k>=2 LSH chains (q157's k=3)
  * and the bigram passes (lmPerplexity, PMI). The k = 1 identity fast
  * path stays in [[TextFunctions.shingles]] — this expression is only
  * constructed for k >= 2.
  *
  * Semantics pinned to the general path: fewer than k tokens (including
  * the empty array) yield []; null tokens inside the array are skipped
  * by the join exactly like SQL concat_ws. A NULL token ARRAY yields
  * null here and is coalesced to [] by the caller, matching the
  * `when(...).otherwise(array())` contract.
  */
case class ShinglesK(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 2, s"ShinglesK is the k >= 2 path, got k=$k")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(arr: Any): Any =
    ShinglesK.compute(arr.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShinglesK.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglesK {
  private val Space = UTF8String.fromString(" ")
  private val Empty = new GenericArrayData(Array.empty[Any])

  /** Called from both interpreted eval and generated code. */
  def compute(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return Empty
    val out = new Array[Any](n - k + 1)
    val parts = new Array[UTF8String](k) // reused window buffer
    var j = 0
    while (j <= n - k) {
      var i = 0
      while (i < k) { parts(i) = toks.getUTF8String(j + i); i += 1 }
      // concatWs skips null inputs — the SQL concat_ws contract
      out(j) = UTF8String.concatWs(Space, parts: _*)
      j += 1
    }
    new GenericArrayData(out)
  }
}
