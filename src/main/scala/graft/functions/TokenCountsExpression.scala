package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term-frequency map: array<struct<term,cnt>> of a token
  * array's distinct terms, sorted by term for determinism.
  *
  * This is map-side pre-aggregation taken to its limit: the (doc, term,
  * tf) triples every TF-IDF/BM25-style pipeline needs are born inside
  * the row, so the `groupBy(doc, term)` — and its full exchange of
  * near-token-volume rows — disappears from the plan; the only
  * aggregations left run per TERM (bounded by vocabulary, map-side
  * combinable). One hash map per row, exact string equality.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("cnt", IntegerType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_counts expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    TokenCounts.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCounts {
  private val FnName = "graft_token_counts"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => TokenCounts(exprs.head), "built-in")

  def tokenCounts(toks: Column): Column = call_function(FnName, toks)

  /** Called from both interpreted eval and generated code. NULL array
    * elements are skipped, not counted — the registered SQL function is
    * reachable with any array<string>, not just tokens() output. */
  def compute(toks: ArrayData): ArrayData = {
    val m = toks.numElements()
    val counts = new java.util.TreeMap[String, Integer]() // sorted by term
    var i = 0
    while (i < m) {
      if (!toks.isNullAt(i))
        counts.merge(toks.getUTF8String(i).toString, Integer.valueOf(1),
          (a: Integer, b: Integer) => Integer.valueOf(a.intValue + b.intValue))
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = InternalRow(UTF8String.fromString(e.getKey),
        Integer.valueOf(e.getValue.intValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}
