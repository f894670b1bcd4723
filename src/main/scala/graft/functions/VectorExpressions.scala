package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the vector hot path.
  *
  * The built-in way to express a dot product — aggregate(zip_with(a, b,
  * (x,y) -> x*y), 0D, (acc,x) -> acc+x) — evaluates two higher-order
  * functions per row with a materialized intermediate array; on the
  * all-pairs similarity workloads that is the entire runtime. This
  * expression generates a tight primitive loop inside whole-stage codegen
  * (no allocation, no lambda dispatch) and falls back to an equally tight
  * interpreted loop.
  *
  * Null semantics match the built-ins: null if either side is null;
  * mismatched lengths → dot over the common prefix (callers validate
  * dimensions upstream).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dot_product expects (array<double>, array<double>), got " +
            s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  private val FnName = "graft_dot_product"

  /** Register the expression in the session's function registry (idempotent)
    * so it is usable from both the Column API and SQL text. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Injectable description for SparkSessionExtensions.injectFunction
    * (the GraftExtensions install path). */
  def functionDescription: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[DotProduct].getName, FnName),
    exprs => DotProduct(exprs(0), exprs(1)))

  /** Column-API entry point. Requires register(spark) once per session. */
  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
