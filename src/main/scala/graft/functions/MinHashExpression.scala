package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** MinHash signature (Broder '97) of a shingle array as ONE per-row
  * codegen'd expression: for seed i in [0, n), the minimum over shingles
  * of the md5-derived h60(shingle + "#" + i) — byte-identical to the
  * higher-order-function formulation over [[TextFunctions.md5Family]]
  * (and therefore to the DuckDB oracle replay in q42/q43), but with one
  * tight loop instead of n lambda-driven array materializations per row.
  *
  * Empty shingle arrays yield an all-null signature, matching
  * `array_min(transform([], …))` semantics.
  */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(arr: Any): Any =
    MinHashSig.compute(arr.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  private val FnName = "graft_minhash_sig"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")

  /** Column-API entry point (n must be a literal). */
  def minhashSig(shingles: Column, n: Int): Column =
    call_function(FnName, shingles, lit(n))

  // Per-n salt byte arrays, computed once per JVM instead of once per
  // ROW (the hot loop runs n MD5 compressions per shingle; rebuilding n
  // strings + UTF-8 encodes per row was pure allocation overhead on top).
  private val saltCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def saltsFor(n: Int): Array[Array[Byte]] =
    saltCache.computeIfAbsent(n,
      k => Array.tabulate(k)(i => ("#" + i).getBytes("UTF-8")))

  /** Called from both interpreted eval and generated code. */
  def compute(shingles: ArrayData, n: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return new GenericArrayData(new Array[Any](n)) // all null
    val md = java.security.MessageDigest.getInstance("MD5")
    val salts = saltsFor(n)
    val out = new Array[Byte](16) // reused digest buffer (no per-call alloc)
    val mins = Array.fill(n)(Long.MaxValue)
    var j = 0
    while (j < m) {
      val s = shingles.getUTF8String(j)
      if (s != null) {
        val base = s.getBytes
        var i = 0
        while (i < n) {
          md.reset()
          md.update(base)
          md.update(salts(i))
          md.digest(out, 0, 16)
          val h = SimHash60.h60Digest(out)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}
