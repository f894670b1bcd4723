package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 60-bit SimHash (Charikar STOC'02) of a token array as ONE per-row
  * expression: per distinct token, the md5-derived 60-bit hash
  * contributes ±1 to each bit position; bit b of the signature is set
  * when the sum is positive.
  *
  * This replaces the explode-based formulation (tokens × 60 bit rows →
  * two shuffled aggregations): at 100 TB that shape exchanges 60× the
  * token count; this one is a shuffle-free projection inside
  * whole-stage codegen (the generated code is a single static call — the
  * md5 work dominates, so inlining the loop buys nothing).
  *
  * Value parity: the hash family is the same
  * `conv(substring(md5(t),1,15),16,10)` as [[TextFunctions.h60]], so the
  * signature replays bit-identically in the DuckDB oracle (q44) and in
  * the explode formulation it replaces.
  */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash60 expects array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(arr: Any): Any =
    SimHash60.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  private val FnName = "graft_simhash60"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, exprs => SimHash60(exprs.head), "built-in")

  /** Column-API entry point. Requires register(spark) once per session. */
  def simhash60(tokens: Column): Column = call_function(FnName, tokens)

  /** Same value as TextFunctions.h60: first 15 hex chars of md5 parsed
    * base-16 (fits in a positive long, < 2^60). */
  def h60(utf8Bytes: Array[Byte]): Long =
    h60Digest(java.security.MessageDigest.getInstance("MD5").digest(utf8Bytes))

  /** The digest→long step: 15 hex chars = bytes 0..6 fully, then the
    * high nibble of byte 7. */
  def h60Digest(digest: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    (acc << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** Called from both interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val acc = new Array[Int](60)
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]()
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null && seen.add(t.clone())) {
        val h = h60(t.getBytes)
        var b = 0
        while (b < 60) {
          acc(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }
}
