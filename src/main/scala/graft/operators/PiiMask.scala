package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A21 — PII masking (pii-detection/.../PiiDetector.java:15-44).
  *
  * Exactly the reference's two patterns and mask literal, applied in the
  * same order (SSN first, then phone) over the serialized message — as
  * column-level regexp_replace, codegen'd, no UDF.
  */
object PiiMask {
  val SsnPattern = "\\d{3}-\\d{2}-\\d{4}"
  val PhonePattern = "[2-9]\\d{2}-\\d{3}-\\d{4}"
  val Mask = "###"

  def mask(c: Column): Column =
    regexp_replace(regexp_replace(c, SsnPattern, Mask), PhonePattern, Mask)

  /** Chain-stage form (PiiDetectionFn.java:46-50 masks the whole payload). */
  def maskColumn(df: DataFrame, colName: String): DataFrame =
    df.withColumn(colName, mask(col(colName)))
}
