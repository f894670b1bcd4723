package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.B "UDAF via Aggregator"): a weighted
  * mean with a mergeable (sum, weight) buffer — the canonical shape for
  * custom distributed aggregates (partial aggregation on the map side,
  * associative merge on the reduce side; same contract a sketch would
  * implement). Registered per-query via functions.udaf. */
/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM 2002): keep the k smallest distinct hash values; with hashes
  * uniform on [0, M) the kth minimum h_k estimates the cardinality as
  * (k-1) · M / h_k. Buffer is a bounded sorted array — true sketch
  * contract: map-side partial aggregation, associative merge, O(k)
  * state regardless of group size.
  *
  * Unlike HLL (`approx_count_distinct`, q38 — sketch internals are
  * engine-specific, rows-only check), KMV over the md5-derived
  * [[TextFunctions.h60]] family is DETERMINISTIC and replayable in the
  * DuckDB oracle with a plain row_number — the sketch itself is
  * hash-verified (q47).
  *
  * Output: (n, kth) — n = values held (< k means the group had fewer
  * distinct hashes: n IS the exact count); the estimator stays in the
  * query so both engines spell the same double arithmetic. */
final case class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], (Int, Long)] {
  override def zero: Array[Long] = Array.empty[Long]
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(buf, h)
    if (i >= 0) buf // already present
    else {
      val ins = -(i + 1)
      if (ins >= k) buf // larger than current k minima
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    b.foldLeft(a)(reduce)
  override def finish(buf: Array[Long]): (Int, Long) =
    (buf.length, if (buf.isEmpty) 0L else buf.last)
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[(Int, Long)] =
    Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
}

object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
  override def zero: (Double, Double) = (0.0, 0.0)
  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)
  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Double)): Double =
    if (r._2 == 0.0) Double.NaN else r._1 / r._2
  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
