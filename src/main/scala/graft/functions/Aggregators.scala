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

/** [[KmvSketch]] with the BUFFER as the output: the sorted k-minimum
  * distinct-hash array itself — the mergeable per-group state an
  * incrementally-maintained view stores and re-merges across refreshes
  * ([[graft.operators.IncrementalView]]). Two sketches over disjoint or
  * overlapping inputs union losslessly (`array_union` + keep k
  * smallest), which is what makes approx-distinct maintainable under
  * an insert stream. Negative inputs are ignored — the caller's
  * sentinel for rows that must not contribute (delete images in a
  * change feed, NULL values); the h60 hash domain is [0, 2^60), so no
  * real hash is ever negative. */
final case class KmvState(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  private val inner = KmvSketch(k)
  override def zero: Array[Long] = Array.empty[Long]
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    if (h < 0L) buf else inner.reduce(buf, h)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    inner.merge(a, b)
  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

/** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable per
  * Agarwal et al., "Mergeable Summaries", PODS 2012): at most `k` counters;
  * an untracked item with full counters decrements every counter instead of
  * inserting. Guarantees after any sequence of reduces and merges over n
  * items: est ≤ true, true − est ≤ n/k, and therefore every item with
  * true count > n/k is present in the summary.
  *
  * True sketch contract: O(k) state regardless of group size, map-side
  * partial aggregation, associative merge (sum counters, then subtract the
  * (k+1)-th largest count and drop non-positive). The summary SET is
  * order-dependent, so the gate query (q81) checks the deterministic
  * guarantees, not the set — the q38/q79 bound-verification pattern.
  *
  * Buffer is a pair of parallel arrays sorted by token: in-place count
  * bumps on hit, one compaction pass per decrement — no per-row map
  * allocation. */
final case class MisraGries(k: Int)
    extends Aggregator[String, (Array[String], Array[Long]), Map[String, Long]] {
  require(k > 0, "k must be positive")
  override def zero: (Array[String], Array[Long]) =
    (Array.empty[String], Array.empty[Long])

  override def reduce(buf: (Array[String], Array[Long]), tok: String):
      (Array[String], Array[Long]) = {
    val (ks, cs) = buf
    val i = java.util.Arrays.binarySearch(ks.asInstanceOf[Array[AnyRef]], tok)
    if (i >= 0) { cs(i) += 1L; buf }
    else if (ks.length < k) {
      val ins = -(i + 1)
      val nk = new Array[String](ks.length + 1)
      val nc = new Array[Long](ks.length + 1)
      System.arraycopy(ks, 0, nk, 0, ins); System.arraycopy(cs, 0, nc, 0, ins)
      nk(ins) = tok; nc(ins) = 1L
      System.arraycopy(ks, ins, nk, ins + 1, ks.length - ins)
      System.arraycopy(cs, ins, nc, ins + 1, ks.length - ins)
      (nk, nc)
    } else {
      // counters full: the classic decrement — the new item's single
      // occurrence cancels against one unit of every tracked counter
      var z = 0
      var j = 0
      while (j < cs.length) { cs(j) -= 1L; if (cs(j) <= 0L) z += 1; j += 1 }
      if (z == 0) buf
      else {
        val nk = new Array[String](ks.length - z)
        val nc = new Array[Long](ks.length - z)
        var src = 0; var dst = 0
        while (src < ks.length) {
          if (cs(src) > 0L) { nk(dst) = ks(src); nc(dst) = cs(src); dst += 1 }
          src += 1
        }
        (nk, nc)
      }
    }
  }

  override def merge(a: (Array[String], Array[Long]), b: (Array[String], Array[Long])):
      (Array[String], Array[Long]) = {
    if (a._1.isEmpty) return b
    if (b._1.isEmpty) return a
    // merge-join the sorted arrays, summing counts
    val (ak, ac) = a; val (bk, bc) = b
    val mk = new Array[String](ak.length + bk.length)
    val mc = new Array[Long](ak.length + bk.length)
    var i = 0; var j = 0; var d = 0
    while (i < ak.length || j < bk.length) {
      val cmp =
        if (i >= ak.length) 1
        else if (j >= bk.length) -1
        else ak(i).compareTo(bk(j))
      if (cmp < 0) { mk(d) = ak(i); mc(d) = ac(i); i += 1 }
      else if (cmp > 0) { mk(d) = bk(j); mc(d) = bc(j); j += 1 }
      else { mk(d) = ak(i); mc(d) = ac(i) + bc(j); i += 1; j += 1 }
      d += 1
    }
    if (d <= k) (java.util.Arrays.copyOf(mk, d), java.util.Arrays.copyOf(mc, d))
    else {
      // subtract the (k+1)-th largest count from all, keep positives
      val sorted = java.util.Arrays.copyOfRange(mc, 0, d)
      java.util.Arrays.sort(sorted)
      val cut = sorted(d - k - 1) // (k+1)-th largest
      var keep = 0
      var x = 0
      while (x < d) { if (mc(x) - cut > 0L) keep += 1; x += 1 }
      val nk = new Array[String](keep)
      val nc = new Array[Long](keep)
      var src = 0; var dst = 0
      while (src < d) {
        if (mc(src) - cut > 0L) { nk(dst) = mk(src); nc(dst) = mc(src) - cut; dst += 1 }
        src += 1
      }
      (nk, nc)
    }
  }

  override def finish(buf: (Array[String], Array[Long])): Map[String, Long] =
    buf._1.iterator.zip(buf._2.iterator).toMap
  override def bufferEncoder: Encoder[(Array[String], Array[Long])] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[String], Array[Long])]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
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

/** Element-wise vector mean — the aggregation kernel of k-means centroid
  * updates and cluster summaries over embedding columns. Mergeable
  * (sum[d], count) buffer: map-side partial aggregation reduces each
  * partition's vectors locally, so the exchange carries O(groups·d)
  * state, never the vectors (at 100 TB the shuffle is K centroids wide,
  * not corpus wide). Empty groups finish as an empty array. */
final case class VecMean(dims: Int)
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
  override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)
  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    require(v.length == dims, s"expected $dims dims, got ${v.length}")
    var i = 0
    while (i < dims) { b._1(i) += v(i); i += 1 }
    (b._1, b._2 + 1L)
  }
  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dims) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }
  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty
    else { val n = b._2.toDouble; b._1.iterator.map(_ / n).toSeq }
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
