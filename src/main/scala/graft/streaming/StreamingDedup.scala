package graft.streaming

import graft.functions.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming near-duplicate detection: the MinHash+LSH pipeline of
  * [[graft.operators.Dedup.minhashLsh]] applied to a continuous ingest —
  * each arriving document is checked against everything already seen in
  * its LSH band buckets and near-dup pairs are emitted as they appear.
  *
  * Shape: per-row signature + band keys (identical hash family and
  * banding as the batch operator) → `groupByKey(band)` →
  * `flatMapGroupsWithState` holding the band's bucket as state. For a
  * new document the exact shingle-set Jaccard is verified against every
  * resident of the bucket; matches ≥ threshold emit (id_a, id_b,
  * jaccard, band).
  *
  * Scale/state design:
  *  - state per band is CAPPED at `maxBucketSize` residents (oldest
  *    evicted first) — the streaming analog of the batch operator's
  *    bucket cap: a pathological stop-shingle bucket cannot grow state
  *    or per-arrival work beyond the cap;
  *  - the band key is the shuffle key, exactly like the batch job;
  *  - a pair sharing several bands is emitted once per matching band
  *    (bands are independent state partitions — global pair dedup would
  *    itself need unbounded state); downstream `dropDuplicates` over a
  *    watermark column collapses them when required.
  */
object StreamingDedup {

  final case class Resident(id: Long, sset: Seq[String])
  final case class NearDup(id_a: Long, id_b: Long, jaccard: Double, band: String)

  def minhashLshStream(
      spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 1, numHashes: Int = 16, bands: Int = 4, rows: Int = 4,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    require(bands * rows == numHashes, "bands*rows must equal numHashes")
    import spark.implicits._
    graft.functions.MinHashSig.register(spark)

    val banded = docs.select(
        col(idCol).cast("long").as("id"),
        array_distinct(shingles(tokens(col(textCol)), shingleK)).as("sset"))
      .filter(size(col("sset")) > 0)
      .withColumn("sig", minhashSignature(col("sset"), numHashes))
      .withColumn("band", explode(bandKeys(col("sig"), bands, rows)))
      .select(col("band"), col("id"), col("sset"))
      .as[(String, Long, Seq[String])]

    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Resident], NearDup](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (band: String, arrivals: Iterator[(String, Long, Seq[String])],
         state: GroupState[Seq[Resident]]) =>
          var bucket = state.getOption.getOrElse(Seq.empty)
          val out = scala.collection.mutable.ArrayBuffer.empty[NearDup]
          arrivals.foreach { case (_, id, sset) =>
            val sa = sset.toSet
            bucket.foreach { r =>
              if (r.id != id) {
                val inter = r.sset.count(sa)
                val jac = inter.toDouble / (sa.size + r.sset.size - inter)
                if (jac >= threshold)
                  out += NearDup(math.min(id, r.id), math.max(id, r.id), jac, band)
              }
            }
            // append + cap (evict oldest): bounded state, bounded work
            bucket = (bucket :+ Resident(id, sset)).takeRight(maxBucketSize)
          }
          state.update(bucket)
          out.iterator
      }
      .toDF()
  }
}
