package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The Spark-side shape is the deliverable: schema, partitioning, batch
  * iteration, and operator signatures are real and tested; the actual
  * codec calls are STUBBED behind [[MediaDecoder]] (this container has no
  * image/audio libraries) with [[DeterministicFakeDecoder]] standing in.
  * Swapping in a JNI/javacv decoder changes one injection point, not the
  * dataflow.
  *
  * Scale notes: media rows are large (MBs); `sizeClass` gives a partition
  * key so shuffles group comparable payload sizes (avoids stragglers from
  * mixing 4 KB thumbnails with 400 MB videos in one task), and decode
  * runs via mapPartitions so per-partition decoder state (native
  * contexts, buffers) is initialized once per task, not per row — the
  * Scala analog of a Pandas-UDF batch.
  */
object Multimodal {

  /** Canonical media-table schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("media", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("format", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true),
      StructField("sha256", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** Derive intrinsic metadata for a binary payload column. */
  def attachMeta(df: DataFrame, mediaCol: String, formatCol: Column): DataFrame =
    df.withColumn("meta", struct(
      formatCol.as("format"),
      octet_length(col(mediaCol)).cast("long").as("n_bytes"),
      lower(sha2(col(mediaCol), 256)).as("sha256"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms")))

  /** Size-class partition key: log2 bucket of payload size. At 100 TB this
    * is the repartition key before decode so tasks see uniform work. */
  def sizeClass(mediaCol: Column): Column =
    floor(log(2.0, greatest(octet_length(mediaCol).cast("double"), lit(1.0)))).cast("int")

  /** Pluggable decoder boundary. Implementations MUST be serializable and
    * cheap to construct per partition. */
  trait MediaDecoder extends Serializable {
    /** Decode a payload to a fixed-width feature vector. */
    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float]
    /** Resize/transcode an image payload (stub: re-encode). */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte]
  }

  /** Deterministic stand-in for the real codecs: features are a rolling
    * byte-histogram projection — stable across runs/engines, shaped like
    * a real embedding. Real implementation would call the codec here. */
  object DeterministicFakeDecoder extends MediaDecoder {
    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float] = {
      val acc = new Array[Float](dim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          acc(i % dim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
      }
      acc
    }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      if (payload == null) null else payload.take(math.max(1, w * h))
  }

  /** Batched decode via mapPartitions: one decoder per partition, feature
    * column appended. Input must carry (media_id, modality, media). */
  def decodeFeatures(df: DataFrame, dim: Int,
      decoder: MediaDecoder = DeterministicFakeDecoder): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val enc = Encoders.row(schema)
    val mIdx = df.schema.fieldIndex("media")
    val modIdx = df.schema.fieldIndex("modality")
    df.mapPartitions { rows =>
      // per-partition decoder init happens here (native context, buffers)
      val d = decoder
      rows.map { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        val feats = d.features(r.getString(modIdx), payload, dim)
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for chunked payloads: split the binary into fixed-size
    * frames, keep every `stride`-th — pure column expressions. */
  def sampleFrames(mediaCol: Column, frameBytes: Int, stride: Int): Column = {
    val nFrames = ceil(octet_length(mediaCol).cast("double") / lit(frameBytes)).cast("int")
    filter(
      transform(sequence(lit(0), greatest(nFrames - 1, lit(0))),
        i => when(pmod(i, lit(stride)) === 0,
          substr(mediaCol, i * lit(frameBytes) + lit(1), lit(frameBytes)))),
      f => f.isNotNull)
  }
}
