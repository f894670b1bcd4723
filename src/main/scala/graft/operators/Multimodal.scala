package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * plumbing.
  *
  * The Spark-side shape is the deliverable: schema, partitioning, batch
  * iteration, and operator signatures are real and tested. Images decode
  * for real through [[ImageIODecoder]] (pure-JVM `javax.imageio` — PNG/
  * BMP/GIF/JPEG dims, luminance-grid features, re-rendered resize);
  * uncompressed audio decodes for real through [[AudioDecoder]]
  * (pure-JVM `javax.sound.sampled` — WAV/AIFF/AU sample rate, channels,
  * duration, RMS-envelope features). Compressed audio (mp3/flac) and
  * video codecs are STUBBED behind the same [[MediaDecoder]] boundary
  * (this container has no av libraries) with [[DeterministicFakeDecoder]]
  * standing in; [[JvmDecoder]] dispatches each modality to the most
  * capable decoder. Swapping in a JNI/javacv decoder changes one
  * injection point, not the dataflow.
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

  /** Read a directory of media files through Spark's `binaryFile` source
    * into the canonical media table: modality from the file extension,
    * media_id from the (stable) path hash, metadata attached, real image
    * dims decoded. This is how actual image/audio/video files enter the
    * engine; `pathGlobFilter`/`recursiveFileLookup` options of the
    * binaryFile source apply upstream via `spark.read` options. */
  val extensionModalities: Map[String, String] = Map(
    "png" -> "image", "jpg" -> "image", "jpeg" -> "image", "bmp" -> "image",
    "gif" -> "image", "wav" -> "audio", "mp3" -> "audio", "flac" -> "audio",
    "mp4" -> "video", "mkv" -> "video", "webm" -> "video")

  def readMediaDir(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ext = lower(element_at(split(col("path"), "\\."), -1))
    val modality = extensionModalities.foldLeft(lit("unknown")) {
      case (acc, (e, m)) => when(ext === e, m).otherwise(acc)
    }
    val raw = spark.read.format("binaryFile").load(dir)
      .select(
        col("path"),
        graft.functions.TextFunctions.h60(col("path")).as("media_id"),
        modality.as("modality"),
        col("content").as("media"))
    attachAudioMeta(
      attachImageDims(
        attachMeta(raw, "media", ext).withColumn("size_class", sizeClass(col("media"))),
        "media"),
      "media")
  }

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

  /** Real pure-JVM image decoder over `javax.imageio` (PNG/BMP/GIF/JPEG —
    * whatever the JDK's registered readers handle). Images yield a
    * deterministic nearest-neighbor luminance grid as the feature vector
    * and a true re-rendered resize; undecodable payloads (non-image
    * modalities, corrupt bytes) fall back to the deterministic stub, so
    * the operator is total either way. */
  object ImageIODecoder extends MediaDecoder {
    private def readImage(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
      if (payload == null) None
      else try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

    /** (width, height) when the payload decodes as an image. */
    def dims(payload: Array[Byte]): Option[(Int, Int)] =
      readImage(payload).map(img => (img.getWidth, img.getHeight))

    /** 64-bit average-hash (aHash) perceptual fingerprint: sample an 8×8
      * luminance grid (nearest-neighbor at grid cells, same sampling as
      * `features`), threshold each cell against the grid mean, pack the
      * 64 bits row-major. Visually-identical images (recompression,
      * minor noise, small rescale) land within a few bits of Hamming
      * distance; undecodable payloads yield None. */
    def aHash(payload: Array[Byte]): Option[Long] =
      readImage(payload).map { img =>
        val lum = new Array[Int](64)
        var i = 0
        while (i < 64) {
          val gx = math.min((i % 8) * img.getWidth / 8, img.getWidth - 1)
          val gy = math.min((i / 8) * img.getHeight / 8, img.getHeight - 1)
          val rgb = img.getRGB(gx, gy)
          lum(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          i += 1
        }
        val mean = lum.sum / 64
        var h = 0L
        i = 0
        while (i < 64) { if (lum(i) > mean) h |= (1L << i); i += 1 }
        h
      }

    /** 64-bit difference-hash (dHash): sample a 9×8 luminance grid, bit
      * (r,c) set when cell (r,c) is brighter than its RIGHT neighbor —
      * gradient signs instead of aHash's mean threshold, so the hash
      * tracks local structure and shrugs off global exposure shifts
      * that move every cell (and the mean) together. Same sampling
      * discipline as [[aHash]]; undecodable payloads yield None. */
    def dHash(payload: Array[Byte]): Option[Long] =
      readImage(payload).map { img =>
        val lum = new Array[Int](72) // 9 cols × 8 rows
        var i = 0
        while (i < 72) {
          val gx = math.min((i % 9) * img.getWidth / 9, img.getWidth - 1)
          val gy = math.min((i / 9) * img.getHeight / 8, img.getHeight - 1)
          val rgb = img.getRGB(gx, gy)
          lum(i) = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          i += 1
        }
        var h = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (lum(r * 9 + c) > lum(r * 9 + c + 1)) h |= (1L << (r * 8 + c))
            c += 1
          }
          r += 1
        }
        h
      }

    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float] =
      readImage(payload) match {
        case Some(img) =>
          val out = new Array[Float](dim)
          val side = math.max(1, math.ceil(math.sqrt(dim.toDouble)).toInt)
          var i = 0
          while (i < dim) {
            val gx = math.min((i % side) * img.getWidth / side, img.getWidth - 1)
            val gy = math.min((i / side) * img.getHeight / side, img.getHeight - 1)
            val rgb = img.getRGB(gx, gy)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            out(i) = lum / 255.0f
            i += 1
          }
          out
        case None => DeterministicFakeDecoder.features(modality, payload, dim)
      }

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      readImage(payload) match {
        case Some(img) =>
          val dst = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = dst.createGraphics()
          try g.drawImage(img, 0, 0, w, h, null) finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          bos.toByteArray
        case None => DeterministicFakeDecoder.resize(payload, w, h)
      }
  }

  /** Real pure-JVM audio decoder over `javax.sound.sampled` (WAV/AIFF/AU —
    * the JDK's registered readers; compressed codecs like mp3/flac still
    * need external libs and fall back to the stub). Features are a
    * deterministic per-bin RMS energy envelope over the PCM samples —
    * the audio analog of the image luminance grid. */
  object AudioDecoder extends MediaDecoder {
    private def stream(payload: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] =
      if (payload == null) None
      else try Option(javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload)))
      catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException |
             _: java.io.IOException => None
      }

    /** (sample_rate_hz, channels, duration_ms) when the payload decodes. */
    def info(payload: Array[Byte]): Option[(Float, Int, Long)] =
      stream(payload).map { s =>
        try {
          val f = s.getFormat
          val ms =
            if (f.getFrameRate > 0 && s.getFrameLength >= 0)
              (s.getFrameLength * 1000.0 / f.getFrameRate).toLong
            else -1L
          (f.getSampleRate, f.getChannels, ms)
        } finally s.close()
      }

    /** Per-bin RMS envelope over the normalized PCM; None when the
      * payload isn't JDK-decodable audio. */
    private[operators] def envelope(payload: Array[Byte], dim: Int): Option[Array[Float]] =
      stream(payload).flatMap { s =>
        try {
          val f = s.getFormat
          // normalize to 16-bit signed little-endian PCM
          val pcmFmt = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
            f.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem.getAudioInputStream(pcmFmt, s)
          val bytes = try pcm.readAllBytes() finally pcm.close()
          val n = bytes.length / 2
          val out = new Array[Float](dim)
          if (n > 0) {
            val counts = new Array[Int](dim)
            var i = 0
            while (i < n) {
              val lo = bytes(2 * i) & 0xff
              val hi = bytes(2 * i + 1).toInt
              val sample = ((hi << 8) | lo) / 32768.0f
              val bin = (i.toLong * dim / n).toInt
              out(bin) += sample * sample
              counts(bin) += 1
              i += 1
            }
            var b = 0
            while (b < dim) {
              out(b) = if (counts(b) == 0) 0.0f
                else math.sqrt(out(b) / counts(b)).toFloat
              b += 1
            }
          }
          Some(out)
        } catch { case _: Exception => None }
      }

    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float] =
      envelope(payload, dim)
        .getOrElse(DeterministicFakeDecoder.features(modality, payload, dim))

    /** 64-bit energy-envelope fingerprint — the audio analog of the
      * image aHash: RMS per 64 time bins, bit b set when bin b exceeds
      * the mean bin energy. Robust to gain-preserving noise and small
      * edits (they perturb a few bins past the mean), not to time
      * shifts. None when the payload isn't JDK-decodable audio. */
    def eHash(payload: Array[Byte]): Option[Long] =
      envelope(payload, 64).map { env =>
        var mean = 0.0
        var i = 0
        while (i < 64) { mean += env(i); i += 1 }
        mean /= 64.0
        var h = 0L
        i = 0
        while (i < 64) {
          if (env(i) > mean) h |= (1L << i)
          i += 1
        }
        h
      }

    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      DeterministicFakeDecoder.resize(payload, w, h) // no meaning for audio
  }

  /** Modality-dispatching pure-JVM decoder: images through [[ImageIODecoder]],
    * audio through [[AudioDecoder]], everything else (video; compressed
    * audio the JDK can't read) through the deterministic stub — the most
    * capable decoder this environment supports, total on any input. */
  object JvmDecoder extends MediaDecoder {
    def features(modality: String, payload: Array[Byte], dim: Int): Array[Float] =
      modality match {
        case "image" => ImageIODecoder.features(modality, payload, dim)
        case "audio" => AudioDecoder.features(modality, payload, dim)
        case _ => DeterministicFakeDecoder.features(modality, payload, dim)
      }
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
      ImageIODecoder.resize(payload, w, h)
  }

  /** Append real decoded audio metadata (sample_rate_hz, channels,
    * duration_ms) via mapPartitions (same batch shape as decodeFeatures);
    * -1s when the payload is not JDK-decodable audio. */
  def attachAudioMeta(df: DataFrame, mediaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("sample_rate_hz", FloatType, nullable = false),
      StructField("channels", IntegerType, nullable = false),
      StructField("duration_ms", LongType, nullable = false)))
    val enc = Encoders.row(schema)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        val (sr, ch, ms) = AudioDecoder.info(payload).getOrElse((-1.0f, -1, -1L))
        // Seq[Any], NOT Seq(...): weak numeric conformance would unify the
        // mixed Float/Int/Long elements to Seq[Float], boxing all three as
        // java.lang.Float and breaking the encoder's INT/BIGINT fields
        Row.fromSeq(r.toSeq ++ Seq[Any](sr, ch, ms))
      }
    }(enc)
  }

  /** Append real decoded (width, height) for image payloads via
    * mapPartitions (same batch shape as decodeFeatures); -1 when the
    * payload is not a decodable image. */
  def attachImageDims(df: DataFrame, mediaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("width", IntegerType, nullable = false),
      StructField("height", IntegerType, nullable = false)))
    val enc = Encoders.row(schema)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        val (w, h) = ImageIODecoder.dims(payload).getOrElse((-1, -1))
        Row.fromSeq(r.toSeq ++ Seq(w, h))
      }
    }(enc)
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

  /** Per-image perceptual hash column: (input columns…, <method> bigint)
    * — the output column is NAMED AFTER the method ("ahash" / "dhash"),
    * so hash tables built with different families can never be unioned
    * or joined silently (the two families' bits are incomparable).
    * Undecodable payloads are DROPPED (an image-dedup pass has nothing
    * to say about non-images — route those by modality first). Decoding
    * runs once per row inside mapPartitions, the decoder boundary every
    * multimodal op here uses. */
  def imagePerceptualHash(df: DataFrame, mediaCol: String,
      method: String = "ahash"): DataFrame = {
    val hashOf: Array[Byte] => Option[Long] = method match {
      case "ahash" => ImageIODecoder.aHash // mean-threshold luminance grid
      case "dhash" => ImageIODecoder.dHash // gradient signs (exposure-robust)
      case other => throw new IllegalArgumentException(
        s"unknown perceptual hash method '$other' (ahash | dhash)")
    }
    val schema = StructType(df.schema.fields :+
      StructField(method, LongType, nullable = false))
    val enc = Encoders.row(schema)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        hashOf(payload).map(h => Row.fromSeq(r.toSeq :+ h))
      }
    }(enc)
  }

  /** Near-duplicate image pairs by perceptual hash: aHash per image,
    * then EXACTLY the SimHash pigeonhole pairing ([[Dedup.simhashPairs]]
    * — 15-bit chunk buckets, in-bucket verification, exact
    * `bit_count(xor)` ≤ maxHamming). The pigeonhole guarantee covers the
    * full 64 bits: ≤3 differing bits can touch at most 3 of the 4
    * low-60 chunks, so every qualifying pair shares a bucket whether the
    * diffs fall in chunk bits or the top nibble. At 100 TB this is one
    * decode map pass + the bucketed join — no all-pairs shape, same as
    * text simhash. Returns (id_a, id_b, hamming). */
  def imageNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 3, method: String = "ahash"): DataFrame = {
    val hashed = imagePerceptualHash(
      df.select(col(idCol), col(mediaCol)), mediaCol, method)
      .select(col(idCol).as("id"), col(method).as("simhash"))
    Dedup.simhashPairs(hashed, maxHamming)
  }

  /** Batch image resize: replaces `mediaCol` with the payload re-rendered
    * at (w, h) — the normalize-before-training step. Decodable images
    * resize for real ([[ImageIODecoder]] re-render); undecodable payloads
    * pass through the decoder's total fallback, so the operator never
    * drops rows. mapPartitions at the codec boundary, one decode per
    * row, the standard shape here. */
  def resizeImages(df: DataFrame, mediaCol: String, w: Int, h: Int,
      decoder: MediaDecoder = ImageIODecoder): DataFrame = {
    require(w > 0 && h > 0, s"target dims must be positive, got ${w}x$h")
    val enc = Encoders.row(df.schema)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        Row.fromSeq(r.toSeq.updated(mIdx, decoder.resize(payload, w, h)))
      }
    }(enc)
  }

  /** Per-audio perceptual hash column: (input columns…, ehash bigint).
    * Non-audio / undecodable payloads are DROPPED, the
    * [[imagePerceptualHash]] contract. */
  def audioPerceptualHash(df: DataFrame, mediaCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("ehash", LongType, nullable = false))
    val enc = Encoders.row(schema)
    val mIdx = df.schema.fieldIndex(mediaCol)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = if (r.isNullAt(mIdx)) null else r.getAs[Array[Byte]](mIdx)
        AudioDecoder.eHash(payload).map(h => Row.fromSeq(r.toSeq :+ h))
      }
    }(enc)
  }

  /** Near-duplicate audio pairs by energy-envelope hash: eHash per clip,
    * then the SimHash pigeonhole pairing ([[Dedup.simhashPairs]]) — one
    * decode map pass + a bucketed join, the [[imageNearDupPairs]] shape.
    * Returns (id_a, id_b, hamming). */
  def audioNearDupPairs(df: DataFrame, idCol: String, mediaCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = audioPerceptualHash(
      df.select(col(idCol), col(mediaCol)), mediaCol)
      .select(col(idCol).as("id"), col("ehash").as("simhash"))
    Dedup.simhashPairs(hashed, maxHamming)
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

  /** Exact payload dedup by content hash — the first (cheapest) pass of
    * any multimodal curation pipeline: byte-identical media stored under
    * different ids collapse to one keeper per group before any decode or
    * perceptual hashing spends a cycle on the copies. Returns one row
    * per group: (groupCols…, n_media, n_distinct_payloads, dup_bytes) —
    * dup_bytes the storage the copies waste, the number a 100 TB media
    * lake watches weekly.
    *
    * Scale shape: the payload leaves the scan as (sha256, n_bytes) —
    * 72 narrow bytes per blob, the media column itself never shuffles;
    * ONE mergeable aggregate keyed (group, hash) builds the distinct
    * table (a million copies of one image cost one cell), and the group
    * rollup is a second narrow aggregate. Keeper identity (min id per
    * hash) is in the same first aggregate for callers that want the
    * drop list rather than the rollup — see [[payloadKeepers]].
    */
  def payloadDedup(df: DataFrame, idCol: String, mediaCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "payloadDedup needs group columns")
    val gs = groupCols.map(col)
    payloadKeepers(df, idCol, mediaCol, groupCols)
      .groupBy(gs: _*)
      .agg(sum(col("n_copies")).as("n_media"),
        count(lit(1)).as("n_distinct_payloads"),
        sum((col("n_copies") - lit(1L)) * col("n_bytes")).as("dup_bytes"))
  }

  /** The per-(group, payload) table behind [[payloadDedup]]:
    * (groupCols…, sha256, n_bytes, n_copies, keeper_id [min id]). The
    * ids NOT equal to their hash's keeper are the drop set. */
  def payloadKeepers(df: DataFrame, idCol: String, mediaCol: String,
      groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    df.filter(col(mediaCol).isNotNull)
      .select(gs :+ col(idCol).cast("long").as("__id")
        :+ lower(sha2(col(mediaCol), 256)).as("sha256")
        :+ octet_length(col(mediaCol)).cast("long").as("n_bytes"): _*)
      .groupBy(gs :+ col("sha256"): _*)
      .agg(max(col("n_bytes")).as("n_bytes"),
        count(lit(1)).as("n_copies"),
        min(col("__id")).as("keeper_id"))
  }
}
