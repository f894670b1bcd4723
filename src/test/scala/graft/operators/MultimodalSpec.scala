package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaDf = Seq(
    (1L, "image", "fake-png-payload-abcdefgh".getBytes("UTF-8")),
    (2L, "audio", "fake-wav-payload-with-longer-content-0123456789".getBytes("UTF-8")),
    (3L, "video", Array.tabulate(1024)(i => (i % 256).toByte)))
    .toDF("media_id", "modality", "media")

  test("attachMeta: size + sha256 derived, schema matches mediaSchema shape") {
    val out = Multimodal.attachMeta(mediaDf, "media",
      when(col("modality") === "image", "png").otherwise("raw"))
    val r = out.filter(col("media_id") === 1).select("meta.*").head()
    assert(r.getAs[String]("format") == "png")
    assert(r.getAs[Long]("n_bytes") == 25L)
    assert(r.getAs[String]("sha256").matches("[0-9a-f]{64}"))
  }

  test("decodeFeatures: mapPartitions batch decode is deterministic and shaped") {
    val out = Multimodal.decodeFeatures(mediaDf, dim = 8)
    assert(out.schema("features").dataType.simpleString == "array<float>")
    val f1 = out.filter(col("media_id") === 3).select("features").as[Seq[Float]].head()
    val f2 = Multimodal.decodeFeatures(mediaDf, dim = 8)
      .filter(col("media_id") === 3).select("features").as[Seq[Float]].head()
    assert(f1 == f2)
    assert(f1.length == 8 && f1.exists(_ != 0.0f))
  }

  test("ImageIODecoder: real PNG decodes — dims, luminance features, true resize") {
    // render a real 8x4 PNG in-process: left half black, right half white
    val img = new java.awt.image.BufferedImage(8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 8; y <- 0 until 4)
      img.setRGB(x, y, if (x < 4) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray

    assert(Multimodal.ImageIODecoder.dims(png).contains((8, 4)))
    val feats = Multimodal.ImageIODecoder.features("image", png, 4)
    assert(feats.length == 4)
    assert(feats(0) == 0.0f && feats(1) == 1.0f) // black left, white right

    val resized = Multimodal.ImageIODecoder.resize(png, 2, 2)
    assert(Multimodal.ImageIODecoder.dims(resized).contains((2, 2)))

    // end-to-end through the Spark operators: dims attach per-row; the
    // text payload falls back to the -1 sentinel
    val df = Seq((1L, "image", png), (2L, "image", "not an image".getBytes("UTF-8")))
      .toDF("media_id", "modality", "media")
    val dims = Multimodal.attachImageDims(df, "media")
      .select("media_id", "width", "height").as[(Long, Int, Int)].collect()
      .map { case (k, w, h) => k -> ((w, h)) }.toMap
    assert(dims(1L) == ((8, 4)) && dims(2L) == ((-1, -1)))
    val decoded = Multimodal.decodeFeatures(df, dim = 4, decoder = Multimodal.ImageIODecoder)
      .filter(col("media_id") === 1).select("features").as[Seq[Float]].head()
    assert(decoded == feats.toSeq)
  }

  private def sineWav(sampleRate: Float = 8000f, sineMs: Int = 200,
      silenceMs: Int = 200): Array[Byte] = {
    // 16-bit mono PCM: a loud sine then silence — rendered through the
    // JDK's own WAVE writer so the fixture is a genuine .wav container
    val nSine = (sampleRate * sineMs / 1000).toInt
    val nSilence = (sampleRate * silenceMs / 1000).toInt
    val pcm = new Array[Byte](2 * (nSine + nSilence))
    for (i <- 0 until nSine) {
      val v = (math.sin(2 * math.Pi * 440 * i / sampleRate) * 20000).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSine + nSilence)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioDecoder: real WAV decodes — rate/channels/duration, RMS envelope") {
    val wav = sineWav()
    val Some((rate, channels, ms)) = Multimodal.AudioDecoder.info(wav)
    assert(rate == 8000f && channels == 1)
    assert(math.abs(ms - 400L) <= 1L, s"duration $ms")
    // envelope: first half (sine) loud, second half (silence) quiet
    val env = Multimodal.AudioDecoder.features("audio", wav, 4)
    assert(env.length == 4)
    assert(env(0) > 0.3f && env(1) > 0.3f, env.toSeq.toString)
    assert(env(2) == 0.0f && env(3) == 0.0f, env.toSeq.toString)
    // the dispatching decoder routes audio here
    assert(Multimodal.JvmDecoder.features("audio", wav, 4).toSeq == env.toSeq)
    // non-audio bytes fall back to the stub (total operator)
    val junk = "not audio".getBytes("UTF-8")
    assert(Multimodal.AudioDecoder.info(junk).isEmpty)
    assert(Multimodal.AudioDecoder.features("audio", junk, 4).toSeq ==
      Multimodal.DeterministicFakeDecoder.features("audio", junk, 4).toSeq)
  }

  test("readMediaDir: real WAV gets audio metadata; non-audio rows get sentinels") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-wav").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/tone.wav"), sineWav())
    val img = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$dir/pic.png"))

    val rows = Multimodal.readMediaDir(spark, dir)
      .select("modality", "sample_rate_hz", "channels", "duration_ms")
      .as[(String, Float, Int, Long)].collect()
      .map { case (m, sr, ch, ms) => m -> ((sr, ch, ms)) }.toMap
    assert(rows("audio")._1 == 8000f && rows("audio")._2 == 1)
    assert(math.abs(rows("audio")._3 - 400L) <= 1L)
    assert(rows("image") == ((-1.0f, -1, -1L)))
  }

  test("readMediaDir: real files through the binaryFile source, images decoded") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media").toString
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$dir/pic.png"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/clip.mp4"),
      Array.tabulate(256)(_.toByte))

    val media = Multimodal.readMediaDir(spark, dir)
    val rows = media.select("modality", "width", "height", "meta.format")
      .as[(String, Int, Int, String)].collect()
      .map { case (m, w, h, f) => m -> ((w, h, f)) }.toMap
    assert(rows("image") == ((5, 3, "png")))
    assert(rows("video") == ((-1, -1, "mp4"))) // not a decodable image
    // ids are the stable path hash; metadata is fully populated
    assert(media.select("media_id").distinct().count() == 2)
    assert(media.filter(col("meta.n_bytes") === 256L).count() == 1)
  }

  test("e2e: media files → decoded features → embedding near-dup pair") {
    val dir = java.nio.file.Files.createTempDirectory("graft-media-e2e").toString
    def write(name: String, dark: (Int, Int) => Boolean): Unit = {
      val img = new java.awt.image.BufferedImage(8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 8; y <- 0 until 8)
        img.setRGB(x, y, if (dark(x, y)) 0x202020 else 0xffffff)
      javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$dir/$name"))
    }
    write("a.png", (x, _) => x < 4) // left half dark
    write("b.png", (x, _) => x < 4) // pixel-identical to a (different file name)
    write("c.png", (_, y) => y < 4) // different content (top half dark)

    val media = Multimodal.readMediaDir(spark, dir)
    val feats = Multimodal.decodeFeatures(
        media.select("media_id", "modality", "media"),
        dim = 16, decoder = Multimodal.ImageIODecoder)
      .select(col("media_id"), col("features").as("embedding"))
    val pairs = Dedup.embeddingNearDup(feats, "media_id", "embedding",
        threshold = 0.999)
      .as[(Long, Long, Double)].collect()
    // exactly the identical-content pair, cosine ~1
    assert(pairs.length == 1 && pairs.head._3 > 0.999)
    val ids = media.filter(col("path").endsWith("a.png") || col("path").endsWith("b.png"))
      .select("media_id").as[Long].collect().toSet
    assert(Set(pairs.head._1, pairs.head._2) == ids)
  }

  test("imageNearDupPairs: recompressed/noised twins pair up, distinct images don't") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // a gradient, its pixel-identical re-render, a lightly-noised copy
    // (one corner pixel flipped), and a structurally different image
    val grad = (x: Int, y: Int) => { val v = x * 16 & 0xff; (v << 16) | (v << 8) | v }
    val noised = (x: Int, y: Int) =>
      if (x == 0 && y == 0) 0xffffff else grad(x, y)
    val stripes = (x: Int, y: Int) => if (y % 2 == 0) 0xffffff else 0
    val media = Seq(
      (1L, png(16, 16)(grad)),
      (2L, png(16, 16)(grad)),     // identical content
      (3L, png(16, 16)(noised)),   // near-identical
      (4L, png(16, 16)(stripes)),  // different
      (5L, "not an image at all".getBytes("UTF-8")) // undecodable: dropped
    ).toDF("media_id", "media")
    val pairs = Multimodal.imageNearDupPairs(media, "media_id", "media", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "identical images must pair at hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      "a one-pixel change stays within the hamming budget")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "structurally different images must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "undecodable payloads are dropped, not hashed")

    // hash determinism: same bytes, same hash, across the decode boundary
    val h = Multimodal.imagePerceptualHash(media.filter(col("media_id") <= 2), "media")
      .select("ahash").as[Long].collect()
    assert(h.length == 2 && h(0) == h(1))
  }

  test("dHash: gradient-sign family — twins pair, exposure shift is ignored") {
    import java.awt.image.BufferedImage
    def png(pixel: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(18, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 18) img.setRGB(x, y, pixel(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // DECREASING left-to-right so the rightward-drop bits actually set
    // (an all-zero hash would vacuously "match" anything all-dark)
    val grad = (x: Int, y: Int) => { val v = 200 - x * 8; (v << 16) | (v << 8) | v }
    // +40 exposure on every channel, no clipping (lum stays 104..240)
    val brighter = (x: Int, y: Int) => {
      val v = 240 - x * 8; (v << 16) | (v << 8) | v
    }
    val stripes = (x: Int, y: Int) => if (y % 2 == 0) 0xffffff else 0
    val media = Seq(
      (1L, png(grad)), (2L, png(grad)),          // identical
      (3L, png(brighter)),                       // exposure-shifted copy
      (4L, png(stripes))).toDF("media_id", "media")
    val pairs = Multimodal.imageNearDupPairs(media, "media_id", "media",
        maxHamming = 0, method = "dhash")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // gradient SIGNS are untouched by a uniform shift: the shifted copy
    // pairs at hamming 0, structure-different stripes never pair
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
    intercept[IllegalArgumentException] {
      Multimodal.imagePerceptualHash(media, "media", method = "phash")
    }
  }

  test("audioNearDupPairs: noised twin pairs, different envelope doesn't, non-audio dropped") {
    // twin = the same sine+silence with tiny per-sample noise (gain-
    // preserving — bins move but rarely cross the mean threshold);
    // different = silence-then-sine (envelope flipped in time)
    def noised(base: Array[Byte]): Array[Byte] = {
      // decode → perturb PCM samples by ±1 LSB deterministically → re-encode
      val s = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(base))
      val pcm = s.readAllBytes(); s.close()
      val out = pcm.clone()
      var i = 0
      while (i < out.length - 1) {
        if (i % 6 == 0 && out(i) != Byte.MaxValue) out(i) = (out(i) + 1).toByte
        i += 2
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(out), fmt, out.length / 2)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def silenceThenSine(): Array[Byte] = {
      val n = (8000 * 200 / 1000) * 2
      val pcm = new Array[Byte](2 * n)
      for (i <- n / 2 until n) {
        val v = (math.sin(2 * math.Pi * 440 * i / 8000.0) * 20000).toInt
        pcm(2 * i) = (v & 0xff).toByte
        pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, n)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val base = sineWav()
    val clips = Seq(
      (1L, base), (2L, base.clone()), (3L, noised(base)),
      (4L, silenceThenSine()),
      (5L, "definitely not audio".getBytes("UTF-8")))
      .toDF("clip_id", "media")
    val pairs = Multimodal.audioNearDupPairs(clips, "clip_id", "media", maxHamming = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "identical clips must pair at hamming 0")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"LSB noise stays within the hamming budget: $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L),
      "a time-flipped envelope must not pair")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "non-audio payloads are dropped, not hashed")
  }

  test("resizeImages: real images re-render at the target dims, non-images pass through") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xff0000)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val media = Seq(
      (1L, png(16, 8)), (2L, png(4, 4)),
      (3L, "not an image".getBytes("UTF-8")))
      .toDF("media_id", "media")
    val out = Multimodal.resizeImages(media, "media", 8, 8)
      .select("media_id", "media").as[(Long, Array[Byte])].collect()
      .map(r => r._1 -> r._2).toMap
    assert(out.size == 3, "resize must never drop rows")
    assert(Multimodal.ImageIODecoder.dims(out(1L)).contains((8, 8)))
    assert(Multimodal.ImageIODecoder.dims(out(2L)).contains((8, 8)))
    assert(out(3L).nonEmpty, "non-image passes through the total fallback")
  }

  test("sizeClass: log2 buckets group comparable payloads") {
    val classes = mediaDf.select(col("media_id"), Multimodal.sizeClass(col("media")).as("sc"))
      .as[(Long, Int)].collect().toMap
    assert(classes(3L) == 10) // 1024 bytes → 2^10
    assert(classes(1L) < classes(3L))
  }

  test("sampleFrames: every stride-th fixed-size frame") {
    val out = mediaDf.filter(col("media_id") === 3)
      .select(Multimodal.sampleFrames(col("media"), frameBytes = 256, stride = 2).as("frames"))
    val frames = out.as[Seq[Array[Byte]]].head()
    assert(frames.length == 2) // frames 0 and 2 of 4
    assert(frames.head.length == 256)
    assert(frames.head(0) == 0.toByte && frames(1)(0) == 0.toByte) // 512 % 256 pattern
  }

  test("payloadDedup: byte-identical media collapse; keeper is min id; dup bytes exact") {
    val payloadA = Array.fill[Byte](100)(7)
    val payloadB = Array.fill[Byte](40)(9)
    val media = Seq(
      (1L, "image", payloadA),
      (5L, "image", payloadA),             // copy of A (keeper 1)
      (3L, "image", payloadB),
      (9L, "audio", payloadA),             // same bytes, OTHER group — not a copy
      (10L, "audio", null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "modality", "media")

    val roll = Multimodal.payloadDedup(media, "media_id", "media", Seq("modality"))
      .orderBy("modality")
      .as[(String, Long, Long, Long)].collect().toList
    assert(roll == List(
      ("audio", 1L, 1L, 0L),               // null payload excluded entirely
      ("image", 3L, 2L, 100L)), roll.toString)

    val keep = Multimodal.payloadKeepers(media, "media_id", "media", Seq("modality"))
      .orderBy("modality", "sha256")
      .select("modality", "n_copies", "keeper_id")
      .as[(String, Long, Long)].collect().toList
    assert(keep.contains(("image", 2L, 1L)), s"keeper of the A pair is id 1: $keep")
    assert(keep.count(_._1 == "image") == 2 && keep.count(_._1 == "audio") == 1)

    // scale contract: blob leaves the scan as (hash, size); two hash
    // aggregates, no window, and the binary column itself is not in any
    // exchange
    val plan = Multimodal.payloadDedup(media, "media_id", "media", Seq("modality"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
  }
}
