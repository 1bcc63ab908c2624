package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the multimodal plumbing: schema, deterministic stub decode,
  * digest correctness, and that metadata-only queries prune the payload
  * column at the scan.
  */
class MultimodalSpec extends SparkSpec {

  test("media table schema carries binary payload + typed metadata") {
    val ds = Multimodal.mediaTable(spark, sfDir)
    val schema = ds.schema
    schema("payload").dataType.typeName shouldBe "binary"
    schema("modality").dataType.typeName shouldBe "string"
    schema("width").dataType.typeName shouldBe "integer"
    val mods = ds.toDF().select("modality").distinct()
      .collect().map(_.getString(0)).toSet
    mods shouldBe Set("image", "audio", "video")
  }

  test("feature extraction is deterministic and digest matches payload MD5") {
    val ds = Multimodal.mediaTable(spark, sfDir).limit(20)
    val f1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    f1.map(_.digest).toSeq shouldBe f2.map(_.digest).toSeq
    f1.map(_.feat.toSeq).toSeq shouldBe f2.map(_.feat.toSeq).toSeq

    val raw = ds.collect().sortBy(_.media_id)
    val md = java.security.MessageDigest.getInstance("MD5")
    raw.zip(f1).foreach { case (m, f) =>
      md.reset()
      val hex = md.digest(m.payload).map("%02x".format(_)).mkString
      f.digest shouldBe hex
      f.n_bytes shouldBe m.payload.length.toLong
      f.feat.length shouldBe 8
    }
  }

  test("fake decoder: empty payload → zero vector; frame offsets stub") {
    Multimodal.FakeDecoder.decode(Array.emptyByteArray).toSeq shouldBe Seq.fill(8)(0.0)
    Multimodal.FakeDecoder.frameOffsets(100, 30) shouldBe Seq(0L, 30L, 60L, 90L)
    Multimodal.FakeDecoder.frameOffsets(0, 30) shouldBe Seq.empty
  }

  private def pngBytes(w: Int, h: Int, rgb: (Int, Int, Int)): Array[Byte] =
    imgBytes("png", w, h, rgb)

  private def imgBytes(fmt: String, w: Int, h: Int,
      rgb: (Int, Int, Int)): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val px = (rgb._1 << 16) | (rgb._2 << 8) | rgb._3
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, px)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("ImageDecoder decodes a real PNG: dimensions, channels, exact means") {
    val bytes = pngBytes(17, 9, (255, 0, 128))
    val d = Multimodal.ImageDecoder.decode(bytes).get
    d.width shouldBe 17
    d.height shouldBe 9
    d.channels shouldBe 3
    // solid color → exact per-channel means
    d.feat(0) shouldBe 1.0 // R
    d.feat(1) shouldBe 0.0 // G
    d.feat(2) shouldBe (128.0 / 255.0) +- 1e-6
    d.feat(4) shouldBe 0.0 // solid color → zero luminance stddev
    d.feat(7) shouldBe (17.0 / 9.0) +- 1e-6
  }

  test("ImageDecoder decodes BMP too; refuses text bytes and truncated PNGs") {
    val bmp = Multimodal.ImageDecoder.decode(imgBytes("bmp", 5, 4, (10, 20, 30))).get
    bmp.width shouldBe 5
    bmp.height shouldBe 4
    Multimodal.ImageDecoder.decode(
      "not an image at all just text".getBytes("UTF-8")) shouldBe None
    // corrupt payload with a valid PNG magic must fall back, not throw
    Multimodal.ImageDecoder.decode(pngBytes(8, 8, (1, 2, 3)).take(20)) shouldBe None
    Multimodal.ImageDecoder.decode(Array.emptyByteArray) shouldBe None
    Multimodal.ImageDecoder.decode(null) shouldBe None
  }

  /** PCM WAV bytes from explicit 16-bit mono samples (little-endian). */
  private def wavBytes(samples: Array[Short], sampleRate: Float = 8000f): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.indices.foreach { i =>
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("FrameSampler: every-Nth MJPEG frame decodes to real pixels; non-video yields none") {
    // an MJPEG stream = concatenated JPEG frames with distinct colors
    val colors = Seq((250, 10, 10), (10, 250, 10), (10, 10, 250),
      (200, 200, 10), (10, 200, 200))
    val frames = colors.map(c => imgBytes("jpg", 12, 8, c))
    val mjpeg = frames.reduce(_ ++ _)
    Multimodal.FrameSampler.frameRanges(mjpeg).size shouldBe 5
    val sampled = Multimodal.FrameSampler.sample(mjpeg, 2)
    sampled.map(_.idx) shouldBe Seq(0, 2, 4)
    sampled.foreach { f =>
      f.width shouldBe 12
      f.height shouldBe 8
    }
    // decoded pixels are the frame's color (JPEG is lossy: wide-ish band)
    sampled.head.feat(0) should be > 0.85 // red frame: R channel dominant
    sampled.head.feat(1) should be < 0.25
    // a torn tail frame is ignored, committed frames still sample
    Multimodal.FrameSampler.frameRanges(mjpeg.dropRight(1)).size shouldBe 4
    // non-video payloads produce no frames
    Multimodal.FrameSampler.sample("just text".getBytes("UTF-8"), 2) shouldBe empty
    Multimodal.FrameSampler.sample(null, 2) shouldBe empty

    // dataset pass: one row per sampled frame, nothing for non-video
    val sp = spark; import sp.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, "video", mjpeg, 12, 8, 0),
      Multimodal.MediaRow(2L, "audio", "bytes".getBytes("UTF-8"), 0, 0, 0))
    val out = Multimodal.sampleVideoFrames(media.toDS(), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    out.toSeq.sorted shouldBe Seq((1L, 0, 12), (1L, 2, 12), (1L, 4, 12))
  }

  test("FrameSampler: APP1-embedded thumbnail (own SOI/EOI) does not split the frame early") {
    // an EXIF-style thumbnail is a complete JPEG (with its own SOI/EOI)
    // living INSIDE an APP1 segment; a naive FFD9 byte scan would split
    // the outer frame at the thumbnail's EOI — the marker walk skips the
    // whole segment by its declared length
    val thumb = imgBytes("jpg", 4, 4, (10, 10, 10))
    val frame = imgBytes("jpg", 12, 8, (250, 10, 10))
    val segLen = thumb.length + 2
    val app1 = Array(0xFF.toByte, 0xE1.toByte,
      ((segLen >> 8) & 0xFF).toByte, (segLen & 0xFF).toByte) ++ thumb
    val withThumb = frame.take(2) ++ app1 ++ frame.drop(2)
    val second = imgBytes("jpg", 12, 8, (10, 250, 10))
    val stream = withThumb ++ second
    val ranges = Multimodal.FrameSampler.frameRanges(stream)
    ranges shouldBe Seq((0, withThumb.length),
      (withThumb.length, stream.length))
    // both frames still decode to real pixels despite the thumbnail
    val sampled = Multimodal.FrameSampler.sample(stream, 1)
    sampled.map(_.idx) shouldBe Seq(0, 1)
    sampled.head.feat(0) should be > 0.85 // outer red frame, not the thumb
    sampled(1).feat(1) should be > 0.85 // green frame
  }

  test("ImageResizer preserves the alpha channel on transparent PNGs") {
    val img = new java.awt.image.BufferedImage(64, 32,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    // left half opaque red, right half fully transparent
    for (y <- 0 until 32; x <- 0 until 64)
      img.setRGB(x, y, if (x < 32) 0xFFFF0000 else 0x00000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val r = Multimodal.ImageResizer.resize(bos.toByteArray, 16).get
    r.width shouldBe 16
    r.height shouldBe 8
    val out = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    out.getColorModel.hasAlpha shouldBe true
    // pixels away from the opaque/transparent boundary keep their alpha
    ((out.getRGB(1, 4) >>> 24) & 0xFF) shouldBe 255
    ((out.getRGB(14, 4) >>> 24) & 0xFF) shouldBe 0
  }

  test("ImageResizer: downscale with aspect kept, no-op under bound, refusal passthrough") {
    // 64×32 solid color → maxDim 16 ⇒ 16×8, still the same solid color
    val big = pngBytes(64, 32, (200, 40, 90))
    val r = Multimodal.ImageResizer.resize(big, 16).get
    r.width shouldBe 16
    r.height shouldBe 8
    val back = Multimodal.ImageDecoder.decode(r.payload).get
    back.width shouldBe 16
    back.height shouldBe 8
    back.feat(0) shouldBe (200.0 / 255.0) +- 0.01 // bilinear keeps solid color
    back.feat(4) shouldBe 0.0 +- 0.01             // still (near-)zero stddev
    // at-or-under the bound: byte-identical passthrough, no re-encode
    val small = pngBytes(10, 5, (1, 2, 3))
    val same = Multimodal.ImageResizer.resize(small, 16).get
    same.payload shouldBe theSameInstanceAs(small)
    same.width shouldBe 10
    // non-image bytes refuse
    Multimodal.ImageResizer.resize("not pixels".getBytes("UTF-8"), 16) shouldBe None

    // dataset pass: image shrinks, audio/corrupt pass through untouched
    val sp = spark; import sp.implicits._
    val wav = wavBytes(Array.fill(32)(100.toShort))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", big, 64, 32, 0),
      Multimodal.MediaRow(2L, "audio", wav, 0, 0, 8000))
    val out = Multimodal.resizeImages(media.toDS(), 16)
      .collect().map(r => (r.getLong(0), r.getBoolean(2), r.getInt(3),
        r.getAs[Array[Byte]]("payload").length)).sortBy(_._1)
    out(0)._2 shouldBe true
    out(0)._3 shouldBe 16
    out(0)._4 should be < big.length
    out(1) shouldBe ((2L, false, 0, wav.length))
  }

  test("AudioDecoder decodes a real PCM WAV: rate, frames, exact sample stats") {
    // 0.1 s square wave: +16384 for 4 frames, -16384 for 4, at 8 kHz
    val a = 16384.toShort
    val samples = Array.tabulate(800)(i => if ((i / 4) % 2 == 0) a else (-a).toShort)
    val d = Multimodal.AudioDecoder.decode(wavBytes(samples)).get
    d.sampleRate shouldBe 8000
    d.channels shouldBe 1
    d.frames shouldBe 800L
    d.feat(0) shouldBe (0.1 / 600.0) +- 1e-6     // duration
    d.feat(1) shouldBe (8000.0 / 48000.0) +- 1e-6 // sample rate
    d.feat(2) shouldBe 0.125                      // 1 channel / 8
    d.feat(3) shouldBe 0.5                        // mean |x|: exactly half scale
    d.feat(4) shouldBe 0.5                        // rms of a square wave == amplitude
    d.feat(5) shouldBe (199.0 / 799.0) +- 1e-6    // sign flips at every 4th frame
    d.feat(6) shouldBe 0.5                        // peak
    d.feat(7) shouldBe 0.0                        // nothing under the silence floor
  }

  test("AudioDecoder: silence reads as silence; refuses text and truncated WAVs") {
    val silent = Multimodal.AudioDecoder.decode(wavBytes(new Array[Short](100))).get
    silent.feat(3) shouldBe 0.0 // mean
    silent.feat(4) shouldBe 0.0 // rms
    silent.feat(7) shouldBe 1.0 // all-silent ratio
    Multimodal.AudioDecoder.decode(
      "definitely not audio".getBytes("UTF-8")) shouldBe None
    Multimodal.AudioDecoder.decode(
      wavBytes(Array.fill(50)(123.toShort)).take(16)) shouldBe None
    Multimodal.AudioDecoder.decode(null) shouldBe None
    // an image payload is refused by the audio sniffer (and vice versa:
    // a WAV is refused by ImageIO), so the decode chain cannot misroute
    Multimodal.AudioDecoder.decode(pngBytes(4, 4, (1, 2, 3))) shouldBe None
    Multimodal.ImageDecoder.decode(wavBytes(Array.fill(8)(5.toShort))) shouldBe None
  }

  test("extractFeatures routes decodable payloads through the real decoder") {
    val sp = spark; import sp.implicits._
    val png = pngBytes(12, 6, (40, 80, 120))
    val wav = wavBytes(Array.tabulate(64)(i => if (i % 2 == 0) 8192 else -8192)
      .map(_.toShort))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, 12, 6, 0),
      Multimodal.MediaRow(2L, "audio", "plain bytes payload".getBytes("UTF-8"), 0, 0, 16000),
      Multimodal.MediaRow(3L, "audio", wav, 0, 0, 8000))
    val feats = Multimodal.extractFeatures(media.toDS())
      .collect().sortBy(_.media_id)
    // real path: pixel means of the PNG, not byte statistics of its file
    feats(0).feat.toSeq shouldBe
      Multimodal.ImageDecoder.decode(png).get.feat.toSeq
    // fallback path: byte statistics of the raw payload
    feats(1).feat.toSeq shouldBe
      Multimodal.FakeDecoder.decode(media(1).payload).toSeq
    // real audio path: sample statistics of the decoded PCM frames
    feats(2).feat.toSeq shouldBe
      Multimodal.AudioDecoder.decode(wav).get.feat.toSeq

    val meta = Multimodal.decodeMeta(media.toDS()).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    meta(0) shouldBe ((1L, true, 12, 6))
    meta(1) shouldBe ((2L, false, 0, 0))
  }

  test("metadata-only query prunes the payload column at the parquet scan") {
    val scan = Multimodal.mediaMeta(spark, sfDir)
      .queryExecution.executedPlan.collectLeaves().mkString
    // n_bytes/digest derive from text (the payload source column), but
    // lang/source/n_chars stay unread:
    scan should include("ReadSchema")
    scan should not include "n_chars"
    scan should not include "lang"
  }

  // --- image near-dup by perceptual hash (dHash) ---

  private def noiseImg(seed: Long): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed
    for (y <- 0 until 32; x <- 0 until 32) {
      s = s * 6364136223846793005L + 1442695040888963407L
      val v = ((s >>> 33) & 0xFF).toInt
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }
  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash: encode-invariant, near for retouches, far for unrelated") {
    // same pixels through PNG and BMP encodes → identical hash (the
    // hash sees decoded pixels, not container bytes)
    val img = noiseImg(7)
    val hPng = Multimodal.PHash.dHash(png(img)).get
    val bmp = { val b = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "bmp", b); b.toByteArray }
    Multimodal.PHash.dHash(bmp).get shouldBe hPng
    // a one-pixel retouch moves ≤ a couple of gradient signs
    val touched = noiseImg(7)
    touched.setRGB(5, 1, ~touched.getRGB(5, 1) & 0xFFFFFF)
    ham(Multimodal.PHash.dHash(png(touched)).get, hPng) should be <= 2
    // unrelated noise is ~32 bits away — never inside the dup band
    ham(Multimodal.PHash.dHash(png(noiseImg(99))).get, hPng) should be >= 10
    // non-image payloads are skipped, not fatal
    Multimodal.PHash.dHash("not an image".getBytes) shouldBe None
    Multimodal.PHash.dHash(null) shouldBe None
  }

  test("imagePhashPairs == brute-force hamming ≤ 3 over all pairs") {
    val sp = spark; import sp.implicits._
    // 30 images: 6 groups of 5 nested-retouch variants (the pictureTable
    // shape) — banding must find EXACTLY the brute-force ≤3 set
    // (pigeonhole: ≤3 differing bits leave ≥1 of 4 sub-bands equal)
    val rows = (0 until 30).map { i =>
      val img = noiseImg(i / 5)
      (0 until i % 5).foreach { m =>
        val px = 4 * m + 1
        img.setRGB(px, 1, ~img.getRGB(px, 1) & 0xFFFFFF)
      }
      Multimodal.MediaRow(i.toLong, "image", png(img), 32, 32, 0)
    }
    val hashes = rows.map(r => r.media_id -> Multimodal.PHash.dHash(r.payload).get).toMap
    val want = (for {
      a <- rows; b <- rows if a.media_id < b.media_id
      d = ham(hashes(a.media_id), hashes(b.media_id)) if d <= 3
    } yield (a.media_id, b.media_id, d)).sortBy(p => (p._1, p._2))
    want should not be empty // the planted gradient yields near pairs

    val got = Multimodal.imagePhashPairs(sp.createDataset(rows))
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    got shouldBe want
  }

  test("phash index: probe == in-memory cross-pairs; torn save invisible") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 12).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg(i / 4)), 32, 32, 0))
    val batch = (100 until 106).map { i =>
      val img = noiseImg((i - 100) / 2) // shares bases 0,1,2 with corpus
      img.setRGB(9, 1, ~img.getRGB(9, 1) & 0xFFFFFF) // one-pixel retouch
      Multimodal.MediaRow(i.toLong, "image", png(img), 32, 32, 0)
    }
    val dir = java.nio.file.Files.createTempDirectory("phash").toString
    Multimodal.savePhashIndex(sp.createDataset(corpus), dir)
    ArtifactPaths.exists(dir) shouldBe true

    val got = Multimodal.matchAgainstPhashIndex(
        sp.createDataset(batch), sp, dir)
      .orderBy("media_id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // reference: brute-force hamming over batch × corpus hashes
    val ch = corpus.map(m => m.media_id -> Multimodal.PHash.dHash(m.payload).get)
    val bh = batch.map(m => m.media_id -> Multimodal.PHash.dHash(m.payload).get)
    val want = (for {
      (bi, bHash) <- bh; (ci, cHash) <- ch
      d = ham(bHash, cHash) if d <= 3
    } yield (bi, ci, d)).sortBy(p => (p._1, p._2))
    want should not be empty // retouched copies of shared bases match
    got shouldBe want
    // batch-internal pairs are NOT reported (probe semantics)
    all(got.map(_._2)) should be < 100L

    // torn save: hashes overwritten but meta missing → not a committed
    // artifact (meta-last commit marker)
    val torn = java.nio.file.Files.createTempDirectory("phash_torn").toString
    sp.createDataset(corpus).mapPartitions(rows =>
        rows.flatMap(m => Multimodal.PHash.dHash(m.payload).map(h => (m.media_id, h))))
      .toDF("media_id", "ph").write.parquet(s"$torn/hashes")
    ArtifactPaths.exists(torn) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      Multimodal.matchAgainstPhashIndex(sp.createDataset(batch), sp, torn)
  }

  test("phash artifact keyArity (r17 escape hatch): arity rides meta, " +
      "probes validate against it, compaction preserves it, legacy " +
      "meta reads as arity 1") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 12).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg(i / 4)), 32, 32, 0))
    val batch = (100 until 106).map { i =>
      val img = noiseImg((i - 100) / 2)
      img.setRGB(9, 1, ~img.getRGB(9, 1) & 0xFFFFFF)
      Multimodal.MediaRow(i.toLong, "image", png(img), 32, 32, 0)
    }
    def probe(path: String, maxHam: Int) =
      Multimodal.matchAgainstPhashIndex(sp.createDataset(batch), sp, path,
          maxHamming = maxHam)
        .orderBy("media_id", "matched_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // arity-2 artifact: 4 bands x arity 2 = 32-bit composite keys,
    // pigeonhole budget maxHamming <= 2
    val d2 = java.nio.file.Files.createTempDirectory("phash_a2").toString
    Multimodal.savePhashIndex(sp.createDataset(corpus), d2, keyArity = 2)
    Multimodal.loadPhashBanding(sp, d2) shouldBe ((Multimodal.PhashBands, 2))
    val ch = corpus.map(m => m.media_id -> Multimodal.PHash.dHash(m.payload).get)
    val bh = batch.map(m => m.media_id -> Multimodal.PHash.dHash(m.payload).get)
    val want2 = (for {
      (bi, bHash) <- bh; (ci, cHash) <- ch
      d = ham(bHash, cHash) if d <= 2
    } yield (bi, ci, d)).sortBy(p => (p._1, p._2))
    probe(d2, maxHam = 2) shouldBe want2
    // a probe past the arity-2 pigeonhole budget is refused loudly
    an[IllegalArgumentException] should be thrownBy probe(d2, maxHam = 3)
    // compaction carries the arity forward (it is part of the contract)
    val dest = java.nio.file.Files.createTempDirectory("phash_a2c").toString
    Multimodal.compactPhashIndex(sp, d2, dest)
    Multimodal.loadPhashBanding(sp, dest)._2 shouldBe 2
    // the actionable saturation remedy end-to-end: bands=8 at arity=5
    // (40-bit composite keys) keeps the FULL maxHamming=3 budget and
    // probes brute-exactly — the check-phash suggestion's shape
    val d85 = java.nio.file.Files.createTempDirectory("phash_b8a5").toString
    Multimodal.savePhashIndex(sp.createDataset(corpus), d85,
      keyArity = 5, bands = 8)
    Multimodal.loadPhashBanding(sp, d85) shouldBe ((8, 5))
    val want3full = (for {
      (bi, bHash) <- bh; (ci, cHash) <- ch
      d = ham(bHash, cHash) if d <= 3
    } yield (bi, ci, d)).sortBy(p => (p._1, p._2))
    probe(d85, maxHam = 3) shouldBe want3full
    // legacy meta (bands only): reads as arity 1, full maxHamming=3 OK
    val legacy = java.nio.file.Files.createTempDirectory("phash_leg").toString
    sp.createDataset(corpus).mapPartitions(rows =>
        rows.flatMap(m => Multimodal.PHash.dHash(m.payload).map(h => (m.media_id, h))))
      .toDF("media_id", "ph").write.parquet(s"$legacy/hashes")
    Seq(Tuple1(Multimodal.PhashBands)).toDF("bands")
      .coalesce(1).write.parquet(s"$legacy/meta")
    Multimodal.loadPhashBanding(sp, legacy) shouldBe ((Multimodal.PhashBands, 1))
    val want3 = (for {
      (bi, bHash) <- bh; (ci, cHash) <- ch
      d = ham(bHash, cHash) if d <= 3
    } yield (bi, ci, d)).sortBy(p => (p._1, p._2))
    probe(legacy, maxHam = 3) shouldBe want3
    // invalid arity refused at save
    an[IllegalArgumentException] should be thrownBy
      Multimodal.savePhashIndex(sp.createDataset(corpus),
        java.nio.file.Files.createTempDirectory("phash_bad").toString,
        keyArity = Multimodal.PhashBands)
  }

  test("dHash recall under real-world transforms: resize + JPEG re-encode " +
      "stay within maxHamming=3; unrelated images stay far (SCALE.md §phash-recall)") {
    // photo-like bases (smooth gradients + low-frequency structure + mild
    // texture) — the transform classes a crawl actually contains are
    // re-sizes and lossy re-encodes of CONTINUOUS images; pure noise is
    // the adversarial floor and is reported separately below
    def photo(seed: Int, w: Int = 64, h: Int = 64): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      val (fx, fy, ph) = (1 + rnd.nextInt(3), 1 + rnd.nextInt(3),
        rnd.nextDouble() * math.Pi)
      for (y <- 0 until h; x <- 0 until w) {
        val g = 96 + 64 * math.sin(2 * math.Pi * fx * x / w + ph) *
          math.cos(2 * math.Pi * fy * y / h)
        val t = 16 * math.sin(0.9 * x + 1.3 * y + seed)
        val v = math.max(0, math.min(255, (g + t).toInt))
        img.setRGB(x, y, (v << 16) | ((v * 3 / 4) << 8) | (v / 2))
      }
      img
    }
    def resize(img: java.awt.image.BufferedImage, w: Int, h: Int) = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
      g.dispose()
      out
    }
    def jpegRoundTrip(img: java.awt.image.BufferedImage, quality: Float) = {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg")
      assume(w.hasNext, "no JPEG writer in this JVM registry")
      val writer = w.next()
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(quality)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      writer.dispose(); ios.close()
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bos.toByteArray))
    }
    val n = 40
    val bases = (0 until n).map(photo(_))
    val h0 = bases.map(Multimodal.PHash.dHash64)
    // the crawl's transform classes: upscale 2x, downscale to 48, JPEG
    // q80, JPEG q60, downscale+JPEG (the thumbnail-repost shape)
    val transforms: Seq[(String, java.awt.image.BufferedImage => java.awt.image.BufferedImage)] = Seq(
      ("resize128", i => resize(i, 128, 128)),
      ("resize48", i => resize(i, 48, 48)),
      ("jpeg80", i => jpegRoundTrip(i, 0.8f)),
      ("jpeg60", i => jpegRoundTrip(i, 0.6f)),
      ("thumb+jpeg80", i => jpegRoundTrip(resize(i, 48, 48), 0.8f)))
    val hist = scala.collection.mutable.Map[String, Seq[Int]]()
    transforms.foreach { case (name, t) =>
      val ds = bases.indices.map(i => ham(h0(i), Multimodal.PHash.dHash64(t(bases(i)))))
      hist(name) = ds
      withClue(s"$name distances ${ds.sorted.mkString(",")}: ") {
        // the defended default: maxHamming=3 catches >= 80% of every
        // class (the residual tail is the textured-upscale worst case —
        // measured histograms in SCALE.md §phash-recall) and >= 90% of
        // the re-encode classes (the dominant crawl transform)
        ds.count(_ <= 3).toDouble / n should be >= 0.8
        if (name.startsWith("jpeg"))
          ds.count(_ <= 3).toDouble / n should be >= 0.9
      }
    }
    // unrelated photo pairs stay far outside the dup band
    val unrelated = for (i <- 0 until n; j <- i + 1 until math.min(i + 4, n))
      yield ham(h0(i), h0(j))
    all(unrelated) should be >= 8
    unrelated.count(_ <= 3) shouldBe 0
    // the adversarial floor: pure-noise images under the same transforms
    // (every pixel is high-frequency, the worst case for any perceptual
    // hash) — reported for SCALE.md, asserted only to stay below identity
    val noiseDs = (0 until 10).map { i =>
      val img = noiseImg(1000 + i)
      ham(Multimodal.PHash.dHash64(img),
        Multimodal.PHash.dHash64(jpegRoundTrip(resize(img, 48, 48), 0.8f)))
    }
    info("transform hamming histograms (n=40 photo-like):")
    hist.toSeq.sortBy(_._1).foreach { case (k, ds) =>
      val byBucket = (0 to 4).map(b => s"$b:${ds.count(_ == b)}").mkString(" ") +
        s" >4:${ds.count(_ > 4)}"
      info(f"  $k%-13s max=${ds.max} $byBucket")
    }
    info(s"  noise floor (thumb+jpeg80): ${noiseDs.sorted.mkString(",")}")
    // end-to-end recall: the pairs query catches transformed reposts
    val sp = spark; import sp.implicits._
    def pngBytes(img: java.awt.image.BufferedImage) = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val rows = bases.indices.flatMap { i =>
      Seq(Multimodal.MediaRow(i.toLong, "image", pngBytes(bases(i)), 64, 64, 0),
        Multimodal.MediaRow(1000L + i, "image",
          pngBytes(jpegRoundTrip(resize(bases(i), 48, 48), 0.8f)), 48, 48, 0))
    }
    val pairs = Multimodal.imagePhashPairs(sp.createDataset(rows))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = bases.indices.count(i => pairs.contains((i.toLong, 1000L + i)))
    caught.toDouble / n should be >= 0.9
  }

  test("phash lifecycle: keyed append grows the probe corpus; replay idempotent; collision refused") {
    val sp = spark; import sp.implicits._
    val day0 = (0 until 8).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg(i / 4)), 32, 32, 0))
    val day1 = (50 until 54).map { i =>
      val img = noiseImg((i - 50) / 2) // shares bases 0,1 with day0
      img.setRGB(13, 1, ~img.getRGB(13, 1) & 0xFFFFFF)
      Multimodal.MediaRow(i.toLong, "image", png(img), 32, 32, 0)
    }
    val batch = (100 until 104).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg((i - 100) / 2)),
        32, 32, 0))
    val dir = tmpDir("phash_lc").toString
    Multimodal.savePhashIndex(sp.createDataset(day0), dir)
    Multimodal.appendPhashIndexKeyed(sp.createDataset(day1), sp, dir, "day1")
    def probe(path: String) = Multimodal.matchAgainstPhashIndex(
        sp.createDataset(batch), sp, path)
      .orderBy("media_id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val got = probe(dir)
    // == probe against an index rebuilt over day0 ∪ day1
    val rebuilt = tmpDir("phash_lc_rb").toString
    Multimodal.savePhashIndex(sp.createDataset(day0 ++ day1), rebuilt)
    got shouldBe probe(rebuilt)
    got.map(_._2).toSet.exists(_ >= 50L) shouldBe true // appended ids match
    // replay: same batch, same key — accepted, index unchanged
    Multimodal.appendPhashIndexKeyed(sp.createDataset(day1), sp, dir, "day1")
    probe(dir) shouldBe got
    // collision: DIFFERENT rows under a committed key — refused loudly
    an[IllegalStateException] should be thrownBy
      Multimodal.appendPhashIndexKeyed(sp.createDataset(batch), sp, dir, "day1")
    // torn append (no _SUCCESS) is invisible to load
    val torn = s"$dir/appends/day2/hashes"
    Multimodal.hashMedia(sp.createDataset(batch))
      .write.parquet(torn)
    new java.io.File(s"$torn/_SUCCESS").delete() shouldBe true
    probe(dir) shouldBe got
  }

  test("phash lifecycle: probe-after-delete == rebuilt-without-ids; compact folds appends") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 12).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg(i / 4)), 32, 32, 0))
    val batch = (100 until 104).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg((i - 100) / 2)),
        32, 32, 0))
    val dir = tmpDir("phash_del").toString
    Multimodal.savePhashIndex(sp.createDataset(corpus), dir)
    def probe(path: String) = Multimodal.matchAgainstPhashIndex(
        sp.createDataset(batch), sp, path)
      .orderBy("media_id", "matched_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val before = probe(dir)
    val deleted = before.map(_._2).distinct.take(2)
    deleted should not be empty
    Tombstones.deleteIds(dir, deleted.toDF("id"))
    val after = probe(dir)
    // == probe against an index rebuilt without the deleted images
    val rebuilt = tmpDir("phash_del_rb").toString
    Multimodal.savePhashIndex(
      sp.createDataset(corpus.filterNot(m => deleted.contains(m.media_id))),
      rebuilt)
    after shouldBe probe(rebuilt)
    after.map(_._2).toSet.intersect(deleted.toSet) shouldBe empty
    // a tombstone suppresses the id in LATER appends too
    Multimodal.appendPhashIndexKeyed(
      sp.createDataset(corpus.filter(m => deleted.contains(m.media_id))),
      sp, dir, "readd")
    probe(dir) shouldBe after
    // compact: dest probe identical, appends folded, tombstones dropped
    val dest = tmpDir("phash_del_cp").toString
    Multimodal.compactPhashIndex(sp, dir, dest)
    probe(dest) shouldBe after
    val ds = Multimodal.phashStats(sp, dest)
    ds.appendSubtrees shouldBe 0
    ds.tombstones shouldBe 0L
    // rebuild over a committed artifact re-establishes meta-last: a
    // fresh save clears appends/tombstones and stays loadable
    Multimodal.savePhashIndex(sp.createDataset(corpus), dir)
    Multimodal.phashStats(sp, dir).appendSubtrees shouldBe 0
    probe(dir) shouldBe before
  }

  test("check-phash verdict: healthy quiet; subtree growth and band trims trip it") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 12).map(i =>
      Multimodal.MediaRow(i.toLong, "image", png(noiseImg(i)), 32, 32, 0))
    val dir = tmpDir("phash_check").toString
    Multimodal.savePhashIndex(sp.createDataset(corpus), dir)
    val healthy = Multimodal.phashStats(sp, dir)
    healthy.baseRows shouldBe 12L
    healthy.overCapBandKeys shouldBe 0L
    Multimodal.phashDegraded(healthy, maxSubtrees = 32) shouldBe false
    // growth axis: committed subtrees past the threshold
    Multimodal.phashDegraded(healthy.copy(appendSubtrees = 33),
      maxSubtrees = 32) shouldBe true
    // trim axis: any over-cap band key = recall is being cut
    Multimodal.phashDegraded(healthy.copy(overCapBandKeys = 1L),
      maxSubtrees = 32) shouldBe true
    // pigeonhole guard at probe time: maxHamming past the artifact's
    // banding guarantee is refused
    an[IllegalArgumentException] should be thrownBy
      Multimodal.matchAgainstPhashIndex(
        sp.createDataset(corpus), sp, dir, maxHamming = 4)
  }

  test("q_dedup_image_clusters == DedupClusters.keepers over the pairs form") {
    import org.apache.spark.sql.functions.col
    val pairs = graft.SparkEntry.queries("q_dedup_image_phash")(
      spark, "/root/testdata/sf0.001")
    val want = graft.operators.DedupClusters.keepers(
        pairs.select(col("id_a"), col("id_b")))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    want should not be empty
    val got = graft.SparkEntry.queries("q_dedup_image_clusters")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    got shouldBe want
  }

  test("rebuild-phash remediation loop (r18 task 4): plant saturation -> " +
      "check reports the suggestion -> rebuild at it, in place -> check " +
      "green + probe brute-parity at maxHamming=3") {
    val sp = spark; import sp.implicits._
    def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    // saturated corpus: 8 eight-bit sub-bands, each drawing from a
    // 2-value alphabet selected by one bit of the id — 256 EXACTLY even
    // distinct hashes, so every 16-bit key at the artifact's bands=4
    // holds 64 distinct hashes (over a 32 cap) and every arity-3
    // composite 24-bit key at bands=8 holds exactly 32 (at the cap, not
    // over it)
    // distinct-per-band by construction: low bit carries the value index
    val alphabet = Array.tabulate(8, 2)((b, v) =>
      ((mix(b.toLong) & 0x7FL) << 1) | v)
    def hash(i: Int): Long =
      (0 until 8).map(b => alphabet(b)(((i >> b) & 1)) << (8 * b))
        .reduce(_ | _)
    val corpus = (0 until 256).map(i => (i.toLong, hash(i)))
    corpus.map(_._2).distinct.size shouldBe 256
    val cap = 32
    val dir = tmpDir("phash_rebuild").toString
    Multimodal.savePhashIndexFromHashes(
      corpus.toDF("media_id", "ph"), dir) // bands=4, arity 1
    Multimodal.loadPhashBanding(sp, dir) shouldBe ((4, 1))
    // the check: saturation is real, and the suggestion comes from the
    // hottest df measured AT the target bands=8 banding (r17 ADVICE)
    val s = Multimodal.phashStats(sp, dir, maxBandDf = cap)
    s.overCapBandKeys shouldBe 16L // 4 bands x 4 two-band combos
    s.hottestBandDf8 shouldBe 128L // each 8-bit alphabet value: n/2
    Multimodal.phashDegraded(s, maxSubtrees = 32) shouldBe true
    val (sb, sa) = Multimodal.suggestedPhashBanding(s, maxBandDf = cap)
    sb shouldBe 8
    sa shouldBe 3 // 256 x (1/2)^3 = 32 = cap, first arity that clears
    // the probe set: <=3 flipped bits off planted corpus hashes
    val probes = (0 until 20).map { i =>
      val h = corpus(i * 12)._2
      val flips = (0 to (i % 3)).map(j =>
        1L << ((mix(i * 7L + j) & 63L).toInt)).reduce(_ | _)
      (9000L + i, h ^ flips)
    }
    def probeMatches(): Set[(Long, Long, Int)] = {
      val (bands, arity) = Multimodal.loadPhashBanding(sp, dir)
      HammingBands.probePairs(probes.toDF("id", "h"),
          Multimodal.loadPhashHashes(sp, dir)
            .select(col("media_id").as("id"), col("ph").as("h")),
          maxHamming = 3, bands, cap, arity)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    }
    val want = (for {
      (ip, hp) <- probes; (ic, hc) <- corpus
      d = java.lang.Long.bitCount(hp ^ hc) if d <= 3
    } yield (ip, ic, d)).toSet
    // saturated arity-1 artifact: every banded key trimmed, so only the
    // exact-hash path answers — near-dup recall has collapsed
    probeMatches().size should be < want.size
    // one command applies the suggestion in place
    Multimodal.rebuildPhashIndex(sp, dir, sb, sa)
    Multimodal.loadPhashBanding(sp, dir) shouldBe ((sb, sa))
    val s2 = Multimodal.phashStats(sp, dir, maxBandDf = cap)
    s2.overCapBandKeys shouldBe 0L
    Multimodal.phashDegraded(s2, maxSubtrees = 32) shouldBe false
    probeMatches() shouldBe want // full brute parity at maxHamming=3
  }

  test("q_dedup_image_phash: deterministic planted pairs; payloads never shuffle") {
    val df = graft.SparkEntry.queries("q_dedup_image_phash")(
      spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    rows.length should be > 0
    // consecutive nested variants differ by one pixel → every pair the
    // query reports verifies at hamming ≤ 3, and re-running is identical
    all(rows.map(_.getInt(2))) should be <= 3
    val again = graft.SparkEntry.queries("q_dedup_image_phash")(
      spark, "/root/testdata/sf0.001").collect()
    again.map(_.toString) shouldBe rows.map(_.toString)
    // scale posture: only (id, 8-byte hash) rides the band exchange
    val plan = df.queryExecution.executedPlan.toString
    plan should not include "payload"
  }
}
