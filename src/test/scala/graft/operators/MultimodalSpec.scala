package graft.operators

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

  test("extractFeatures routes decodable payloads through the real decoder") {
    val sp = spark; import sp.implicits._
    val png = pngBytes(12, 6, (40, 80, 120))
    val media = Seq(
      Multimodal.MediaRow(1L, "image", png, 12, 6, 0),
      Multimodal.MediaRow(2L, "audio", "plain bytes payload".getBytes("UTF-8"), 0, 0, 16000))
    val feats = Multimodal.extractFeatures(media.toDS())
      .collect().sortBy(_.media_id)
    // real path: pixel means of the PNG, not byte statistics of its file
    feats(0).feat.toSeq shouldBe
      Multimodal.ImageDecoder.decode(png).get.feat.toSeq
    // fallback path: byte statistics of the raw payload
    feats(1).feat.toSeq shouldBe
      Multimodal.FakeDecoder.decode(media(1).payload).toSeq

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
}
