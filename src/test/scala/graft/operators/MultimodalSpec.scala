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
