package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column support: image/audio/video payloads ride as opaque
  * `BinaryType` columns with typed metadata, processed per-partition so a
  * real decoder (libjpeg/ffmpeg/...) would amortize init across a batch.
  *
  * The decode step itself is a STUB (this container has no media codecs):
  * `FakeDecoder` produces deterministic pseudo-features from the bytes. The
  * Spark-side plumbing — schema, encoders, partition-batched UDF shape,
  * column pruning of the heavy payload — is real and spec-tested; swapping
  * in a real codec changes only the body of `FakeDecoder.decode`.
  *
  * 100 TB notes: payloads never shuffle (all derivations are projections);
  * `spark.sql.files.maxPartitionBytes` bounds per-task memory since blobs
  * stream through one partition-iterator at a time; metadata-only queries
  * prune the payload column at the parquet scan.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      modality: String,     // image | audio | video
      payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      digest: String,
      feat: Array[Double])  // stubbed "embedding" of the decoded media

  /** Deterministic fake decoder: stands in for the real codec. */
  object FakeDecoder {
    /** "Decode" bytes to an 8-dim feature: windowed byte statistics. A real
      * implementation would decode pixels/samples here.
      */
    def decode(payload: Array[Byte]): Array[Double] = {
      if (payload == null || payload.isEmpty) return Array.fill(8)(0.0)
      val out = new Array[Double](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xFF).toDouble / 255.0
        i += 1
      }
      val n = math.max(1, payload.length / 8)
      out.map(x => math.rint(x / n * 1e6) / 1e6)
    }

    /** Frame-sample stub: byte offsets a video frame sampler would decode. */
    def frameOffsets(nBytes: Long, everyN: Long): Seq[Long] =
      if (nBytes <= 0 || everyN <= 0) Seq.empty
      else 0L.until(nBytes, everyN)
  }

  /** The documents fixture reinterpreted as a media table: text bytes as
    * payload. Mirrors the reference's opaque-byte-stream view of data
    * (reference/service/HdfsCopyService.java:129-134 copies blobs verbatim
    * with no payload typing).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(
        col("doc_id").as("media_id"),
        // modality assigned deterministically from the id
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        col("text").cast("binary").as("payload"),
        (pmod(col("doc_id"), lit(1920)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(1080)) + 1).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** Partition-batched feature extraction — the mapInPandas-equivalent
    * shape in Scala: one iterator per partition, decoder state amortized.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // A real decoder would be initialized once here, per partition.
      val digest = java.security.MessageDigest.getInstance("MD5")
      rows.map { m =>
        val payload = if (m.payload == null) Array.emptyByteArray else m.payload
        digest.reset()
        val hex = digest.digest(payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.modality, payload.length.toLong, hex,
          FakeDecoder.decode(payload))
      }
    }
  }

  /** Metadata-only projection (payload pruned at scan — asserted in spec). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).toDF()
      .select(
        col("media_id"), col("modality"),
        length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("digest"),
        col("width"), col("height"))
      .orderBy(col("media_id"))
}
