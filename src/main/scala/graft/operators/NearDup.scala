package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Shared MinHash/LSH near-duplicate candidate generation + Jaccard
  * verification — the one implementation used by both the declared
  * registry query (q_dedup_minhash_lsh) and PipelineMain, so LSH
  * parameters and the verification threshold can't silently diverge.
  */
object NearDup {

  val DefaultNumHashes = 32
  val DefaultBands = 8
  val DefaultRowsPerBand = 4
  val DefaultThreshold = 0.8

  /** docs must have (doc_id, sh: array<string> of distinct shingles).
    * Returns verified pairs (id_a < id_b, jaccard ≥ threshold) with the
    * jaccard value. Only ids travel through the candidate distinct;
    * shingle arrays are re-attached afterwards for verification.
    */
  def verifiedPairs(
      docs: DataFrame,
      numHashes: Int = DefaultNumHashes,
      bands: Int = DefaultBands,
      rowsPerBand: Int = DefaultRowsPerBand,
      threshold: Double = DefaultThreshold): DataFrame = {
    require(numHashes >= bands * rowsPerBand,
      s"signature too short: numHashes=$numHashes < bands*rowsPerBand=" +
        s"${bands * rowsPerBand} (out-of-range bands would give every doc " +
        "an identical key → accidental all-pairs join)")
    val banded = docs
      .withColumn("sig", minHashSignature(col("sh"), numHashes))
      .withColumn("bandKey", explode(lshBandKeys(col("sig"), bands, rowsPerBand)))
      .select(col("bandKey"), col("doc_id"))
    val a = banded.select(col("bandKey"), col("doc_id").as("id_a"))
    val b = banded.select(col("bandKey").as("bk2"), col("doc_id").as("id_b"))
    val cand = a.join(b, col("bandKey") === col("bk2") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(docs.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(docs.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") === 0, 0.0)
          .otherwise(round(col("inter").cast("double") / col("uni").cast("double"), 4)))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}
