package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** SemDeDup-style corpus-scale semantic dedup (Abbas et al. 2023,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication" — public literature): k-means-partition the embedding
  * space, then run the EXACT cosine pair scan WITHIN each cluster only.
  * This is the production route that replaces the scaleBound-fenced
  * all-pairs baseline (q_dedup_embedding_cosine) at corpus scale —
  * pair work drops from n²/2 to Σ|cell|²/2 ≈ n·occupancy/2, linear in
  * n at fixed target occupancy.
  *
  * Clustering reuses the IVF coarse trainer ([[IvfIndex.centroids]]:
  * deterministic hash-seeded k-means with one Lloyd step) and the
  * map-side assigner ([[IvfIndex.assign]]: centroid matrix collected
  * once, shipped inside a native argmin expression — the corpus never
  * shuffles to get its cell labels).
  *
  * Scale posture (the LSH-twin rules): the within-cell self-join carries
  * (vec_id, cell) ONLY — ids through the exchange, never float vectors
  * (ScaleLint-enforced); per-key fan-out is bounded by occupancy² at the
  * [[cellsFor]] target, the same blocked-candidates contract as every
  * pair generator here; float vectors re-attach via broadcast AFTER pair
  * selection (holds to ~10⁷ corpus vectors; beyond that the documented
  * posture is Sq8 quantized pre-filtering before any float re-attach).
  *
  * Semantics vs the exact baseline: every emitted pair is exact-cosine
  * verified, so the output is a strict SUBSET of the all-pairs answer
  * (zero false positives by construction); recall is the probability
  * both members of a near-dup pair land in the same cell — pinned vs
  * the exact twin by spec, the q_dedup_embedding_lsh pattern. Abbas et
  * al. accept exactly this trade: semantic duplicates cluster together
  * by construction of the embedding space.
  */
object SemDedup {

  /** Cell count for ~`targetOccupancy` vectors per cell (the lshBitsFor
    * occupancy rule applied to cluster count): pair work per cell stays
    * ~occupancy²/2 at ANY corpus size, so the total is linear in n.
    */
  def cellsFor(n: Long, targetOccupancy: Long = 125L): Int =
    math.max(2, math.ceil(n.toDouble / math.max(1L, targetOccupancy)).toInt)

  /** Within-cell exact cosine pairs above `threshold`.
    * `vectors` must carry (vec_id, embedding, n2); returns
    * (id_a, id_b, cos) with id_a < id_b, cos rounded to 4 decimals —
    * the q_dedup_embedding_cosine output shape, directly comparable.
    *
    * `nProbe` is the SOFT-assignment width: each vector lands in its
    * top-nProbe nearest cells (native map-side expression, still zero
    * exchanges), so a near-dup pair split by one k-means boundary
    * co-locates whenever either member's probe set reaches the other's
    * cell — the standard boundary-recall fix (cf. IVF's query-side
    * multi-probe). Measured at the 2k-vector fixture against the exact
    * baseline (0.45 threshold — adversarially low for near-uniform
    * synthetic vectors): hard assignment 0.22 recall, nProbe=2 → 0.59,
    * 3 → 0.83, 4 → 0.96; real semantic duplicates sit far above the
    * threshold and co-locate much more readily. Pair work scales by
    * ≤ nProbe² at fixed occupancy — still linear in n.
    */
  def pairs(spark: SparkSession, vectors: DataFrame, k: Int,
      threshold: Double, nProbe: Int = 3): DataFrame = {
    require(k >= 1, s"cell count must be positive: $k")
    val cents = IvfIndex.centroids(spark, vectors, k)
    // map-side top-nProbe cell labels; ids-only before ANY exchange
    val binned = IvfIndex.assignTop(vectors, cents, nProbe)
    val aSide = binned.select(col("vec_id").as("id_a"), col("cell"))
    val bSide = binned.select(col("vec_id").as("id_b"),
      col("cell").as("cell_b"))
    // equi key cell carries the join; id_a < id_b is a hash-join
    // post-filter, never a nested-loop condition. A pair can co-locate
    // in up to nProbe shared cells ⇒ distinct before verification.
    val pairIds = aSide.join(bSide,
        col("cell") === col("cell_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // broadcast float re-attach AFTER pair selection (the LSH-twin rule)
    val va = broadcast(vectors.select(col("vec_id").as("id_a"),
      col("embedding").as("v_a"), col("n2").as("n2_a")))
    val vb = broadcast(vectors.select(col("vec_id").as("id_b"),
      col("embedding").as("v_b"), col("n2").as("n2_b")))
    pairIds.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos",
        dot(col("v_a"), col("v_b")) / (sqrt(col("n2_a")) * sqrt(col("n2_b"))))
      .filter(col("cos") > threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
  }

  /** The dedup DECISION: one keeper per semantic-duplicate group —
    * [[pairs]] through the shared connected-components operator, exactly
    * as the jaccard / token-span families feed [[DedupClusters]].
    */
  def keepers(spark: SparkSession, vectors: DataFrame, k: Int,
      threshold: Double, nProbe: Int = 3): DataFrame =
    DedupClusters.keepers(
      pairs(spark, vectors, k, threshold, nProbe)
        .select(col("id_a"), col("id_b")))
}
