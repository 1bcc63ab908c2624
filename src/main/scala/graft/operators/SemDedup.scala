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
  * (vec_id, cell, byte-packed SQ8 code) — ids + ~dim-byte codes through
  * the exchange, never float vectors (ScaleLint-enforced); per-key
  * fan-out is bounded by occupancy² at the [[cellsFor]] target, the same
  * blocked-candidates contract as every pair generator here. Candidate
  * pairs are scored APPROXIMATELY from the codes map-side in the join
  * output and only those clearing threshold - [[QuantMargin]] reach
  * exact verification, where the small survivor set broadcasts and the
  * float corpus streams — no full-corpus broadcast at any size (the r10
  * shape broadcast the float corpus twice, a cliff past ~10⁷ vectors).
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
  /** Margin for the quantized pre-filter: a true pair is kept for exact
    * verification whenever its SQ8-approximate cosine clears
    * `threshold - QuantMargin`. The 256-step grid's cosine error on
    * unit-scale embeddings is O(10⁻³); 0.05 is ~50× that bound, so the
    * margin band adds a thin shell of extra verify work and drops
    * essentially nothing (recall pinned by TextVectorSpec either way).
    */
  val QuantMargin: Double = 0.05

  def pairs(spark: SparkSession, vectors: DataFrame, k: Int,
      threshold: Double, nProbe: Int = 3): DataFrame = {
    require(k >= 1, s"cell count must be positive: $k")
    val cents = IvfIndex.centroids(spark, vectors, k)
    // SQ8 quantized pre-filter (r10 verdict task 1): the cell self-join
    // used to emit bare id pairs and re-attach the FULL float corpus via
    // two broadcasts — correct at the fixture, an OOM cliff past ~10⁷
    // vectors (and the two broadcasts duplicated the same table). Now
    // each side of the self-join carries its byte-packed SQ8 code
    // (~dim B/row through the exchange — shuffles scale), the
    // approximate cosine is computed map-side in the join output, and
    // only pairs clearing threshold - QuantMargin survive to exact
    // verification — where the SMALL survivor set broadcasts and the
    // float corpus STREAMS (never shuffles, never broadcasts).
    val grid = Sq8Index.train(vectors)
    val coded = Sq8Index.packCodes(Sq8Index.encode(vectors, grid), grid)
    // map-side top-nProbe cell labels; ids+codes only before ANY exchange
    val binned = IvfIndex.assignTop(vectors, cents, nProbe)
      .join(coded, "vec_id")
    val aSide = binned.select(col("vec_id").as("id_a"), col("cell"),
      col("bcode").as("code_a"), col("an2").as("an2_a"))
    val bSide = binned.select(col("vec_id").as("id_b"),
      col("cell").as("cell_b"), col("bcode").as("code_b"),
      col("an2").as("an2_b"))
    // equi key cell carries the join; id_a < id_b is a hash-join
    // post-filter, never a nested-loop condition. Approx scoring runs
    // BEFORE the distinct (one fused Sq8CodeDot per pair — norms were
    // precomputed map-side in packCodes), so the distinct dedups only
    // the thin margin-band survivor set — a pair can co-locate in up to
    // nProbe shared cells.
    val survivors = aSide.join(bSide,
        col("cell") === col("cell_b") && col("id_a") < col("id_b"))
      .withColumn("acos",
        sq8Dot(col("code_a"), col("code_b"), grid.lo, grid.step) /
          (sqrt(col("an2_a")) * sqrt(col("an2_b"))))
      .filter(col("acos") > threshold - QuantMargin)
      .select(col("id_a"), col("id_b")).distinct()
    // exact verify: survivor ids broadcast (bounded by the near-dup rate
    // + the margin shell, NOT the corpus), float vectors stream in twice
    val withA = broadcast(survivors)
      .join(vectors.select(col("vec_id").as("id_a"),
        col("embedding").as("v_a"), col("n2").as("n2_a")), "id_a")
    broadcast(withA)
      .join(vectors.select(col("vec_id").as("id_b"),
        col("embedding").as("v_b"), col("n2").as("n2_b")), "id_b")
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
