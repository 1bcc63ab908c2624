package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-proportional (topic-balanced) resampling (r12 verdict task 9):
  * cap every k-means cell of the embedding space at `perCell` keepers, so
  * an over-represented topic (the web-crawl head: boilerplate, SEO spam,
  * one viral template) cannot dominate a training mix — the standard
  * "cluster-then-cap" diversity pass (cf. the DeepMind/DataComp cluster
  * dedup-and-balance recipes in the public literature).
  *
  * Scale posture:
  *  - cells come from the shared deterministic IVF trainer
  *    ([[IvfIndex.centroids]]) and the map-side argmin assigner
  *    ([[IvfIndex.assign]]) — the corpus never shuffles for its labels;
  *  - the keep rule is a deterministic hash rank WITHIN each cell
  *    (xxhash64 of vec_id, vec_id tiebreak — zero RNG state, stable
  *    across runs/retries/partitionings);
  *  - ranking uses the [[GlobalIndex]] range-exchange ordinal over
  *    (cell, hash), NOT a per-cell window: `row_number().over(partitionBy
  *    (cell))` funnels each cell through ONE task, and cells are
  *    corpus-sized/k — the ordinal spreads every cell across range
  *    partitions, O(rows/partition) memory (the ExactPercentile shape).
  *
  * Returns (vec_id, cell, n_total) — one row per KEPT vector, with its
  * cell's pre-cap population carried for auditing.
  */
object ClusterSample {

  def balanced(spark: SparkSession, vectors: DataFrame, k: Int,
      perCell: Int): DataFrame = {
    require(k >= 1 && perCell >= 1, s"need k >= 1 and perCell >= 1: $k, $perCell")
    val cents = IvfIndex.centroids(spark, vectors, k)
    val assigned = IvfIndex.assign(vectors, cents)
      .select(col("vec_id"), col("cell"))
      .withColumn("h", xxhash64(col("vec_id")))
    // one range exchange: ordinals over (cell, hash, id) — cells are
    // contiguous in the global order, so within-cell rank is ord - o0
    val ord = GlobalIndex.withOrdinal(assigned, "ord",
      col("cell"), col("h"), col("vec_id"))
    val firsts = ord.groupBy(col("cell"))
      .agg(min(col("ord")).as("o0"), count(lit(1)).as("n_total"))
    ord.join(broadcast(firsts), "cell") // k rows, broadcast
      .filter(col("ord") - col("o0") < perCell)
      .select(col("vec_id"), col("cell"), col("n_total"))
  }
}
