package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster formation: fold pairwise matches (from MinHash /
  * SimHash / Jaccard / cosine) into connected components and pick one
  * canonical document per component — the step that turns "pairs" into an
  * actual deduplicated corpus.
  *
  * Algorithm: iterative min-label propagation over the undirected pair
  * graph (the standard large-graph connected-components formulation on
  * DataFrames — alternating large-star/small-star style but simplified to
  * symmetric min-neighbor joins). Each iteration is one shuffle on doc_id;
  * converges in O(log n) iterations for typical near-dup graphs whose
  * components are tiny (dup groups), so the loop count is small and bounded
  * explicitly. No driver-side graph materialization — only the
  * convergence check (a count of changed labels) touches the driver.
  */
object DedupClusters {

  /** pairs(id_a, id_b) → (doc_id, cluster_id = min doc_id of component).
    * Only docs appearing in some pair are returned (singletons are their
    * own cluster by definition — callers union them in if needed).
    */
  def components(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct()
      .localCheckpoint() // materialize once; iterations re-join it
    // label = current component candidate (min id seen so far).
    // localCheckpoint (eager) per iteration truncates lineage — without it
    // iteration k's plan nests k join plans and planning itself blows up.
    var labels = edges.groupBy(col("u").as("doc_id"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // propagate: each node takes min(own label, neighbors' labels)
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "v2"), col("v") === col("v2"))
        .groupBy(col("u").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels.join(neighborLabels, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
        .filter(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** One row per cluster: canonical keeper (min doc_id) + member count. */
  def keepers(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    components(pairs, maxIter)
      .groupBy(col("cluster_id"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_members"))
      .orderBy(col("cluster_id"))
}
