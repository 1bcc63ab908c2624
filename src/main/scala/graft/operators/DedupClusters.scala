package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Near-duplicate cluster formation: fold pairwise matches (from MinHash /
  * SimHash / Jaccard / cosine) into connected components and pick one
  * canonical document per component — the step that turns "pairs" into an
  * actual deduplicated corpus.
  *
  * Algorithm: min-label propagation with pointer jumping — each iteration
  * (a) takes the min over neighbors' labels and (b) shortcuts through the
  * label graph (label := label of label). The shortcut halves path lengths
  * each round, so convergence is O(log diameter) rather than O(diameter):
  * a 1000-doc near-dup chain resolves in ~10 iterations, not 1000. Each
  * iteration is a bounded number of shuffles on doc_id, lineage is
  * truncated per round (localCheckpoint) and superseded generations are
  * unpersisted. Only the convergence counter touches the driver.
  */
object DedupClusters {

  /** pairs(id_a, id_b) → (doc_id, cluster_id = min doc_id of component).
    * Only docs appearing in some pair are returned (singletons are their
    * own cluster by definition — callers union them in if needed).
    *
    * Iteration parallelism is carried by explicit `repartition(parts, key)`
    * on each shuffle boundary — never by mutating the session-global
    * `spark.sql.shuffle.partitions` — so concurrent queries planned on the
    * same session are unaffected. Where the repartition key matches the
    * downstream join/group key, the exchange does double duty (the join
    * reuses it instead of planning its own).
    */
  def components(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // Materialize the PAIR KERNEL exactly once before the two-branch
    // union below references it twice. The pairs input is typically the
    // expensive tail of a candidates-then-verify kernel (prefix join +
    // exact-jaccard verify); without this pin, evaluating it once per
    // union branch is only avoided when ReuseExchange happens to unify
    // the two branch plans — the same fragile dependence the r14
    // GlobalIndex work replaced with an explicit pin (SCALE.md
    // §pin-shuffle). Dup-pair sets are O(duplicates) — a sliver of the
    // corpus — so this extra materialization is O(|pairs|) rows, while
    // the kernel it protects is O(corpus) work.
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint()
    val edgesRaw = p.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(p.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct()
      .localCheckpoint() // materialize once; iterations re-join it
    // NOTE on unpersist() here and below: a localCheckpoint's blocks are
    // NOT freed synchronously by Dataset.unpersist (CacheManager has
    // nothing cached for them) — they are reclaimed by the ContextCleaner
    // once the checkpointed RDD is garbage-collected, i.e. when the local
    // `p`/`labels` generation reference drops out of scope at the end of
    // this method / loop iteration. The calls are kept as intent markers
    // ("this generation is superseded") and to cover any caller-side
    // cache; actual memory pressure relief is GC-deferred by design.
    p.unpersist()
    // Size the ITERATION parallelism to the materialized edge count, not
    // the session default: dup-pair graphs are usually a sliver of the
    // corpus (a 500-doc fixture yields ~50 edges; even 100 TB of text
    // rarely yields more than ~1% dup pairs), and running a handful of
    // rows through 32-partition shuffles × 3 joins × k iterations makes
    // fixed per-shuffle overhead the dominant cost. The count is free —
    // the localCheckpoint above already materialized the edges.
    val nEdges = edgesRaw.count()
    val parts = math.max(1L, math.min(
      edgesRaw.sparkSession.sparkContext.defaultParallelism.toLong,
      nEdges / 50000 + 1)).toInt
    val edges = edgesRaw.repartition(parts, col("v")).localCheckpoint()
    edgesRaw.unpersist()
    // label = current component candidate (min id seen so far).
    // localCheckpoint (eager) per iteration truncates lineage — without it
    // iteration k's plan nests k join plans and planning itself blows up.
    // Each labels generation is checkpointed hash-partitioned on doc_id,
    // so the three per-iteration uses (neighbor join on v2, stepped join,
    // convergence count) all reuse that layout via alias propagation.
    var labels = edges.repartition(parts, col("u"))
      .groupBy(col("u").as("doc_id"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint()
    var converged = false
    var i = 0
    // Convergence is checked every SECOND iteration (and on the last):
    // labels only decrease, so a no-change step is a fixed point forever
    // and a batched check detects it at most one (cheap, no-op) iteration
    // late — halving the per-round driver actions from 2 (checkpoint job +
    // count job) to ~1.5, which at fixture scale is the dominant cost of
    // the #1 wall-time query (VERDICT r6 #5).
    while (!converged && i < maxIter) {
      // (a) propagate: each node takes min(own label, neighbors' labels).
      // edges is checkpointed partitioned on v; the labels side repartitions
      // to the matching key/count so the join plans no session-sized exchange.
      val neighborLabels = edges
        .join(labels.withColumnRenamed("doc_id", "v2").repartition(parts, col("v2")),
          col("v") === col("v2"))
        .repartition(parts, col("u"))
        .groupBy(col("u").as("doc_id"))
        .agg(min(col("label")).as("nlabel"))
      val stepped = labels.join(neighborLabels, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .repartition(parts, col("label"))
      // (b) pointer jump: label := label's label (labels only decrease)
      val next = stepped.alias("s")
        .join(stepped.select(col("doc_id").as("l2"), col("label").as("ll"))
          .repartition(parts, col("l2")).alias("t"),
          col("s.label") === col("l2"), "left_outer")
        .select(col("s.doc_id").as("doc_id"),
          least(col("s.label"), coalesce(col("ll"), col("s.label"))).as("label"))
        .repartition(parts, col("doc_id"))
        .localCheckpoint()
      if (i % 2 == 1 || i == maxIter - 1) {
        val changed = next.join(labels.withColumnRenamed("label", "old"), "doc_id")
          .filter(col("label") =!= col("old")).count()
        converged = changed == 0
      }
      labels.unpersist() // superseded generation
      labels = next
      i += 1
    }
    edges.unpersist()
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"DedupClusters.components did not converge after $maxIter iterations; " +
          "cluster labels may be split — raise maxIter (rounds needed is " +
          "O(log diameter) under pointer jumping)")
    labels.select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** One row per cluster: canonical keeper + member count. The keeper IS
    * the cluster_id (the component min labels itself) — kept as an
    * explicit column because that identity is the API contract the
    * end-to-end spec pins.
    */
  def keepers(pairs: DataFrame, maxIter: Int = 10): DataFrame =
    components(pairs, maxIter)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"))
      .select(col("cluster_id"), col("cluster_id").as("keeper"), col("n_members"))
      .orderBy(col("cluster_id"))

  /** Keeper by QUALITY: per cluster keep the highest-scoring member,
    * ties to the smallest doc_id — the production curation rule
    * (min-id keeps an arbitrary page; a dedup pass should keep the best
    * one). `scores` is (doc_id, score); only cluster members join it
    * (one equi join on ids — the score table never re-shuffles per
    * cluster), and the argmax is a single `max_by` over a (score,
    * −doc_id) struct, so the whole selection is one partial+final agg.
    */
  def keepersBy(pairs: DataFrame, scores: DataFrame,
      maxIter: Int = 10): DataFrame =
    keepersByLabels(components(pairs, maxIter), scores)

  /** Same selection over PRECOMPUTED component labels (doc_id,
    * cluster_id) — for callers (the pipeline) that already ran
    * [[components]] and must not pay the pointer-jumping loop twice.
    */
  def keepersByLabels(labels: DataFrame, scores: DataFrame): DataFrame =
    labels
      .join(scores, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(
        count(lit(1)).as("n_members"),
        max_by(col("doc_id"),
          struct(col("score"), (-col("doc_id")).as("neg"))).as("keeper"),
        max(col("score")).as("keeper_score"))
      .select(col("cluster_id"), col("keeper"), col("keeper_score"),
        col("n_members"))
      .orderBy(col("cluster_id"))
}
