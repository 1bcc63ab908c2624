package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model quality scoring (CCNet-style): train an
  * add-one-smoothed unigram model on the corpus itself, score each doc by
  * its average negative log-likelihood per token. Low = in-distribution
  * fluent text; high = outlier/garbage. The shared implementation behind
  * the declared query (q_lm_score) and PipelineMain's enrichment stage.
  *
  * Determinism contract: per-doc contributions fold in SORTED token order
  * through a sequential HOF fold (`aggregate` over
  * `array_sort(collect_list(struct(token, c)))`), so the double sum is
  * identical across cluster layouts — and matches DuckDB's
  * `list_reduce(list(c ORDER BY token))` replay exactly (left fold with a
  * 0.0 seed equals first-element seeding bit-for-bit since 0.0 + x == x).
  *
  * Scale posture: the vocab agg is partial+final on (token); the per-doc
  * fold state is the doc's distinct-token list (bounded by doc length);
  * document text never shuffles — only (doc_id, token, counts) rows.
  */
object LmScore {

  /** docs must have (doc_id, toks: array<string>). Returns one row per doc
    * with ≥1 token: (doc_id, n_tokens, nll), nll rounded to 4 decimals.
    */
  def nll(docs: DataFrame): DataFrame = {
    val tokStream = docs.select(col("doc_id"), explode(col("toks")).as("token"))
    val freq = tokStream.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val totals = freq.agg(sum(col("cnt")).as("t"), count(lit(1)).as("v"))
    val tf = tokStream.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val contrib = tf.join(freq, "token").crossJoin(broadcast(totals))
      .withColumn("c",
        col("tf").cast("double") *
          log((col("cnt").cast("double") + lit(1.0)) /
              (col("t").cast("double") + col("v").cast("double"))))
    contrib.groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("token"), col("c")))).as("cs"),
        sum(col("tf")).as("n"))
      .withColumn("nll",
        round(-aggregate(col("cs"), lit(0.0),
          (acc, x) => acc + x.getField("c")) / col("n").cast("double"), 4))
      .select(col("doc_id"), col("n").as("n_tokens"), col("nll"))
  }
}
