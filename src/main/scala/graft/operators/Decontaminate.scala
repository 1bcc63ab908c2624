package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Eval-set decontamination: flag training docs sharing any k-token
  * shingle with a held-out split — the pre-training hygiene pass (GPT-3
  * appendix C / PaLM methodology). Shared by q_decontaminate (the
  * oracle-checked query) and PipelineMain stage 3.5 so the pipeline can
  * never drift from the checked semantics.
  *
  * Scale: equi-join on the shingle string — shuffles (shingle, id) pairs
  * only; the DISTINCT eval shingle set is a sliver of the corpus (AQE
  * broadcasts it; worst case a bucketed shuffle join, still ~linear).
  *
  * IMPORTANT: pass the RAW eval split as `evalDocs`, not a
  * deduped/filtered survivor set — an eval doc dropped upstream (e.g. by
  * exact dedup keeping a train duplicate with a smaller id) must still
  * contribute its shingles, or its text leaks into training via the
  * surviving duplicate.
  */
object Decontaminate {

  /** (doc_id, n_shared) for every train doc sharing ≥1 k-shingle with the
    * eval split. Both inputs need (doc_id, text).
    */
  def flagged(trainDocs: DataFrame, evalDocs: DataFrame, k: Int = 3): DataFrame = {
    val evSh = evalDocs
      .select(explode(TextFunctions.wordShingles(col("text"), k)).as("s"))
      .distinct()
    trainDocs
      .select(col("doc_id"), explode(TextFunctions.wordShingles(col("text"), k)).as("s"))
      .join(evSh, "s")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("s")).as("n_shared"))
  }
}
