package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: greedily pack documents into fixed token-budget
  * sequences (pre-training context windows) — the batch-prep step between
  * dedup/quality filtering and tokenizer output in an LLM data pipeline.
  *
  * Scale posture: optimal bin packing is inherently sequential, so the
  * distributed form packs WITHIN partitions — each task next-fit-packs
  * its partition's documents in doc_id order, sequences never cross
  * partitions, and the driver never sees a document. With a FIXED
  * partition count the layout is fully deterministic (hash partitioning +
  * in-partition sort are stable), independent of cluster size. Next-fit
  * (close the pack on first overflow) keeps O(1) state per doc; its
  * utilization loss vs first-fit is bounded and the standard trade for
  * streaming packers.
  */
object SeqPack {

  /** One packed document: `pack_id` is globally unique (partition id in
    * the high bits), `pos` is the document's position inside its pack.
    */
  case class PackedDoc(pack_id: Long, pos: Int, doc_id: Long, n_tokens: Long)

  /** docs must have (doc_id, n_tokens). Documents longer than `budget`
    * become singleton packs (truncation/splitting is the caller's
    * policy, not silently applied here).
    */
  def pack(docs: DataFrame, budget: Long, numPartitions: Int): Dataset[PackedDoc] = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(numPartitions > 0, s"numPartitions must be positive, got $numPartitions")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("n_tokens").cast("long"))
      .as[(Long, Long)]
      .repartition(numPartitions, col("doc_id"))
      .sortWithinPartitions("doc_id")
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId().toLong
        var packIdx = 0L
        var used = 0L
        var pos = 0
        it.map { case (docId, n) =>
          if (packIdx == 0L || used + n > budget) {
            packIdx += 1; used = 0L; pos = 0
          }
          used += n
          pos += 1
          PackedDoc((pid << 40) | packIdx, pos - 1, docId, n)
        }
      }
  }
}
