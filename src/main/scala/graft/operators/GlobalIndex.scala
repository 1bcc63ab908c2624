package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Stable global ordinal (1-based `row_number() OVER (ORDER BY keys)`)
  * without the single-partition window that the naive SQL plans — the
  * classic need when assigning example ids / shard slots to a corpus.
  *
  * Plan: range-repartition on the keys (the SAME exchange a global sort
  * needs anyway — no extra shuffle), sort within partitions, then a
  * zipWithIndex two-pass: job 1 counts rows per partition (a Long per
  * partition to the driver, never payload), the cumulative offsets ship
  * back inside the closure, and each partition stamps offset + local
  * running index map-side. The count job re-reads the sort's shuffle
  * files (skipped map stages), so the input is scanned once and the
  * reduce-side sort runs twice — at 100 TB this stays a two-pass
  * O(rows/partition) operation with no driver or single-task hotspot,
  * where `row_number() OVER (ORDER BY …)` with no PARTITION BY funnels
  * the entire table through one task.
  *
  * The ordinal is deterministic iff `keys` is a total order (unique key
  * set): partition boundaries may vary with range sampling, but the
  * global sorted sequence — and hence each row's ordinal — does not.
  */
object GlobalIndex {

  def withOrdinal(df: DataFrame, ordName: String, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "GlobalIndex.withOrdinal: at least one ordering key")
    require(!df.columns.exists(_.equalsIgnoreCase(ordName)),
      s"GlobalIndex.withOrdinal: column '$ordName' already exists in ${df.columns.mkString(", ")}")
    val spark = df.sparkSession
    val n = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val sorted = df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*)
    val outSchema = StructType(
      sorted.schema.fields :+ StructField(ordName, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, outSchema)
  }
}
