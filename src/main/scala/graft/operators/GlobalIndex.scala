package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stable global ordinal (1-based `row_number() OVER (ORDER BY keys)`)
  * without the single-partition window that the naive SQL plans — the
  * classic need when assigning example ids / shard slots to a corpus.
  *
  * Plan: range-repartition on the keys (the SAME exchange a global sort
  * needs anyway — no extra shuffle), sort within partitions, then PIN
  * the physical shuffle (DatasetBridge.pinShuffle): both passes below
  * run against one frozen RDD, so the exchange executes once and the
  * count pass and the stamp pass see one consistent partitioning. Two
  * independently-planned range shuffles could sample different
  * boundaries and mis-assign offsets — and physical-plan ReuseExchange
  * is NOT a substitute for the pin: per-branch column pruning can make
  * the two exchange subtrees non-identical, silently disabling reuse
  * (caught by the sf0.01 value gate in r14). Unlike the earlier
  * localCheckpoint pin, no rows are cached — replays read shuffle files.
  *
  * Pass 1 collects a Long per partition to the driver — never payload.
  * Pass 2 stamps `offset(partition) + local row number` entirely inside
  * whole-stage codegen: `monotonically_increasing_id()` already encodes
  * (partition id << 33 | local index), so the ordinal is one projection
  * over a broadcast-literal offset array — no RDD round-trip out of
  * Tungsten, no single-task hotspot.
  *
  * The ordinal is deterministic iff `keys` is a total order (unique key
  * set): partition boundaries may vary with range sampling, but the
  * global sorted sequence — and hence each row's ordinal — does not.
  */
object GlobalIndex {

  private val LocalIdxMask = (1L << 33) - 1 // mid = pid << 33 | local index

  def withOrdinal(df: DataFrame, ordName: String, keys: Column*): DataFrame = {
    require(keys.nonEmpty, "GlobalIndex.withOrdinal: at least one ordering key")
    require(!df.columns.exists(_.equalsIgnoreCase(ordName)),
      s"GlobalIndex.withOrdinal: column '$ordName' already exists in ${df.columns.mkString(", ")}")
    val spark = df.sparkSession
    val n = math.max(1, spark.conf.get("spark.sql.shuffle.partitions").toInt)
    // pin the EXCHANGE only: the counts pass doesn't need row order, so
    // the (narrow, per-job) sort runs solely under the stamp pass
    val pinned = org.apache.spark.sql.graft.DatasetBridge.pinShuffle(
      df.repartitionByRange(n, keys: _*))
    val sorted = pinned.sortWithinPartitions(keys: _*)
    // pass 1: rows per partition — O(partitions) longs to the driver
    val counts = pinned.select(spark_partition_id().as("pid"))
      .groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect()
    // range partitioning can emit fewer than n non-empty partitions;
    // absent pids contribute 0 rows
    val nParts = math.max(n, counts.map(_.getInt(0)).foldLeft(-1)(math.max) + 1)
    val cnt = new Array[Long](nParts)
    counts.foreach(r => cnt(r.getInt(0)) = r.getLong(1))
    // the stamp masks monotonically_increasing_id to its 33 local-index
    // bits; a partition beyond 2^33 rows would silently wrap and corrupt
    // ordinals — the counts are already on the driver, so fail loudly
    require(cnt.forall(_ <= LocalIdxMask + 1),
      s"GlobalIndex.withOrdinal: a partition holds more than 2^33 rows " +
        s"(max ${cnt.max}); raise spark.sql.shuffle.partitions so the " +
        "local index fits monotonically_increasing_id's per-partition bits")
    val offsets = cnt.scanLeft(0L)(_ + _) // offsets(p) = rows before partition p
    val offLit = array(offsets.iterator.take(nParts).map(lit).toSeq: _*)
    // pass 2: codegen'd map-side stamp over the pinned sorted rows.
    // Determinism under a stage replay: shuffle-fetch order may differ,
    // but the pinned tail re-sorts, and with total-order keys the sorted
    // sequence — hence each (partition, local index) — is unchanged.
    sorted.withColumn(ordName,
      element_at(offLit, spark_partition_id() + 1) +
        monotonically_increasing_id().bitwiseAND(lit(LocalIdxMask)) + 1)
  }
}
