package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** Bridge into Spark's private[sql] internal-row DataFrame constructor,
  * for the one pattern the public API cannot express safely: running
  * SEVERAL passes over ONE physical shuffle.
  *
  * [[pinShuffle]] freezes a DataFrame's physical plan into a single RDD
  * instance and re-wraps it as a DataFrame (LogicalRDD). Every job that
  * later consumes the result shares that RDD — and Spark's scheduler
  * reuses a ShuffleDependency's map outputs across jobs on the same RDD
  * lineage — so the plan's exchanges execute exactly once, while the
  * narrow tail (e.g. a within-partition sort) replays cheaply from the
  * frozen shuffle files. Unlike `localCheckpoint()` this stores NO rows
  * (the measured checkpoint rescans cost 3–9 CPU-s per million-row scan;
  * a shuffle re-read is a fraction of that), and unlike relying on
  * physical-plan ReuseExchange it cannot be silently defeated by
  * per-branch optimization: column pruning can rewrite two consumers'
  * exchange subtrees differently, at which point they sample INDEPENDENT
  * range boundaries and any (partition id, local index) bookkeeping
  * computed on one branch is garbage on the other (the r14 GlobalIndex
  * regression this replaces — caught by the sf0.01 value gate).
  *
  * Building the result materializes the plan's exchanges eagerly (AQE
  * stage materialization), same as the eager localCheckpoint it
  * replaces. Determinism contract: shuffle-read fetch order varies
  * across stage replays, so consumers must either re-sort (the pinned
  * frame's own tail sort does) or be order-insensitive.
  */
object DatasetBridge {
  def pinShuffle(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(df.queryExecution.toRdd, df.schema)
  }
}
