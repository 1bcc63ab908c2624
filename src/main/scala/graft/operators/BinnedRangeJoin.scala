package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT a natural equi key, planned as an
  * equi-join: Spark's built-in strategy for `p BETWEEN lo AND hi` with no
  * equi conjunct is a (broadcast) nested-loop over points × intervals —
  * O(n·m) compares however small the true match set is. The standard
  * scale-out rewrite bins the number line at a fixed width: each interval
  * explodes to the bins it overlaps, each point maps to exactly one bin,
  * and the join becomes equi on the bin id plus the residual bounds
  * filter. Compares drop from points × intervals to
  * points × (intervals overlapping the same bin); shuffle is
  * points + intervals × (avg span / binWidth + 1), both sides hash-
  * partitioned by bin — the same plan at 100 TB, no nested loop anywhere.
  *
  * `binWidth` trades interval duplication against bin selectivity — pick
  * it near the median interval span so each interval lands in O(1) bins
  * while a bin holds few intervals.
  *
  * Both join columns must be integral (cast dates to epoch days first);
  * intervals are inclusive [lo, hi] and rows with hi < lo are dropped
  * (Spark's `sequence(lo, hi)` would otherwise count DOWN, fabricating
  * bins). Column names must be disjoint across the two inputs.
  */
object BinnedRangeJoin {

  private val Bin = "__bin"

  // exact floor division for longs. Two traps dodged here: Column `/` is
  // double division, which silently rounds for |values| > 2^53 (epoch
  // nanos!), and bare integer `div` truncates toward zero, misbinning
  // negatives — so subtract pmod first (numerator becomes the exact
  // floor multiple) and `div` that, all in integer arithmetic.
  private def floorDiv(colName: String, w: Long): Column =
    expr(s"(`$colName` - pmod(`$colName`, ${w}L)) div ${w}L")

  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"point/interval column names must be disjoint; both have: ${overlap.mkString(", ")}")
    require(!(points.columns ++ intervals.columns).contains(Bin),
      s"'$Bin' is reserved by BinnedRangeJoin")
    val p = points.withColumn(Bin, floorDiv(pointCol, binWidth))
    val iv = intervals
      .filter(col(hiCol) >= col(loCol))
      .withColumn(Bin, explode(sequence(
        floorDiv(loCol, binWidth), floorDiv(hiCol, binWidth))))
    p.join(iv, Seq(Bin))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop(Bin)
  }
}
