package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (nearest prior / nearest following match), Spark-first.
  *
  * Instead of a pairwise range join (O(L·R) candidates, quadratic within
  * hot keys), we union both sides tagged by origin, sort within each key by
  * (time, side), and carry the right side's latest time forward with
  * `last(..., ignoreNulls=true)` over an ordered window. Cost: ONE shuffle
  * on the key, O(L+R) rows total, skew-safe under AQE — this is the shape
  * that survives 100 TB, where a naive range join explodes on hot keys.
  *
  * Right rows sort *before* left rows at the same timestamp, so a right
  * event at exactly t matches a left probe at t (`right.time <= left.time`
  * semantics, matching the ANSI `max(r.ts) WHERE r.ts <= l.ts` oracle).
  */
object AsOfJoin {

  /** Left rows plus an `asof_ts` column = max right time ≤ left time for
    * the same key (null when no prior right row exists).
    */
  def nearestPrior(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, forward = false)

  /** Forward variant: `asof_ts` = min right time ≥ left time for the same
    * key (null when no following right row exists) — "next event after",
    * the other direction any as-of user eventually needs. Same single-
    * shuffle union+window shape; only the window frame flips (carry the
    * right side's earliest time BACKWARD with first() over
    * [currentRow, unboundedFollowing]).
    */
  def nearestFollowing(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame =
    asOf(left, right, leftKey, rightKey, leftTime, rightTime, forward = true)

  private def asOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      forward: Boolean): DataFrame = {
    // Only "asof_ts" truly collides with the output (internal __ names are
    // shadowed inside the payload struct and restored afterwards); the
    // check is case-insensitive to match Spark's default resolution.
    require(!left.columns.exists(_.equalsIgnoreCase("asof_ts")),
      "left side must not already have an 'asof_ts' column")
    val timeType = left.schema(leftTime).dataType
    require(right.schema(rightTime).dataType == timeType,
      s"as-of time columns must share one type, got $timeType vs " +
        right.schema(rightTime).dataType)
    // Same for keys — an int-vs-long mismatch would otherwise surface as an
    // opaque unionByName failure on the internal __key column.
    val keyType = left.schema(leftKey).dataType
    require(right.schema(rightKey).dataType == keyType,
      s"as-of key columns must share one type, got $keyType vs " +
        right.schema(rightKey).dataType)
    val payload = struct(left.columns.toIndexedSeq.map(col): _*)

    val l2 = left.select(
      col(leftKey).as("__key"),
      col(leftTime).as("__time"),
      lit(1).as("__side"),
      lit(null).cast(timeType).as("__rt"),
      payload.as("__payload"))
    val payloadType = l2.schema("__payload").dataType
    // ANSI semantics: a NULL key matches nothing — drop null-key right rows
    // (null-key left rows stay and get asof_ts = null, like a left join).
    val r2 = right
      .filter(col(rightKey).isNotNull)
      .select(
        col(rightKey).as("__key"),
        col(rightTime).as("__time"),
        lit(0).as("__side"),
        col(rightTime).as("__rt"),
        lit(null).cast(payloadType).as("__payload"))

    // Tie ordering makes equality inclusive in BOTH directions: prior
    // wants the right row at exactly t BEFORE the left probe at t
    // (side asc: right=0 first); forward wants it AFTER (side desc:
    // left=1 first), so first()/last() scanning toward the right row
    // still sees it.
    val w0 = Window.partitionBy(col("__key"))
    val w =
      if (forward)
        w0.orderBy(col("__time"), col("__side").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else
        w0.orderBy(col("__time"), col("__side"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried =
      if (forward) first(col("__rt"), ignoreNulls = true).over(w)
      else last(col("__rt"), ignoreNulls = true).over(w)

    l2.unionByName(r2)
      .withColumn("asof_ts", carried)
      .filter(col("__side") === 1)
      .select((left.columns.toIndexedSeq.map(c => col(s"__payload.$c").as(c)) :+ col("asof_ts")): _*)
  }
}
