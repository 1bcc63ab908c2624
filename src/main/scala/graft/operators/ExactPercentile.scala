package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group `percentile_cont` WITHOUT whole-group aggregation
  * buffers (r12 verdict task 2).
  *
  * `expr("percentile(v, p)")` is an ObjectHashAggregate whose buffer
  * holds EVERY value of the group on one executor — a single 100 TB
  * lineitem returnflag group OOMs it. This operator reuses the
  * [[GlobalIndex]] range-exchange ordinal instead (the q_agg_equidepth
  * machinery): sort-by-(group, value) via ONE range repartition (memory
  * O(rows/partition), spill-safe), stamp global ordinals map-side, then
  * reduce the percentile to "fetch the values at two ranks per (group,
  * p)" — a tiny broadcast of O(groups × ps) boundary rows against the
  * stamped corpus.
  *
  * Interpolation is bit-compatible with Spark's exact `percentile`
  * (`PercentileBase.getPercentile`): with n non-null values sorted
  * ascending and position = p·(n−1) (0-based),
  * `(higher − position)·v_lo + (position − lower)·v_hi`, and `v_lo`
  * alone when the position is integral — the same arithmetic DuckDB's
  * `quantile_cont` agrees with at the oracle's rounding.
  */
object ExactPercentile {

  /** Exact percentiles of `valueCol` per `groupCol` for each p in `ps`.
    * Null values are excluded (the `percentile` semantics). Returns
    * (groupCol, p, value) — one row per (group, p); groups with zero
    * non-null values are absent (percentile of nothing is NULL, and
    * NULL-valued rows add nothing downstream).
    */
  def perGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentile fractions must be in [0, 1]: ${ps.mkString(", ")}")
    val t = df.select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
    // ONE range exchange: ordinals over (g, v[, tiebreak-free]) — groups
    // are contiguous in the global order, so within-group 0-based rank is
    // ord - min(ord per group). Ties in v get arbitrary relative order,
    // which cannot change the value observed at any rank.
    val ord = GlobalIndex.withOrdinal(t, "ord", col("g"), col("v"))
    val stats = ord.groupBy(col("g"))
      .agg(min(col("ord")).as("o0"), count(lit(1)).as("n"))
    // boundary ranks per (group, p): O(groups × ps) rows, broadcast
    val bounds = stats
      .select(col("g"), col("o0"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .withColumn("position", col("p") * (col("n") - 1).cast("double"))
      .select(col("g").as("gb"), col("p"), col("position"),
        (col("o0") + floor(col("position")).cast("long")).as("lo_ord"),
        (col("o0") + ceil(col("position")).cast("long")).as("hi_ord"))
    ord.join(broadcast(bounds),
        col("g") === col("gb") &&
          (col("ord") === col("lo_ord") || col("ord") === col("hi_ord")))
      .groupBy(col("g"), col("p"))
      .agg(
        first(col("position")).as("position"),
        min(when(col("ord") === col("lo_ord"), col("v"))).as("v_lo"),
        min(when(col("ord") === col("hi_ord"), col("v"))).as("v_hi"),
        first(col("lo_ord")).as("lo_ord"),
        first(col("hi_ord")).as("hi_ord"))
      // PercentileBase.getPercentile's exact arithmetic, fp-for-fp
      .select(col("g"), col("p"),
        when(col("lo_ord") === col("hi_ord"), col("v_lo"))
          .otherwise(
            (ceil(col("position")) - col("position")) * col("v_lo") +
              (col("position") - floor(col("position"))) * col("v_hi"))
          .as("value"))
  }
}
