package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: two-phase salted aggregation.
  *
  * A plain `groupBy(k).agg(...)` sends every row of a hot key to one
  * reducer; at 100 TB one key can be terabytes. Salting splits each key
  * into `saltFactor` sub-keys for a partial aggregate, then combines the
  * partials in a second (tiny) aggregate. Works for any commutative
  * semigroup aggregate (sum/count/min/max — the partial+final pair is
  * expressed by the caller).
  *
  * AQE's skew-join splitting handles the JOIN side of skew at runtime;
  * this handles the AGGREGATION side, which AQE does not repartition.
  * (Spark's own partial aggregation already does map-side combine; salting
  * matters when the *reduce*-side per-key state is itself too large —
  * e.g. collect-style or distinct-style aggregates.)
  */
object Salting {

  /** Two-phase aggregate: phase 1 groups by (keys, salt) computing
    * `partial` aggregates; phase 2 groups by keys combining with `combine`.
    * `partial`/`combine` pair must satisfy combine(partial(a)++partial(b))
    * == agg(a++b) — true for sum/count/min/max and count-distinct via sets.
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      partial: Seq[Column],
      combine: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(combine.head, combine.tail: _*)
  }

  /** Salted count+sum convenience: survives any key skew. */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
      saltFactor: Int = 16): DataFrame =
    saltedAgg(df, keys, saltFactor,
      partial = Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s")),
      combine = Seq(sum(col("__n")).as("n"), sum(col("__s")).as("sum")))

  /** Salted equi-join for extreme key skew on the LEFT (fact) side when
    * the right side is too large to broadcast and a single hot key
    * overwhelms one reducer. Each left row gets a deterministic salt in
    * [0, saltFactor); the right side is replicated saltFactor× with every
    * salt value, and the join runs on (key, salt) — the hot key's rows
    * spread over saltFactor reducers instead of one.
    *
    * Cost model: right-side shuffle volume multiplies by saltFactor, so
    * this pays off exactly when |right| × saltFactor ≪ the hot key's
    * left volume — the standard manual fallback for the cases AQE's
    * runtime skew-split cannot handle (e.g. the skewed partition is one
    * single key, which AQE cannot subdivide further without a salt).
    * Inner joins only (an outer salted join would need null-handling on
    * every replica — out of scope).
    *
    * The salt is positional, not key-derived — spark_partition_id +
    * monotonically_increasing_id spreads every key's rows uniformly and
    * is deterministic for a deterministic upstream layout (no rand(), so
    * re-runs and task retries produce identical assignments).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0, s"saltFactor must be positive: $saltFactor")
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin: input already carries a __salt column — it would be " +
        "silently clobbered; rename it first")
    val saltedLeft = left.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltFactor))
        .cast("int"))
    val replicatedRight = right
      .withColumn("__salt", explode(array((0 until saltFactor).map(lit): _*)))
    saltedLeft.join(replicatedRight,
        Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}
