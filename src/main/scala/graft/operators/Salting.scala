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
}
