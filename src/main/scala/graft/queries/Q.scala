package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query: a Spark DataFrame builder plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle SQL over
  * the same parquet tables. Queries without an oracle get the driver's
  * weaker rows-only check and are pinned by ScalaTest specs instead.
  *
  * Determinism contract (FIXTURES.md canonicalization): every query ends in
  * an ORDER BY on a unique key set, doubles are rounded (4 decimals; 2 for
  * large-magnitude sums where double summation-order noise could flip the
  * 4th decimal), and the Spark output column names match the oracle's
  * aliases exactly (the driver sorts columns by name before hashing).
  */
/** `scaleBound`: largest scale factor this query may run at — the
  * explicit oracle-scale-only marker for declared correctness baselines
  * whose plan is deliberately NOT the production shape (the O(n²) exact
  * cosine twin, the declared cross join). Bench filters on it, so a
  * future sf1/sf10 run excludes them by contract instead of by memory
  * (SCALE.md); None = the query's plan is expected to survive any scale.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    scaleBound: Option[Double] = None)

trait QueryModule {
  def queries: Seq[Q]
}

/** Shared query-plan helpers. */
object QueryUtil {
  /** Spread a scan across the session's cores when the file layout
    * undersupplies parallelism (r19 opt, guide §2.6/§2.5 "input skew"):
    * a KB-scale parquet table plans as ONE input split, so a compute-
    * heavy verify stage fed by it (all-pairs cosine, blocked edit
    * distance) runs single-threaded while 31 cores idle. The round-robin
    * repartition only fires when the current partition count is below
    * `defaultParallelism` — a production-scale table has thousands of
    * input splits and this is the identity (no exchange added at scale).
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
