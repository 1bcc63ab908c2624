package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator surface (SURVEY.md §2 Part B):
  * each entry is one operator/query; entries with a DuckDB-expressible
  * equivalent also appear in `oracleSql` and are hash-compared by the
  * driver at sf0.01. Entries without an oracle (approx/hash-native/LSH/
  * streaming-twin internals) get the rows-only check and are pinned by
  * ScalaTest specs instead.
  */
object SparkEntry {

  private val modules: Seq[QueryModule] = Seq(
    Relational, TpchDeep, WindowSetOps, ScalarFuncs, EventQueries,
    TextQueries, PipelineDeep, VectorQueries, MultimodalQueries, Extra,
    TypedQueries, ChangeOps, ShardOps, ProfileOps)

  private val all: Seq[Q] = {
    val qs = modules.flatMap(_.queries)
    require(qs.map(_.name).distinct.size == qs.size, "duplicate query names")
    qs
  }

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. TPC-H Q1
    * shape: scan → filter → project → partial/final hash agg → sort.
    */
  def entry(spark: SparkSession): DataFrame = {
    val q1 = all.find(_.name == "q1_agg").get
    q1.build(spark, "/root/testdata/sf0.001")
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops → driver
    * records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap

  /** Declared per-query scale ceilings (Q.scaleBound): queries whose plan
    * is an oracle-scale-only baseline by contract. Bench excludes these
    * when the target sf exceeds the bound.
    */
  def scaleBounds: Map[String, Double] =
    all.flatMap(q => q.scaleBound.map(b => q.name -> b)).toMap
}
