package graft.plans

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Runtime (adaptive) optimizations the 100 TB posture leans on — these
  * fire during execution, so they are pinned against the POST-EXECUTION
  * adaptive plan, not the static one (SURVEY.md §4).
  */
class RuntimeOptSpec extends SparkSpec {

  test("AQE coalesces small shuffle partitions after the map stage") {
    // 4 shuffle partitions configured, but the grouped data is tiny —
    // AQE's coalescer must fuse them instead of running 4 near-empty
    // reducers (at scale: thousands of empty reducers per stage)
    val df = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    df.collect()
    val adaptive = df.queryExecution.executedPlan.toString
    adaptive should include("AQEShuffleRead")
    adaptive should include("coalesced")
  }

  test("AQE re-plans a shuffle join to broadcast when the built side turns out tiny") {
    val sp = spark
    // disable the STATIC broadcast decision so only the runtime size
    // estimate (post-shuffle, accurate) can choose the broadcast join;
    // the adaptive threshold falls back to the static one when unset, so
    // it must be pinned explicitly
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "10MB")
    try {
      val dim = Tables.nation(sp, sfDir).filter(col("n_nationkey") < 5)
      val fact = Tables.customer(sp, sfDir)
      val joined = fact.join(dim, col("c_nationkey") === col("n_nationkey"))
        .agg(count(lit(1)).as("n"))
      joined.collect()
      val adaptive = joined.queryExecution.executedPlan.toString
      adaptive should include("BroadcastHashJoin")
    } finally {
      sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      sp.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom filter prunes the fact side of a selective dim join") {
    val sp = spark
    // thresholds floored so the tiny fixture qualifies as a creation side
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> sp.conf
        .getOption("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> sp.conf
        .getOption("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        sp.conf.getOption(
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        sp.conf.getOption("spark.sql.autoBroadcastJoinThreshold"))
    // bloom filters target SHUFFLE joins (a broadcast-able dim needs no
    // bloom) — force the shuffle path for the demonstration
    sp.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    sp.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    sp.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      // selective filter on the dim side → a bloom filter on the join key
      // should be injected into the fact scan subtree
      val dim = Tables.part(sp, sfDir).filter(col("p_brand") === "Brand#3")
      val fact = Tables.lineitem(sp, sfDir)
      val joined = fact.join(dim, col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      optimized should include("might_contain")
    } finally prev.foreach {
      case (k, Some(v)) => sp.conf.set(k, v)
      case (k, None) => sp.conf.unset(k)
    }
  }
}
