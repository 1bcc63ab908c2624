package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Bucketed (pre-co-located) joins: writing both sides bucketed by the
  * join key lets the sort-merge join run with NO shuffle on either side —
  * the layout that amortizes one shuffle across every future join on that
  * key (SCALE.md "bucketed table layouts").
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the key plans without exchanges") {
    // external tables via option("path") — warehouse dir is static conf
    val wh = tmpDir("warehouse")

    Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/orders_b").saveAsTable("orders_b")
    Tables.customer(spark, sfDir)
      .select("c_custkey", "c_mktsegment")
      .write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/customer_b").saveAsTable("customer_b")

    val joined = spark.table("orders_b")
      .join(spark.table("customer_b").hint("merge"),
        col("o_custkey") === col("c_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    plan should include("SortMergeJoin")
    plan should not include "Exchange"

    // and it computes the right thing
    val n = joined.count()
    val expected = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
      .count()
    n shouldBe expected

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
  }
}
