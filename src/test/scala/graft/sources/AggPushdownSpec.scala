package graft.sources

import graft.SparkSpec

/** Parquet aggregate pushdown (DataSource v2): COUNT / MIN / MAX answered
  * from row-group FOOTER STATISTICS — zero data pages read. At 100 TB
  * this is the difference between a metadata-only operation and a full
  * scan for the commonest operational queries (row counts, watermark
  * bounds). V1 scans (the session default) can't push aggregates; the
  * spec flips the session to the v2 path + aggregatePushdown for its
  * duration and restores after.
  */
class AggPushdownSpec extends SparkSpec {

  private def withAggPushdown[T](body: => T): T = {
    val conf = spark.conf
    val prevV1 = conf.get("spark.sql.sources.useV1SourceList")
    conf.set("spark.sql.sources.useV1SourceList", "")
    conf.set("spark.sql.parquet.aggregatePushdown", "true")
    try body
    finally {
      conf.set("spark.sql.sources.useV1SourceList", prevV1)
      conf.set("spark.sql.parquet.aggregatePushdown", "false")
    }
  }

  test("count(*) and min/max are answered from parquet footers (PushedAggregation)") {
    withAggPushdown {
      import org.apache.spark.sql.functions._
      val path = s"$sfDir/lineitem.parquet"
      val cnt = spark.read.parquet(path).agg(count(lit(1)).as("n"))
      cnt.collect().head.getLong(0) shouldBe
        spark.read.parquet(path).count()
      cnt.queryExecution.executedPlan.toString should include("PushedAggregation")

      val mm = spark.read.parquet(path)
        .agg(min(col("l_orderkey")).as("lo"), max(col("l_orderkey")).as("hi"))
      val row = mm.collect().head
      mm.queryExecution.executedPlan.toString should include("PushedAggregation")
      // pushed result must equal the scan-computed truth
      val truth = withAggPushdownOff {
        spark.read.parquet(path)
          .agg(min(col("l_orderkey")), max(col("l_orderkey"))).collect().head
      }
      row.getLong(0) shouldBe truth.getLong(0)
      row.getLong(1) shouldBe truth.getLong(1)
    }
  }

  private def withAggPushdownOff[T](body: => T): T = {
    val conf = spark.conf
    conf.set("spark.sql.parquet.aggregatePushdown", "false")
    try body
    finally conf.set("spark.sql.parquet.aggregatePushdown", "true")
  }
}
