package graft.functions

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class TableDigestSpec extends SparkSpec {

  private def canonical(dirCol: String) = Tables.lineitem(spark, sfDir)
    .select(concat_ws("|", col("l_orderkey"), col("l_linenumber"),
      col("l_quantity")).as("row"))

  test("digest is invariant to row order and partitioning") {
    val base = canonical("x")
    val d1 = base.agg(TableDigest.digest(col("row"))).collect()(0).getString(0)
    val d2 = base.orderBy(rand(42)).repartition(13)
      .agg(TableDigest.digest(col("row"))).collect()(0).getString(0)
    d1 shouldBe d2
  }

  test("digest changes when any row changes or is dropped") {
    val base = canonical("x")
    val d1 = base.agg(TableDigest.digest(col("row"))).collect()(0).getString(0)
    val dDropped = base.limit(5999).agg(TableDigest.digest(col("row")))
      .collect()(0).getString(0)
    val dMutated = base
      .withColumn("row", when(monotonically_increasing_id() === 0,
        concat(col("row"), lit("X"))).otherwise(col("row")))
      .agg(TableDigest.digest(col("row"))).collect()(0).getString(0)
    d1 should not be dDropped
    d1 should not be dMutated
  }
}
