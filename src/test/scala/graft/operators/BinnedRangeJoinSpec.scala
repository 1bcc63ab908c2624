package graft.operators

import graft.{SparkSpec, SparkTestSession}
import org.apache.spark.sql.functions._

class BinnedRangeJoinSpec extends SparkSpec {
  private val sp = SparkTestSession.spark
  import sp.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))

  test("matches the naive theta join, including bin-boundary and negative values") {
    // points around bin edges (width 10): -11..-9, -1, 0, 9, 10, 11, 25
    val points = Seq(-11L, -10L, -9L, -1L, 0L, 9L, 10L, 11L, 25L, 100L)
      .toDF("p").withColumn("pid", monotonically_increasing_id())
    // intervals crossing bins, exactly on edges, single-point, inverted
    val intervals = Seq(
      (1L, -15L, -5L), (2L, -10L, 10L), (3L, 0L, 0L), (4L, 10L, 10L),
      (5L, 5L, 24L), (6L, 30L, 20L) /* inverted — must drop */)
      .toDF("iid", "lo", "hi")
    val got = BinnedRangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 10L)
      .select(col("pid"), col("iid"))
    val want = naive(points, intervals).select(col("pid"), col("iid"))
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
    got.count() shouldBe want.count()
  }

  test("equivalence on random data across bin widths") {
    val points = sp.range(0, 500)
      .select((pmod(col("id") * 7919, lit(1000)) - 500).as("p"),
        col("id").as("pid"))
    val intervals = sp.range(0, 80).select(
      col("id").as("iid"),
      (pmod(col("id") * 104729, lit(900)) - 450).as("lo"))
      .withColumn("hi", col("lo") + pmod(col("iid") * 31, lit(120)))
    val want = naive(points, intervals).select(col("pid"), col("iid"))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = BinnedRangeJoin
        .pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select(col("pid"), col("iid"))
      withClue(s"binWidth=$w: ") {
        got.except(want).count() shouldBe 0
        want.except(got).count() shouldBe 0
        got.count() shouldBe want.count()
      }
    }
  }

  test("exact binning beyond 2^53 (epoch-nanosecond keys) — double division would drop matches") {
    val base = 1700000000000000000L // ~2024 in epoch ns, well above 2^53
    val points = Seq(base - 1L, base, base + 1L, base + 999999999L, base + 1000000001L)
      .toDF("p").withColumn("pid", monotonically_increasing_id())
    val intervals = Seq((1L, base, base + 1000000000L), (2L, base - 5L, base - 2L))
      .toDF("iid", "lo", "hi")
    val got = BinnedRangeJoin
      .pointInInterval(points, "p", intervals, "lo", "hi", 1000000007L)
      .select(col("pid"), col("iid"))
    val want = naive(points, intervals).select(col("pid"), col("iid"))
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
    got.count() shouldBe want.count()
  }

  test("plans an equi join on the bin — no nested loop, no cartesian") {
    val plan = graft.SparkEntry.queries("q_join_range_binned")(spark, sfDir)
      .queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }

  test("rejects overlapping column names and bad bin width") {
    val a = Seq(1L).toDF("p")
    val b = Seq((1L, 2L)).toDF("lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      BinnedRangeJoin.pointInInterval(a, "p", b, "lo", "hi", 0L)
    val clash = Seq((1L, 2L, 3L)).toDF("p", "lo", "hi")
    an[IllegalArgumentException] should be thrownBy
      BinnedRangeJoin.pointInInterval(a, "p", clash, "lo", "hi", 10L)
  }
}
