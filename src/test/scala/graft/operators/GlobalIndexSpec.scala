package graft.operators

import graft.{SparkSpec, SparkTestSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class GlobalIndexSpec extends SparkSpec {
  private val sp = SparkTestSession.spark
  import sp.implicits._

  test("ordinal matches row_number over the same total order") {
    val df = spark.range(0, 1000).select(
      (col("id") * 37 % 1000).as("k"), (col("id") % 7).as("v"))
    val got = GlobalIndex.withOrdinal(df, "ord", col("k"))
      .select(col("k"), col("v"), col("ord"))
    val want = df.select(col("k"), col("v"),
      row_number().over(Window.orderBy(col("k"))).cast("long").as("ord"))
    got.except(want).count() shouldBe 0
    want.except(got).count() shouldBe 0
  }

  test("ordinals are contiguous 1..n") {
    val df = spark.range(0, 517).select(col("id").as("k"))
    val ords = GlobalIndex.withOrdinal(df, "ord", col("k"))
      .select(col("ord")).as[Long].collect().sorted
    ords shouldBe (1L to 517L).toArray
  }

  test("descending + tiebreak key order") {
    val df = Seq((1L, 10L), (2L, 30L), (3L, 30L), (4L, 20L)).toDF("id", "w")
    val got = GlobalIndex.withOrdinal(df, "ord", col("w").desc, col("id"))
      .select(col("id"), col("ord")).as[(Long, Long)].collect().toMap
    // w desc, id asc: 2(30),3(30),4(20),1(10)
    got shouldBe Map(2L -> 1L, 3L -> 2L, 4L -> 3L, 1L -> 4L)
  }

  test("deterministic across runs") {
    val df = spark.range(0, 2000).select((col("id") * 131 % 2000).as("k"))
    val a = GlobalIndex.withOrdinal(df, "ord", col("k")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = GlobalIndex.withOrdinal(df, "ord", col("k")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    a shouldBe b
  }

  test("plan (r14): shuffle pinned at the RDD level — no cached rows, " +
      "codegen'd stamp, lint-clean") {
    val df = spark.range(0, 1000).select((col("id") * 37 % 1000).as("k"))
    val got = GlobalIndex.withOrdinal(df, "ord", col("k"))
    val p = got.queryExecution.executedPlan.toString.toLowerCase
    // the exchange is sealed inside the pinned RDD (pinShuffle — shuffle
    // files reused across the count and stamp jobs; relying on physical
    // ReuseExchange instead was silently defeated by per-branch column
    // pruning, the r14 regression the sf0.01 value gate caught); the
    // consumer plan shows the pinned scan + the map-side ordinal stamp
    p should include("existingrdd")
    p should include("monotonically_increasing_id")
    graft.plans.ScaleLint.findings(
      got.queryExecution.optimizedPlan) shouldBe empty
  }

  test("ordinals survive a caller's coalesce(1) + write round-trip (the " +
      "Verify shape that exposed the r14 reuse regression)") {
    val sp2 = spark; import sp2.implicits._
    val df = spark.range(0, 5000).select((col("id") * 131 % 5000).as("k"),
      (col("id") % 7).as("payload")) // a prunable payload column
    val out = java.nio.file.Files.createTempDirectory("gi_rt").toString + "/p"
    GlobalIndex.withOrdinal(df, "ord", col("k"))
      .orderBy(col("k")).coalesce(1)
      .write.mode("overwrite").parquet(out)
    val ords = spark.read.parquet(out).orderBy("k")
      .select(col("ord")).as[Long].collect()
    ords shouldBe (1L to 5000L).toArray
  }

  test("rejects duplicate column name and empty keys") {
    val df = spark.range(0, 5).select(col("id").as("k"))
    an[IllegalArgumentException] should be thrownBy
      GlobalIndex.withOrdinal(df, "k", col("k"))
    an[IllegalArgumentException] should be thrownBy
      GlobalIndex.withOrdinal(df, "ord")
  }
}
