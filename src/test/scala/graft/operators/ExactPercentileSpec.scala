package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** ExactPercentile (the buffer-free percentile, r12 task 2) must agree
  * with Spark's exact `percentile` aggregate fp-for-fp — same sorted
  * values, same PercentileBase interpolation arithmetic — while planning
  * a range exchange instead of a whole-group ObjectHashAggregate buffer.
  */
class ExactPercentileSpec extends SparkSpec {

  test("perGroup equals expr(percentile) fp-for-fp on lineitem, incl. p=0/1") {
    val li = Tables.lineitem(spark, sfDir)
    val ps = Seq(0.0, 0.05, 0.5, 0.9, 0.95, 1.0)
    val want = li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_extendedprice, array(${ps.mkString(",")}))")
        .as("pcts"))
      .collect()
      .flatMap(r => ps.zip(r.getSeq[Double](1)).map { case (p, v) =>
        (r.getString(0), p) -> v })
      .toMap
    val got = ExactPercentile
      .perGroup(li, "l_returnflag", "l_extendedprice", ps)
      .collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    got.keySet shouldBe want.keySet
    got.foreach { case (k, v) =>
      withClue(s"group/p $k: ") {
        java.lang.Double.doubleToRawLongBits(v) shouldBe
          java.lang.Double.doubleToRawLongBits(want(k))
      }
    }
  }

  test("edge cases: single-row group, integral positions, nulls excluded") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", Some(30.0)),
      ("a", Some(40.0)), ("a", Some(50.0)), // n=5: p=0.5 lands integrally
      ("b", Some(7.5)),                     // single row: every p = 7.5
      ("c", None), ("c", Some(1.0)), ("c", Some(3.0)) // null excluded → n=2
    ).toDF("g", "v")
    val got = ExactPercentile.perGroup(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    got("a") shouldBe 30.0
    got("b") shouldBe 7.5
    got("c") shouldBe 2.0 // interpolated between 1 and 3, null ignored
    // all-null group is absent (percentile over nothing)
    val gotNone = ExactPercentile.perGroup(
      Seq(("d", Option.empty[Double])).toDF("g", "v"), "g", "v", Seq(0.5))
    gotNone.count() shouldBe 0L
  }

  test("NULL group keeps its row (null-safe boundary join), matching " +
      "expr(percentile)'s null-group row — r13 ADVICE") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (Option("a"), 10.0), (Option("a"), 20.0),
      (Option.empty[String], 5.0), (Option.empty[String], 15.0)
    ).toDF("g", "v")
    val got = ExactPercentile.perGroup(df, "g", "v", Seq(0.5))
      .collect().map(r => Option(r.getString(0)) -> r.getDouble(2)).toMap
    got.keySet shouldBe Set(Option("a"), None)
    got(Option("a")) shouldBe 15.0
    got(None) shouldBe 10.0 // the null group's own median, not dropped
  }

  test("perGroupMulti: both value columns in ONE ordinal pass equal the " +
      "per-column form fp-for-fp (r13 task 4)") {
    val li = Tables.lineitem(spark, sfDir)
    val multi = ExactPercentile.perGroupMulti(li, "l_returnflag",
        Seq("l_quantity" -> Seq(0.5), "l_extendedprice" -> Seq(0.25, 0.9)))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    val qty = ExactPercentile.perGroup(li, "l_returnflag", "l_quantity", Seq(0.5))
      .collect().map(r => (r.getString(0), "l_quantity", r.getDouble(1)) -> r.getDouble(2))
    val price = ExactPercentile
      .perGroup(li, "l_returnflag", "l_extendedprice", Seq(0.25, 0.9))
      .collect().map(r => (r.getString(0), "l_extendedprice", r.getDouble(1)) -> r.getDouble(2))
    val want = (qty ++ price).toMap
    multi.keySet shouldBe want.keySet
    multi.foreach { case (k, v) =>
      withClue(s"group/tag/p $k: ") {
        java.lang.Double.doubleToRawLongBits(v) shouldBe
          java.lang.Double.doubleToRawLongBits(want(k))
      }
    }
  }

  test("discrete mode follows the SQL-standard CDF rule (rank ceil(p·n), " +
      "clamped at the first element) and returns actual data values — r14") {
    val sp = spark; import sp.implicits._
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("a", 40.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.26, 0.5, 0.75, 0.76, 1.0)
    val got = ExactPercentile
      .perGroupMulti(df, "g", Seq("v" -> ps), discrete = true)
      .collect().map(r => (r.getString(0), r.getDouble(2)) -> r.getDouble(3))
      .toMap
    // n=4: the DuckDB-probed boundary table (quantile_disc agrees)
    got(("a", 0.0)) shouldBe 10.0
    got(("a", 0.25)) shouldBe 10.0 // ceil(1.0) = 1 → v_1, the boundary case
    got(("a", 0.26)) shouldBe 20.0
    got(("a", 0.5)) shouldBe 20.0
    got(("a", 0.75)) shouldBe 30.0
    got(("a", 0.76)) shouldBe 40.0
    got(("a", 1.0)) shouldBe 40.0
    // n=3
    got(("b", 0.5)) shouldBe 2.0
    got(("b", 1.0)) shouldBe 3.0
    // every result is a member of the input, never an interpolation
    got.values.toSet.subsetOf(Set(10.0, 20.0, 30.0, 40.0, 1.0, 2.0, 3.0)) shouldBe true
  }

  test("plan: ONE pinned range exchange, no row materialization, no percentile buffer") {
    val li = Tables.lineitem(spark, sfDir)
    val df = ExactPercentile
      .perGroup(li, "l_returnflag", "l_extendedprice", Seq(0.05, 0.95))
    val p = df.queryExecution.executedPlan.toString.toLowerCase
    // one-shuffle shape (r13 task 4, hardened r14): the counts branch
    // and the probe branch consume the SAME pinned RDD (the exchange is
    // sealed inside it — physical ReuseExchange was silently defeated by
    // per-branch column pruning, so the pin is RDD-level); the map-side
    // address stamp is visible, and no whole-group ObjectHashAggregate
    // percentile buffer appears anywhere
    p should include("existingrdd")
    p should include("monotonically_increasing_id")
    p should not include "percentile("
    // the pinned frame IS range-partitioned: pin the exchange on the
    // pre-pin plan
    li.select(col("l_returnflag").as("g"),
        col("l_extendedprice").cast("double").as("v"))
      .repartitionByRange(4, col("g"), col("v"))
      .queryExecution.executedPlan.toString.toLowerCase should
      include("rangepartitioning")
  }

  test("q_agg_percentile_exact row-equals q_agg_percentile (the buffered reference)") {
    val a = graft.SparkEntry.queries("q_agg_percentile")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = graft.SparkEntry.queries("q_agg_percentile_exact")(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    b shouldBe a
  }

  test("q_winsorize bounds survive the rewrite: oracle shape intact") {
    val rows = graft.SparkEntry.queries("q_winsorize")(spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (p05, p95) = (r.getDouble(1), r.getDouble(2))
      p05 should be <= p95
      r.getLong(4) should be > 0L // n_clip_lo: something clipped at p05
      r.getLong(5) should be > 0L
    }
  }
}
