package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The scale-lint guardrail: detection logic over real optimized plans,
  * the small-global-pass allowance, and the warn/fail/off rule modes.
  */
class ScaleLintSpec extends SparkSpec {

  private def lint(df: org.apache.spark.sql.DataFrame): Seq[String] =
    ScaleLint.findings(df.queryExecution.optimizedPlan)

  test("flags a global window over raw data; allows partitioned and post-aggregate windows") {
    val orders = Tables.orders(spark, sfDir)
    val global = orders.select(
      ntile(4).over(Window.orderBy(col("o_totalprice"))).as("q"))
    lint(global) should have size 1
    lint(global).head should include("global window")

    val partitioned = orders.select(
      row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderkey"))).as("rn"))
    lint(partitioned) shouldBe empty

    // cumulative pass over an aggregate (the two-pass ntile shape) is the
    // deliberate small global pass — allowed
    val overAgg = orders.groupBy(col("o_orderstatus")).count()
      .withColumn("cum", sum(col("count")).over(Window.orderBy(col("o_orderstatus"))))
    lint(overAgg) shouldBe empty

    // an Aggregate merely SOMEWHERE below (tiny agg joined to raw data)
    // must NOT suppress the finding — the window input is still huge
    val agg = orders.groupBy(col("o_orderstatus")).count()
    val joinedRaw = orders.join(agg, "o_orderstatus")
      .withColumn("rn", row_number().over(Window.orderBy(col("o_orderkey"))))
    lint(joinedRaw) should have size 1

    // a window over limit(k) is bounded by construction — allowed (the
    // IVF centroid-seed ranking shape)
    val overLimit = orders.limit(16)
      .withColumn("rn", row_number().over(Window.orderBy(col("o_orderkey"))))
    lint(overLimit) shouldBe empty
  }

  test("the IVF query (window over limit in centroid seeding) is lint-clean") {
    lint(graft.SparkEntry.queries("q_sim_topk_ivf")(spark, sfDir)) shouldBe empty
  }

  test("the declared two-pass ntile query is lint-clean") {
    lint(graft.SparkEntry.queries("q_win_ntile")(spark, sfDir)) shouldBe empty
  }

  test("flags a condition-less inner join; leaves keyed and bounded-side joins alone") {
    val a = Tables.region(spark, sfDir)
    val b = Tables.nation(spark, sfDir)
    lint(a.join(b)) should have size 1
    lint(a.join(b, a("r_regionkey") === b("n_regionkey"))) shouldBe empty
    // crossing against an aggregate (bounded) side — the broadcast
    // centroid-table pattern — is deliberate and allowed
    val agg = b.groupBy(col("n_regionkey")).count()
    lint(a.join(agg, lit(true))) shouldBe empty
  }

  test("flags the multi-distinct Expand over an unbounded fact (the r15 " +
      "profiler shape); per-column rewrite, cube, narrow cases, exemption clean") {
    val li = Tables.lineitem(spark, sfDir)
    // regression replica of the OLD q_profile_columns plan: one Aggregate
    // with a count_distinct per profiled column → RewriteDistinctAggregates
    // plans an Expand with (#groups + 1) projections over the full scan —
    // the 32-GB-spill-at-sf10 shape
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax")
    val oldProfiler = li.agg(
      count(lit(1)).as("n_rows"),
      cols.map(c => count_distinct(col(c)).as(s"nd_$c")): _*)
    val f = lint(oldProfiler)
    f should have size 1
    f.head should include("multi-distinct Expand")
    // in fail mode the rule throws at plan time — the CI posture that
    // would have stopped the profiler from merging
    // the PHYSICAL hook is what trips in production (the injected
    // logical batch runs BEFORE RewriteDistinctAggregates plants the
    // Expand, so only the final physical plan carries it) — applied
    // manually like the packVec physical tests, AQE off so executedPlan
    // exposes the raw ExpandExec
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val physPlan = oldProfiler.queryExecution.executedPlan
      val pf = ScaleLint.shuffleFindings(physPlan)
      pf.count(_.contains("multi-distinct Expand")) shouldBe 1
      spark.conf.set(ScaleLint.ConfKey, "fail")
      a[ScaleLint.ScaleLintViolation] should be thrownBy
        ScaleLintShuffleRule(spark)(physPlan)
    } finally {
      spark.conf.set(ScaleLint.ConfKey, "off")
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    // the shipped per-column rewrite is clean (the full-registry sweep
    // below re-checks it along with everything else)
    lint(graft.SparkEntry.queries("q_profile_columns")(spark, sfDir)) shouldBe empty
    // cube/rollup Expands replicate only their narrow grouping projection
    // (spark_grouping_id, not gid) — exempt by construction
    lint(li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")))) shouldBe empty
    // two distinct groups (3 projections) is the benign common case
    lint(li.agg(count_distinct(col("l_partkey")),
      count_distinct(col("l_suppkey")))) shouldBe empty
    // multi-distinct over an AGGREGATE (bounded) input is the deliberate
    // small-global-pass pattern
    lint(li.groupBy(col("l_returnflag")).agg(
        sum(col("l_quantity")).as("q"), avg(col("l_discount")).as("d"),
        max(col("l_tax")).as("t"), min(col("l_extendedprice")).as("p"))
      .agg(count_distinct(col("q")), count_distinct(col("d")),
        count_distinct(col("t")), count_distinct(col("p")))) shouldBe empty
    // r17 (the r16 verdict's name-match hazard): a USER column literally
    // named "gid" must neither false-fire nor suppress. False-fire side:
    // a cube whose grouping column is called gid still plans the exempt
    // spark_grouping_id Expand — the user's gid rides projections as a
    // passthrough attribute, never as the rewrite's distinct-literal tag
    val withGid = li.withColumn("gid", col("l_linenumber"))
    lint(withGid.cube(col("gid"), col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")))) shouldBe empty
    // suppress side: the real multi-distinct rewrite over a table that
    // ALSO carries a user gid column must still fire exactly once
    val gidF = lint(withGid.agg(
      count(lit(1)).as("n_rows"),
      (cols :+ "gid").map(c => count_distinct(col(c)).as(s"nd_$c")): _*))
    gidF.count(_.contains("multi-distinct Expand")) shouldBe 1
    // the auditable bless: stamping any input column clears the site
    val blessed = li.select(
      ScaleLint.expandExempt(col("l_orderkey"), "l_orderkey",
        "fixture-bounded replica for the lint spec"),
      col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
      col("l_discount"), col("l_tax"))
    lint(blessed.agg(count(lit(1)).as("n_rows"),
      cols.map(c => count_distinct(col(c)).as(s"nd_$c")): _*)) shouldBe empty
  }

  test("full-registry sweep: every declared query is lint-clean") {
    // every query in the driver contract gets its optimized plan linted —
    // a new query with a hidden global window or accidental cartesian
    // fails CI here even if nobody wrote it a dedicated plan assert
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(name) {
        lint(fn(spark, sfDir)) shouldBe empty
      }
    }
  }

  test("physical lint: flags float-vector payloads riding a shuffle; ids + broadcast re-attach is clean") {
    // AQE off for the throwaway plans so executedPlan exposes raw
    // ShuffleExchangeExec nodes — the same shape the injected
    // query-stage-prep rule receives in production
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = Tables.embeddings(spark, sfDir)
      val bad = e.repartition(4, col("vec_id")) // embedding rides the exchange
      val fs = ScaleLint.shuffleFindings(bad.queryExecution.executedPlan)
      fs should have size 1
      fs.head should include("float-vector payload")
      fs.head should include("embedding")

      // the blessed shape: ids-only exchange, vectors re-attach broadcast
      val ids = e.select(col("vec_id")).repartition(4, col("vec_id"))
      val ok = ids.join(broadcast(e), "vec_id")
      ScaleLint.shuffleFindings(ok.queryExecution.executedPlan) shouldBe empty

      val rule = ScaleLintShuffleRule(spark)
      val plan = bad.queryExecution.executedPlan
      spark.conf.set(ScaleLint.ConfKey, "off")
      rule(plan) shouldBe plan
      spark.conf.set(ScaleLint.ConfKey, "warn")
      rule(plan) shouldBe plan // logs, never rewrites
      spark.conf.set(ScaleLint.ConfKey, "fail")
      an[ScaleLint.ScaleLintViolation] should be thrownBy rule(plan)
      // the columnar-rule hook (the non-AQE/streaming injection path)
      // applies the same inspection
      an[ScaleLint.ScaleLintViolation] should be thrownBy
        ScaleLintColumnarRule(spark).preColumnarTransitions(plan)
    } finally {
      spark.conf.unset(ScaleLint.ConfKey)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("physical lint: packVec-marked BINARY payloads are flagged on shuffles; packVecExempt is the auditable bless") {
    import graft.functions.VectorFunctions
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val e = Tables.embeddings(spark, sfDir)
      // packing to binary is the same 4·dim bytes/row — a marked packed
      // column riding an exchange must NOT evade the float-payload rule
      val sneaky = e.select(col("vec_id"),
          VectorFunctions.packVec(col("embedding"), "pv"))
        .repartition(4, col("vec_id"))
      val fs = ScaleLint.shuffleFindings(sneaky.queryExecution.executedPlan)
      fs should have size 1
      fs.head should include("PACKED float-vector payload")
      fs.head should include("pv")

      // the explicit per-site exemption (bounded-row re-attach) is clean
      val blessed = e.select(col("vec_id"),
          VectorFunctions.packVecExempt(col("embedding"), "pv",
            "spec fixture: bounded by construction"))
        .repartition(4, col("vec_id"))
      ScaleLint.shuffleFindings(
        blessed.queryExecution.executedPlan) shouldBe empty

      // an untagged BinaryType column (e.g. SQ8 bcode) stays allowed —
      // byte codes are REAL compression, the deliberate scale pattern
      val codes = e.select(col("vec_id"),
          md5(col("vec_id").cast("string")).cast("binary").as("bcode"))
        .repartition(4, col("vec_id"))
      ScaleLint.shuffleFindings(
        codes.queryExecution.executedPlan) shouldBe empty
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("rule modes: off is silent, warn passes plans through, fail throws") {
    val global = Tables.orders(spark, sfDir).select(
      ntile(4).over(Window.orderBy(col("o_totalprice"))).as("q"))
    val plan = global.queryExecution.optimizedPlan
    val rule = ScaleLintRule(spark)

    spark.conf.set(ScaleLint.ConfKey, "off")
    rule(plan) shouldBe plan
    spark.conf.set(ScaleLint.ConfKey, "warn")
    rule(plan) shouldBe plan // logs, never rewrites
    spark.conf.set(ScaleLint.ConfKey, "fail")
    try {
      an[ScaleLint.ScaleLintViolation] should be thrownBy rule(plan)
    } finally spark.conf.unset(ScaleLint.ConfKey)
  }
}
