package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Plan-shape assertions (SURVEY.md §4.2 / §5.2 #5): the optimizations we
  * rely on for 100 TB must actually appear in the physical plan — predicate
  * pushdown into the parquet scan, column pruning, broadcast joins for
  * dims, map-side partial aggregation, top-k without a global sort.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters are pushed down to the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .filter(col("l_quantity") > 30 && col("l_returnflag") === "A")
      .select(col("l_orderkey"))
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString
    scan should include("PushedFilters")
    scan should include("GreaterThan(l_quantity,30.0)")
    // plan strings truncate long filter lists; the prefix is stable
    scan should include("EqualTo(l_returnfl")
  }

  test("column pruning: scan reads only referenced columns") {
    val df = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().mkString
    scan should include("ReadSchema")
    scan should include("l_orderkey")
    scan should not include "l_extendedprice"
    scan should not include "l_shipdate"
  }

  test("dimension joins broadcast (q_join_inner, q5)") {
    val p1 = planOf(graft.SparkEntry.queries("q_join_inner")(spark, sfDir))
    p1 should include("BroadcastHashJoin")
    val p5 = planOf(graft.SparkEntry.queries("q5_local_supplier_volume")(spark, sfDir))
    p5 should include("BroadcastHashJoin")
  }

  test("q7/q14: dims broadcast, no cartesian, single fact shuffle shape") {
    val p7 = planOf(graft.SparkEntry.queries("q7_volume_shipping")(spark, sfDir))
    p7 should include("BroadcastHashJoin")
    p7 should not include "CartesianProduct"
    p7 should not include "BroadcastNestedLoopJoin"
    val p14 = planOf(graft.SparkEntry.queries("q14_promo_revenue")(spark, sfDir))
    p14 should include("BroadcastHashJoin")
    p14 should not include "SortMergeJoin" // part is a broadcast dim here
  }

  test("aggregation is partial + final hash aggregate (q1)") {
    val p = planOf(graft.SparkEntry.queries("q1_agg")(spark, sfDir))
    "HashAggregate".r.findAllIn(p).size should be >= 2
    p should include("partial_sum")
  }

  test("per-group top-k gets the rank-limit pushdown (WindowGroupLimit)") {
    // Spark 4 prunes each group to k rows BEFORE the full window sort —
    // partial (map-side) + final. Pin it so a query rewrite can't silently
    // fall back to sorting whole partitions.
    val p = planOf(graft.SparkEntry.queries("q_win_topk")(spark, sfDir))
    "WindowGroupLimit".r.findAllIn(p).size should be >= 2
  }

  test("global top-k compiles to TakeOrderedAndProject, not a full sort") {
    val p = planOf(graft.SparkEntry.queries("q_limit_topk")(spark, sfDir))
    p should include("TakeOrderedAndProject")
  }

  test("whole-stage codegen covers the scan→project pipeline") {
    val p = planOf(Tables.lineitem(spark, sfDir)
      .select((col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net")))
    // codegen'd stages render as "*(n)" in the plan string
    p should include("*(1)")
  }

  test("IVF cell assignment is map-side: no exchange, no join in the plan") {
    // The n·k candidate set must never shuffle (SCALE.md: "the corpus
    // never shuffles" during assignment) — NearestCell computes the
    // argmin per row over the driver-collected centroid matrix.
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("n2", graft.functions.VectorFunctions.normSq(col("embedding")))
    val cents = graft.operators.IvfIndex.centroids(spark, vecs, 8)
    val p = planOf(graft.operators.IvfIndex.assign(vecs, cents))
    p should not include "Exchange"
    p should not include "Join"
    p should not include "Window"
    p should include("nearest_cell")
  }

  test("global ntile avoids the single-partition window") {
    // q_win_ntile is two-pass distributed ranking: the only per-row window
    // is partitioned by bin; the global cumulative pass runs over #bins
    // rows, not n. No ntile() (single-task global window) in the plan.
    val p = planOf(graft.SparkEntry.queries("q_win_ntile")(spark, sfDir))
    p should not include "ntile("
    p should include("windowspecdefinition(bin")
  }

  test("as-of join plans a single shuffle (no pairwise join)") {
    val p = planOf(graft.SparkEntry.queries("q_join_asof")(spark, sfDir))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("Window")
  }

  test("q4/q21: EXISTS / NOT EXISTS plan as semi/anti joins, never cartesian") {
    val p4 = planOf(graft.SparkEntry.queries("q4_order_priority")(spark, sfDir))
    p4 should include("LeftSemi")
    p4 should not include "CartesianProduct"
    val p21 = planOf(graft.SparkEntry.queries("q21_waiting_suppliers")(spark, sfDir))
    p21 should include("LeftSemi")
    p21 should include("LeftAnti")
    p21 should not include "CartesianProduct"
  }

  test("q19: the DNF predicate rides the partkey equi-join, no nested loop") {
    val p = planOf(graft.SparkEntry.queries("q19_disjunctive_revenue")(spark, sfDir))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q_decontaminate: shingle overlap is an equi-join, never all-pairs") {
    val p = planOf(graft.SparkEntry.queries("q_decontaminate")(spark, sfDir))
    p should not include "BroadcastNestedLoopJoin"
    p should not include "CartesianProduct"
  }

  test("q2: min-cost supplier window is part-partitioned, never global") {
    val p = planOf(graft.SparkEntry.queries("q2_min_cost_supplier")(spark, sfDir))
    p should include("windowspecdefinition(ps_partkey")
    p should not include "CartesianProduct"
    p should include("BroadcastHashJoin")
  }

  test("q9: derived partsupp joins back on its composite key, no cartesian") {
    val p = planOf(graft.SparkEntry.queries("q9_product_profit")(spark, sfDir))
    p should not include "CartesianProduct"
    p should not include "BroadcastNestedLoopJoin"
    p should include("LeftSemi") // the part-name filter stays ids-only
    "HashAggregate".r.findAllIn(p).size should be >= 2
  }

  test("q11: the share threshold reuses the grouped exchange at runtime") {
    // Both the per-part values and the scalar total derive from the SAME
    // groupBy frame; AQE's ReuseExchange must materialize the partsupp
    // pipeline once (without it the whole lineitem→partsupp agg runs
    // twice). Runtime plan, not static: reuse fires during execution.
    val df = graft.SparkEntry.queries("q11_important_stock")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    "ReusedExchange".r.findAllIn(p).size should be >= 1
  }

  test("q_upsert_merge: delta applies via broadcast anti — snapshot never shuffles") {
    val p = planOf(graft.SparkEntry.queries("q_upsert_merge")(spark, sfDir))
    p should include("BroadcastHashJoin")
    p should include("LeftAnti")
    p should not include "SortMergeJoin"
    p should not include "Window" // the window formulation is oracle-only
  }

  test("q16/q20: supplier exclusion is anti, promotion screen is semi") {
    val p16 = planOf(graft.SparkEntry.queries("q16_parts_supplier_cnt")(spark, sfDir))
    p16 should include("LeftAnti")
    p16 should not include "CartesianProduct"
    val p20 = planOf(graft.SparkEntry.queries("q20_promotion_suppliers")(spark, sfDir))
    p20 should include("LeftSemi")
    p20 should not include "CartesianProduct"
  }

  // Walk the physical tree through AQE wrappers (AdaptiveSparkPlanExec and
  // query stages are collect() leaves) so shuffle payload asserts see the
  // whole plan, not just the adaptive shell.
  private def walkPlan(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    val inner = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: inner.flatMap(walkPlan)
  }

  private def assertNoVectorAcrossShuffles(df: DataFrame): Unit = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, BinaryType, FloatType}
    df.collect() // materialize so AQE's final plan (incl. reused stages) exists
    val shuffles = walkPlan(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    shuffles should not be empty
    shuffles.foreach { s =>
      val vecAttrs = s.output.filter(a => a.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      withClue(s"shuffle exchange carries vector payload: ${s.output.mkString(", ")} ") {
        vecAttrs shouldBe empty
      }
      // packVec-marked binary is the same bytes/row as the raw vector —
      // only the explicit packVecExempt audit mark may cross a shuffle
      val packedAttrs = s.output.filter(a => a.dataType == BinaryType &&
        a.metadata.contains(graft.plans.ScaleLint.PackedVectorKey) &&
        !a.metadata.contains(graft.plans.ScaleLint.PackedVectorExemptKey))
      withClue(s"shuffle exchange carries unexempted packed vector: ${s.output.mkString(", ")} ") {
        packedAttrs shouldBe empty
      }
    }
  }

  test("quantized pre-filter paths stay float-shuffle-free with " +
      "auto-broadcast DISABLED (the corpus-scale plan, r11)") {
    // at fixture scale the planner's auto-broadcast would hide an
    // unpinned corpus join; disabling it forces the plan a 10⁹-vector
    // corpus would get — every broadcast left is an explicit,
    // size-bounded pin, and candidates must flow ids+codes only
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Seq("q_sim_topk_ann_lsh", "q_hard_negatives_lsh", "q_sim_topk_ivf",
          "q_dedup_embedding_semdedup", "q_dedup_embedding_lsh",
          "q_dedup_semdedup_incremental").foreach { q =>
        withClue(q) {
          assertNoVectorAcrossShuffles(
            graft.SparkEntry.queries(q)(spark, sfDir))
        }
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("PQ ANN: no float-vector payload crosses any shuffle; rank is two-stage") {
    val df = graft.SparkEntry.queries("q_sim_topk_pq")(spark, sfDir)
    assertNoVectorAcrossShuffles(df)
    // the pool rank must have a (qid, pid)-local stage — no per-qid
    // single-partition ranking of the unpruned candidate stream
    val p = df.queryExecution.executedPlan.toString
    p should include regex """windowspecdefinition\(qid#\d+L?, pid#\d+"""
  }

  test("SQ8 ANN: no float-vector payload crosses any shuffle; rank is two-stage") {
    val df = graft.SparkEntry.queries("q_sim_topk_sq8")(spark, sfDir)
    assertNoVectorAcrossShuffles(df)
    val p = df.queryExecution.executedPlan.toString
    p should include regex """windowspecdefinition\(qid#\d+L?, pid#\d+"""
  }

  test("full-registry sweep: no query shuffles float-vector payloads (static plans)") {
    // The PQ/SQ8 pool-selection bug class, engine-wide: embedding arrays
    // (~256 B/row) must re-attach via broadcast joins AFTER candidate
    // selection, never ride a shuffle. Static physical plans (no
    // execution) — a query whose construction needs jobs (codebook
    // training, centroid collect) still only plans here.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(name) {
        val offenders = walkPlan(fn(spark, sfDir).queryExecution.executedPlan)
          .collect { case s: ShuffleExchangeLike => s }
          .flatMap(_.output.filter(_.dataType match {
            case ArrayType(FloatType, _) => true
            case _ => false
          }))
        offenders shouldBe empty
      }
    }
  }

  test("IVF-PQ ANN: no float-vector payload crosses any shuffle") {
    assertNoVectorAcrossShuffles(
      graft.SparkEntry.queries("q_sim_topk_ivfpq")(spark, sfDir))
  }

  test("IVF ANN: no float-vector payload crosses any shuffle") {
    assertNoVectorAcrossShuffles(
      graft.SparkEntry.queries("q_sim_topk_ivf")(spark, sfDir))
  }

  test("q_join_bucketed: the fact-fact join plans ZERO shuffle exchanges " +
      "(bucketed co-located layout, r12 task 7)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.{ShuffledHashJoinExec, SortMergeJoinExec}
    // auto-broadcast off: at fixture scale AQE would broadcast the tiny
    // orders side and hide the layout's point — force the plan two
    // 100 TB fact tables get, where the join MUST be shuffle-family
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val nodes = try {
      val df = graft.SparkEntry.queries("q_join_bucketed")(spark, sfDir)
      df.collect() // materialize AQE's final plan
      walkPlan(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the join is a shuffle-family join (both sides too big to pin a
    // broadcast at scale)...
    val joins = nodes.collect {
      case j: SortMergeJoinExec => j: org.apache.spark.sql.execution.SparkPlan
      case j: ShuffledHashJoinExec => j
    }
    joins should not be empty
    // ...and NOTHING below it exchanges: both scans come off the bucketed
    // layout already co-partitioned on the orderkey
    joins.foreach { j =>
      walkPlan(j).collect { case s: ShuffleExchangeLike => s } shouldBe empty
    }
    // the only exchange in the whole plan is the tiny 5-row aggregate
    val all = nodes.collect { case s: ShuffleExchangeLike => s }
    all.size should be <= 2 // partial→final agg + presentation sort
  }

  test("q_sketch_hll: per-group sketches partial-aggregate map-side") {
    val p = planOf(graft.SparkEntry.queries("q_sketch_hll")(spark, sfDir)).toLowerCase
    // partial + final ObjectHashAggregate pair around the group exchange
    // (sketches are the partial state — that is the whole point)
    p should include("hll_sketch_agg")
    "objecthashaggregate".r.findAllIn(p).size should be >= 2
  }
}
