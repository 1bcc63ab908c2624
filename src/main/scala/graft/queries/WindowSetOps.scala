package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Window functions, global sort / limit / top-k, set operations
  * (SURVEY.md §2 Part B). Window partitions are customer-grained so at
  * 100 TB the state per partition stays bounded (orders-per-customer), and
  * ordering keys always include a unique tiebreaker so ranks are
  * deterministic across engines.
  */
object WindowSetOps extends QueryModule {

  // Deterministic ordering: totalprice DESC then orderkey.
  private val wCust = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  private val qWinRank = Q(
    "q_win_rank",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        // BIGINT like the oracle's rank functions — the r16 typed gate
        // (check_except TYPE-DIFF) flags INT-vs-BIGINT drifts that SQL
        // coercion used to hide
        row_number().over(wCust).cast("long").as("rn"),
        rank().over(wCust).cast("long").as("rnk"),
        dense_rank().over(wCust).cast("long").as("drnk"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
             row_number() OVER w AS rn, rank() OVER w AS rnk,
             dense_rank() OVER w AS drnk
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
           ORDER BY o_orderkey"""))

  /** Global ntile WITHOUT the single-partition window (`ntile(k) OVER
    * (ORDER BY …)` moves the whole table through one task — the named
    * scale-killer). Exact two-pass distributed ranking instead:
    *
    *   pass 1: bin rows by floor(price); per-bin counts → cumulative
    *           offsets (a window over #bins rows — thousands, not n —
    *           which is the legitimate "small result" global pass);
    *   pass 2: row_number within each bin (partitioned window, bounded
    *           state) + broadcast offset = exact global rank, then the
    *           closed-form ntile bucket: the first n%k buckets get
    *           ⌈n/k⌉ rows, the rest ⌊n/k⌋ — identical output to ntile().
    */
  private val qWinNtile = Q(
    "q_win_ntile",
    (s, d) => {
      val k = 4
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("bin", floor(col("o_totalprice")).cast("long"))
      // cumulative offsets over #bins AGGREGATED rows — the
      // lint-sanctioned bounded global pass (constant-key partition
      // specs get eliminated by the optimizer, so the runtime
      // "No Partition Defined" warning for this deliberate shape is
      // instead silenced by LogHygiene; ScaleLint still flags any
      // global window over an UNBOUNDED producer at plan time)
      val binCounts = o.groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      val wBins = Window.orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = binCounts
        .withColumn("off", coalesce(sum(col("cnt")).over(wBins), lit(0L)))
        .select(col("bin"), col("off"))
      val total = binCounts.agg(sum(col("cnt")).as("n"))
      val wInBin = Window.partitionBy(col("bin"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      o.withColumn("lrn", row_number().over(wInBin))
        .join(broadcast(offsets), "bin")
        .crossJoin(broadcast(total))
        .withColumn("rn", col("off") + col("lrn"))
        // q = ⌊n/k⌋, r = n mod k; rank ≤ (q+1)·r ⇒ bucket ⌈rn/(q+1)⌉,
        // else r + ⌈(rn − (q+1)·r)/q⌉ — integer ceil via (x−1) div m + 1.
        .withColumn("q", expr(s"n div $k"))
        .withColumn("r", expr(s"n % $k"))
        .withColumn("quartile",
          when(col("rn") <= (col("q") + 1) * col("r"),
            expr("(rn - 1) div (q + 1) + 1"))
            .otherwise(expr("r + (rn - (q + 1) * r - 1) div q + 1"))
            .cast("long")) // BIGINT like the oracle's ntile (r16 typed gate)
        .select(col("o_orderkey"), col("quartile"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey,
             ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile
           FROM orders ORDER BY o_orderkey"""))

  private val wCustByDate = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_orderdate"), col("o_orderkey"))

  private val qWinLagLead = Q(
    "q_win_lag_lead",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        lag(col("o_orderdate"), 1).over(wCustByDate).as("prev_date"),
        lead(col("o_orderdate"), 1).over(wCustByDate).as("next_date"),
        first(col("o_orderdate")).over(wCustByDate).as("first_date"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
             lag(o_orderdate, 1) OVER w AS prev_date,
             lead(o_orderdate, 1) OVER w AS next_date,
             first_value(o_orderdate) OVER w AS first_date
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
           ORDER BY o_orderkey"""))

  // Running sum with an explicit ROWS frame.
  private val qWinFrame = Q(
    "q_win_frame",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        round(sum(col("o_totalprice")).over(
          wCustByDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
             round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
           FROM orders ORDER BY o_orderkey"""))

  // last_value with the full-partition frame (the default running frame
  // makes last_value degenerate to the current row).
  private val qWinLastValue = Q(
    "q_win_last_value",
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        last(col("o_orderdate")).over(
          wCustByDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
          .as("latest_date"),
        round(max(col("o_totalprice")).over(
          wCustByDate.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), 2)
          .as("max_price"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
             last_value(o_orderdate) OVER w AS latest_date,
             round(max(o_totalprice) OVER w, 2) AS max_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
           ORDER BY o_orderkey"""))

  // RANGE frame: value-based window (all orders within 10k price below the
  // current row's price, per status) — frame membership depends on values,
  // not row positions, so ties get identical results on both engines.
  private val qWinRangeFrame = Q(
    "q_win_range_frame",
    // partitioned by customer, not by the 3-value order status: a
    // window keyed on a near-constant column caps parallelism at
    // #distinct-keys tasks (3 here) and is the same unbounded-state
    // smell at 100 TB that the scale lint exists for
    (s, d) => Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_custkey"),
        count(lit(1)).over(
          Window.partitionBy(col("o_custkey"))
            .orderBy(col("o_totalprice"))
            .rangeBetween(-10000L, Window.currentRow)).as("n_in_band"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
             count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
               RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
           FROM orders ORDER BY o_orderkey"""))

  // Top-k per group: the scalable pattern (no global sort of the fact table;
  // per-partition heap via window + filter).
  private val qWinTopK = Q(
    "q_win_topk",
    (s, d) => Tables.orders(s, d)
      .withColumn("rn", row_number().over(wCust).cast("long")) // BIGINT like the oracle
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("rn"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("o_custkey"), col("rn")),
    Some("""SELECT o_custkey, o_orderkey, rn, round(o_totalprice, 2) AS price
           FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
                 FROM orders) t
           WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---- sort / limit -------------------------------------------------------

  private val qSortMulti = Q(
    "q_sort_multi",
    (s, d) => Tables.orders(s, d)
      .orderBy(
        asc_nulls_first("o_orderstatus"),
        desc("o_totalprice"),
        asc("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(col("o_totalprice"), 2).as("price"))
      .limit(100),
    Some("""SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           FROM orders
           ORDER BY o_orderstatus ASC NULLS FIRST, o_totalprice DESC, o_orderkey ASC
           LIMIT 100"""))

  // Global top-k: TakeOrderedAndProject, not a full sort.
  private val qLimitTopK = Q(
    "q_limit_topk",
    (s, d) => Tables.lineitem(s, d)
      .orderBy(desc("l_extendedprice"), asc("l_orderkey"), asc("l_linenumber"))
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 2).as("price"))
      .limit(10),
    Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
           FROM lineitem
           ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
           LIMIT 10"""))

  // ---- set operations -----------------------------------------------------

  private val qUnionAll = Q(
    "q_set_union_all",
    (s, d) => {
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "FURNITURE")
        .select(col("c_custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      a.unionAll(b).agg(count(lit(1)).as("cnt"))
    },
    Some("""SELECT count(*) AS cnt FROM (
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
             UNION ALL
             SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t"""))

  private val qUnionDistinct = Q(
    "q_set_union_distinct",
    (s, d) => {
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "FURNITURE")
        .select(col("c_custkey"))
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
        .select(col("c_custkey"))
      a.union(b).distinct().agg(count(lit(1)).as("cnt"))
    },
    Some("""SELECT count(*) AS cnt FROM (
             SELECT c_custkey FROM customer WHERE c_mktsegment = 'FURNITURE'
             UNION
             SELECT c_custkey FROM customer WHERE c_acctbal > 5000) t"""))

  private val qIntersect = Q(
    "q_set_intersect",
    (s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      f.intersect(o).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           INTERSECT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           ORDER BY o_custkey"""))

  private val qExcept = Q(
    "q_set_except",
    (s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      f.except(o).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
           EXCEPT
           SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
           ORDER BY o_custkey"""))

  // Relative-rank analytics: percent_rank and cume_dist inside customer
  // partitions (same bounded-state posture as every window here).
  private val qWinPercentRank = Q(
    "q_win_percent_rank",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey")).orderBy(col("o_totalprice"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 200)
        .select(col("o_custkey"), col("o_orderkey"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
             round(percent_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 4) AS pr,
             round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_totalprice), 4) AS cd
           FROM orders WHERE o_custkey < 200
           ORDER BY o_custkey, o_orderkey"""))

  // Multiset semantics: EXCEPT ALL keeps duplicate cardinalities
  // (|A|−|B| copies survive) — a different operator from EXCEPT, which
  // Spark plans as a left-anti join after distinct.
  private val qExceptAll = Q(
    "q_set_except_all",
    (s, d) => {
      val f = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey"))
      val o = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
        .select(col("o_custkey"))
      f.exceptAll(o)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, count(*) AS n FROM (
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             EXCEPT ALL
             SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t
           GROUP BY o_custkey ORDER BY o_custkey"""))

  // Pivot: long→wide conditional aggregation with a FIXED column list
  // (explicit pivot values keep the schema static — at scale an
  // unconstrained pivot would need a distinct-values pass first and can
  // explode the schema; the oracle replays it as conditional sums).
  private val qPivot = Q(
    "q_pivot",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .withColumnsRenamed(Map("A" -> "qty_a", "N" -> "qty_n", "R" -> "qty_r"))
      .orderBy(col("l_linestatus")),
    Some("""SELECT l_linestatus,
             round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS qty_a,
             round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS qty_n,
             round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS qty_r
           FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""))

  // Unpivot/melt: wide→long (the inverse reshape; pure map-side — each
  // input row emits one row per unpivoted column, no shuffle).
  private val qUnpivot = Q(
    "q_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("double").as("quantity"),
        col("l_discount").cast("double").as("discount"),
        col("l_tax").cast("double").as("tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("quantity"), col("discount"), col("tax")),
        "measure", "val")
      .select(col("l_orderkey"), col("l_linenumber"), col("measure"),
        round(col("val"), 4).as("val"))
      // val joins the sort to make it TOTAL: duplicate (orderkey,
      // linenumber) keys exist in the fixture, so a (key, measure) tie
      // with different values is engine-whim order (SCALE.md §sf1-oracle)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"),
        col("val")),
    Some("""SELECT l_orderkey, l_linenumber, measure, round(val, 4) AS val
           FROM (
             SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
               CAST(l_quantity AS DOUBLE) AS val FROM lineitem WHERE l_orderkey < 100
             UNION ALL
             SELECT l_orderkey, l_linenumber, 'discount', CAST(l_discount AS DOUBLE)
             FROM lineitem WHERE l_orderkey < 100
             UNION ALL
             SELECT l_orderkey, l_linenumber, 'tax', CAST(l_tax AS DOUBLE)
             FROM lineitem WHERE l_orderkey < 100) t
           ORDER BY l_orderkey, l_linenumber, measure, val"""))

  override def queries: Seq[Q] = Seq(
    qWinRank, qWinNtile, qWinLagLead, qWinLastValue, qWinFrame,
    qWinRangeFrame, qWinTopK, qWinPercentRank,
    qSortMulti, qLimitTopK,
    qUnionAll, qUnionDistinct, qIntersect, qExcept, qExceptAll,
    qPivot, qUnpivot)
}
