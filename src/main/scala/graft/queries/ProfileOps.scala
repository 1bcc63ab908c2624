package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Data-profiling + data-quality gate (the Deequ-shaped surface a
  * pipeline runs before accepting a new drop of data).
  *
  * Scale posture: ONE single-column pass PER profiled column, unioned.
  * The obvious alternative — all metrics in one Aggregate — plans every
  * multi-column distinct through Expand, which multiplies the fact
  * map-side by (#distinct columns + 1): measured 32 GB of spill on
  * 1.5 GB of input at the 100× fixture, a 21× write amplification that
  * grows with column count (≈PB of spill at 100 TB). Per-column
  * branches instead each read ONE pruned column (total input bytes ≈
  * one full-width scan) and plan count_distinct as the single-distinct
  * two-phase aggregate — partial map-side combine on the value, no
  * Expand, zero spill. Each expectation is a narrow aggregate (or
  * anti-join for referential integrity) producing one row; the union is
  * of 1-row plans.
  */
object ProfileOps extends QueryModule {

  private val profiled = Seq(
    "l_orderkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax")

  private val qProfile = Q(
    "q_profile_columns",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val perCol = profiled.map { c =>
        li.select(col(c))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
            count_distinct(col(c)).as("n_distinct"),
            round(min(col(c)).cast("double"), 4).as("min_v"),
            round(max(col(c)).cast("double"), 4).as("max_v"),
            round(avg(col(c)), 4).as("avg_v"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_v"), col("max_v"), col("avg_v"))
      }
      perCol.reduce(_ unionAll _).orderBy(col("col_name"))
    },
    Some {
      val parts = profiled.map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
              CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              count(DISTINCT $c) AS n_distinct,
              round(CAST(min($c) AS DOUBLE), 4) AS min_v,
              round(CAST(max($c) AS DOUBLE), 4) AS max_v,
              round(avg($c), 4) AS avg_v
            FROM lineitem"""
      }
      parts.mkString("", " UNION ALL ", " ORDER BY col_name")
    })

  // Expectation suite: one row per check, (scope, n_checked, n_violations,
  // passed). Referential integrity is a LEFT ANTI join (ids-only shuffle);
  // everything else is a conditional count in one narrow aggregate.
  private val qExpectations = Q(
    "q_expectations",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val docs = Tables.documents(s, d)
      def checkRow(name: String, checked: org.apache.spark.sql.DataFrame,
          violations: org.apache.spark.sql.Column) =
        checked.agg(count(lit(1)).as("n_checked"),
            sum(violations.cast("long")).as("n_violations"))
          .select(lit(name).as("check"), col("n_checked"), col("n_violations"),
            (col("n_violations") === 0).as("passed"))
      val pkUnique = li
        .groupBy(col("l_orderkey"), col("l_linenumber")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_checked"),
          sum(col("c") - 1).as("n_violations"))
        .select(lit("lineitem_pk_unique").as("check"),
          col("n_checked"), col("n_violations"), (col("n_violations") === 0).as("passed"))
      val fk = li.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(coalesce(count(lit(1)), lit(0L)).as("n_violations"))
        .select(lit("lineitem_fk_orders").as("check"),
          lit(null).cast("long").as("n_checked"),
          col("n_violations"), (col("n_violations") === 0).as("passed"))
      checkRow("lineitem_qty_range", li,
          !(col("l_quantity") >= 1 && col("l_quantity") <= 50))
        .unionAll(checkRow("lineitem_discount_range", li,
          !(col("l_discount") >= 0 && col("l_discount") <= 0.1)))
        .unionAll(checkRow("orders_status_domain", o,
          !col("o_orderstatus").isin("F", "P", "O")))
        .unionAll(checkRow("docs_nonempty", docs, col("n_chars") <= 0))
        .unionAll(pkUnique)
        .unionAll(fk)
        .orderBy(col("check"))
    },
    Some("""SELECT 'lineitem_qty_range' AS check, count(*) AS n_checked,
              CAST(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
              CAST(sum(CASE WHEN NOT (l_quantity >= 1 AND l_quantity <= 50)
                            THEN 1 ELSE 0 END) AS BIGINT) = 0 AS passed
           FROM lineitem
           UNION ALL
           SELECT 'lineitem_discount_range', count(*),
              CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.1)
                            THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN NOT (l_discount >= 0 AND l_discount <= 0.1)
                            THEN 1 ELSE 0 END) AS BIGINT) = 0
           FROM lineitem
           UNION ALL
           SELECT 'orders_status_domain', count(*),
              CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','P','O')
                            THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','P','O')
                            THEN 1 ELSE 0 END) AS BIGINT) = 0
           FROM orders
           UNION ALL
           SELECT 'docs_nonempty', count(*),
              CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT) = 0
           FROM documents
           UNION ALL
           SELECT 'lineitem_pk_unique', CAST(sum(c) AS BIGINT),
              CAST(sum(c - 1) AS BIGINT), CAST(sum(c - 1) AS BIGINT) = 0
           FROM (SELECT count(*) AS c FROM lineitem
                 GROUP BY l_orderkey, l_linenumber)
           UNION ALL
           SELECT 'lineitem_fk_orders', NULL,
              CAST(count(*) AS BIGINT), count(*) = 0
           FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
           ORDER BY "check""""))

  override def queries: Seq[Q] = Seq(qProfile, qExpectations)
}
