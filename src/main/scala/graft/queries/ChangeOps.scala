package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental-processing operators: CDC-style upsert merge and snapshot
  * diff — the maintenance verbs of a continuously-ingesting 100 TB store
  * (the reference's copy pipeline feeds exactly such a store; these are
  * what runs AFTER the copy lands).
  *
  * Both inputs are derived deterministically from the orders fixture
  * (modular key predicates), so the queries are fully oracle-checkable.
  */
object ChangeOps extends QueryModule {

  // Upsert (latest-wins) merge of a small change batch into a snapshot.
  // The textbook formulation is union + row_number-by-version — but that
  // WINDOW-SHUFFLES THE WHOLE SNAPSHOT on key, which at 100 TB means
  // rewriting the world to apply a 0.1% delta. The engine's plan is the
  // scale shape: broadcast LEFT ANTI (snapshot rows whose key is in the
  // delta drop out map-side — no snapshot shuffle at all) + union of the
  // delta. The oracle states the same semantics as the window
  // formulation; with one delta per key they are identical.
  private val qUpsert = Q(
    "q_upsert_merge",
    (s, d) => {
      val snap = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      val changes = snap
        .filter(pmod(col("o_orderkey"), lit(10)) === 0)
        .withColumn("o_orderstatus", lit("U"))
      // the ONE merge implementation — shared with the streaming
      // foreachBatch CDC apply (StreamingOps.applyDelta)
      graft.streaming.StreamingOps.applyDelta(snap, changes, "o_orderkey")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH snap AS (
             SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS version
             FROM orders),
           chg AS (
             SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice,
                    1 AS version
             FROM orders WHERE o_orderkey % 10 = 0),
           merged AS (
             SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                          ORDER BY version DESC) AS rn
             FROM (SELECT * FROM snap UNION ALL SELECT * FROM chg))
           SELECT o_orderstatus, count(*) AS n_orders,
                  round(sum(o_totalprice), 2) AS total
           FROM merged WHERE rn = 1
           GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  // Snapshot diff: classify every key across two table versions as
  // added / removed / changed / same — one full-outer join on the key
  // (single shuffle, both sides pruned to key + compared columns; at
  // 100 TB both sides would be bucketed on the key and the join would be
  // exchange-free per BucketingSpec). Version B is derived from A by
  // modular predicates: keys ≡0 (mod 13) exist only in B's base (added),
  // keys ≡0 (mod 17) are dropped from B (removed), keys ≡0 (mod 10) get
  // a new status in B (changed).
  private val qDiff = Q(
    "q_snapshot_diff",
    (s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"))
      val a = base.filter(pmod(col("o_orderkey"), lit(13)) =!= 0)
        .withColumnRenamed("o_orderstatus", "status_a")
        .withColumnRenamed("o_orderkey", "key_a")
      val b = base.filter(pmod(col("o_orderkey"), lit(17)) =!= 0)
        .withColumn("o_orderstatus",
          when(pmod(col("o_orderkey"), lit(10)) === 0, lit("U"))
            .otherwise(col("o_orderstatus")))
        .withColumnRenamed("o_orderstatus", "status_b")
        .withColumnRenamed("o_orderkey", "key_b")
      a.join(b, col("key_a") === col("key_b"), "full_outer")
        .select(
          when(col("key_a").isNull, "added")
            .when(col("key_b").isNull, "removed")
            .when(col("status_a") =!= col("status_b"), "changed")
            .otherwise("same").as("change"))
        .groupBy(col("change"))
        .agg(count(lit(1)).as("n_keys"))
        .orderBy(col("change"))
    },
    Some("""WITH a AS (
             SELECT o_orderkey AS key_a, o_orderstatus AS status_a
             FROM orders WHERE o_orderkey % 13 <> 0),
           b AS (
             SELECT o_orderkey AS key_b,
                    CASE WHEN o_orderkey % 10 = 0 THEN 'U'
                         ELSE o_orderstatus END AS status_b
             FROM orders WHERE o_orderkey % 17 <> 0)
           SELECT CASE WHEN key_a IS NULL THEN 'added'
                       WHEN key_b IS NULL THEN 'removed'
                       WHEN status_a <> status_b THEN 'changed'
                       ELSE 'same' END AS change,
                  count(*) AS n_keys
           FROM a FULL OUTER JOIN b ON key_a = key_b
           GROUP BY 1 ORDER BY 1"""))

  // SCD Type-2 merge: apply an attribute-change batch to a dimension
  // KEEPING HISTORY — the warehouse verb behind "what segment was this
  // customer in when the order happened". Matched rows split into a
  // closed version (valid_to = effective date, is_current = false) and a
  // new current version; unmatched rows pass through untouched. Scale
  // shape mirrors q_upsert_merge: the delta is the small side, matched /
  // unmatched classification is a broadcast semi/anti pair — the
  // dimension is never shuffled, and the textbook union +
  // row_number-over-key plan (whole-dimension window shuffle) is
  // deliberately avoided. Output is the per-(row_type, segment) census
  // of the post-merge table.
  private val qScd2 = Q(
    "q_scd2_merge",
    (s, d) => {
      val dim = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_mktsegment"))
      val delta = dim.filter(pmod(col("c_custkey"), lit(7)) === 0)
        .withColumn("c_mktsegment", lit("UPGRADED"))
      val deltaKeys = delta.select(col("c_custkey"))
      // (full SCD2 rows would also carry valid_from/valid_to stamped from
      // the effective date; the declared output is the row_type census,
      // so the period columns are not materialized here)
      val unchanged = dim.join(broadcast(deltaKeys), Seq("c_custkey"), "left_anti")
        .select(col("c_mktsegment"), lit("unchanged").as("row_type"),
          lit(true).as("is_current"))
      val closed = dim.join(broadcast(deltaKeys), Seq("c_custkey"), "left_semi")
        .select(col("c_mktsegment"), lit("closed").as("row_type"),
          lit(false).as("is_current"))
      val fresh = delta
        .select(col("c_mktsegment"), lit("new").as("row_type"),
          lit(true).as("is_current"))
      unchanged.unionAll(closed).unionAll(fresh)
        .groupBy(col("row_type"), col("is_current"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("row_type"), col("c_mktsegment"))
    },
    Some("""WITH dim AS (SELECT c_custkey, c_mktsegment FROM customer),
           dk AS (SELECT c_custkey FROM dim WHERE c_custkey % 7 = 0),
           merged AS (
             SELECT c_mktsegment, 'unchanged' AS row_type, true AS is_current
             FROM dim WHERE c_custkey NOT IN (SELECT c_custkey FROM dk)
             UNION ALL
             SELECT c_mktsegment, 'closed', false
             FROM dim WHERE c_custkey IN (SELECT c_custkey FROM dk)
             UNION ALL
             SELECT 'UPGRADED', 'new', true FROM dk)
           SELECT row_type, is_current, c_mktsegment, count(*) AS n_rows
           FROM merged
           GROUP BY 1, 2, 3 ORDER BY row_type, c_mktsegment"""))

  override def queries: Seq[Q] = Seq(qUpsert, qDiff, qScd2)
}
