package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.operators.GlobalIndex

/** Training-export primitives: stable global example ids, balanced shard
  * assignment with a manifest, percentile winsorization, and text
  * canonicalization for normalized dedup keys.
  *
  * Scale posture: the global ordinal is `operators/GlobalIndex` (range
  * exchange + zipWithIndex two-pass — NO single-partition window); shard
  * assignment and the manifest are one narrow groupBy over (shard) after
  * that; winsorize bounds are a tiny per-group aggregate broadcast back
  * (clip itself is map-side); canonicalization is a pure per-row
  * projection feeding an id+digest-only shuffle.
  */
object ShardOps extends QueryModule {

  // Stable 1-based global example id over a total-order key — the
  // scale-safe replacement for `row_number() OVER (ORDER BY …)` (which
  // plans a single-partition window). See operators/GlobalIndex.
  private val qGlobalIndex = Q(
    "q_global_index",
    (s, d) => {
      val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
      GlobalIndex.withOrdinal(o, "example_id", col("o_orderkey"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_orderkey) AS example_id
           FROM orders ORDER BY o_orderkey"""))

  // Balanced training-shard assignment: docs ranked by token count
  // descending get round-robin shard slots (greedy LPT-ish balance on the
  // token budget), manifest = one row per shard with doc/token totals and
  // a digest of the member set. The ordinal is the GlobalIndex two-pass;
  // everything after is a single narrow shuffle keyed by shard.
  private val nShards = 8
  private val qShardManifest = Q(
    "q_shard_manifest",
    (s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), TextFunctions.tokenCount(col("text")).cast("long").as("n_toks"))
      val ranked = GlobalIndex.withOrdinal(
        docs, "ord", col("n_toks").desc, col("doc_id"))
      ranked
        .withColumn("shard", pmod(col("ord") - 1, lit(nShards.toLong)).cast("int"))
        .groupBy(col("shard"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_toks")).as("total_toks"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"))
    },
    Some(s"""WITH t AS (
             SELECT doc_id,
                    CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                         x -> len(x) > 0)) AS BIGINT) AS n_toks
             FROM documents),
           i AS (
             SELECT doc_id, n_toks,
                    row_number() OVER (ORDER BY n_toks DESC, doc_id) AS ord
             FROM t)
           SELECT CAST((ord - 1) % $nShards AS INT) AS shard,
                  count(*) AS n_docs,
                  CAST(sum(n_toks) AS BIGINT) AS total_toks,
                  min(doc_id) AS first_doc,
                  max(doc_id) AS last_doc
           FROM i GROUP BY 1 ORDER BY 1"""))

  // Percentile winsorization (outlier clipping): per-group exact p05/p95
  // bounds, values clamped into [lo, hi], per-group stats of the clipped
  // distribution. Bounds come from ExactPercentile's range-exchange
  // ordinal (r12 task 2 — expr("percentile(...)") held every group value
  // in ONE ObjectHashAggregate buffer, an OOM at a 100 TB returnflag
  // group; the ordinal path is O(rows/partition) memory, spill-safe),
  // then broadcast back to the fact; the clip is map-side (no second
  // shuffle of the fact beyond the final tiny per-group agg).
  private val qWinsorize = Q(
    "q_winsorize",
    (s, d) => {
      import graft.operators.ExactPercentile
      val li = Tables.lineitem(s, d)
      val bounds = ExactPercentile
        .perGroup(li, "l_returnflag", "l_extendedprice", Seq(0.05, 0.95))
        .groupBy(col("g"))
        .agg(
          min(when(col("p") === 0.05, col("value"))).as("lo"),
          min(when(col("p") === 0.95, col("value"))).as("hi"))
      li.join(broadcast(bounds), col("l_returnflag") === col("g"))
        .select(col("l_returnflag"), col("lo"), col("hi"),
          least(greatest(col("l_extendedprice"), col("lo")), col("hi")).as("w"),
          when(col("l_extendedprice") < col("lo"), 1L).otherwise(0L).as("c_lo"),
          when(col("l_extendedprice") > col("hi"), 1L).otherwise(0L).as("c_hi"))
        .groupBy(col("l_returnflag"))
        .agg(
          round(first(col("lo")), 4).as("p05"),
          round(first(col("hi")), 4).as("p95"),
          round(avg(col("w")), 2).as("avg_w"),
          sum(col("c_lo")).as("n_clip_lo"),
          sum(col("c_hi")).as("n_clip_hi"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },
    Some("""WITH b AS (
             SELECT l_returnflag AS g,
                    quantile_cont(l_extendedprice, 0.05) AS lo,
                    quantile_cont(l_extendedprice, 0.95) AS hi
             FROM lineitem GROUP BY 1)
           SELECT l_returnflag,
                  round(any_value(lo), 4) AS p05,
                  round(any_value(hi), 4) AS p95,
                  round(avg(least(greatest(l_extendedprice, lo), hi)), 2) AS avg_w,
                  CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
                  CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
                  count(*) AS n
           FROM lineitem JOIN b ON l_returnflag = g
           GROUP BY l_returnflag ORDER BY l_returnflag"""))

  // Canonicalized dedup key: lowercase, strip non-alphanumerics, collapse
  // whitespace — catches case/punctuation/spacing variants that byte-exact
  // sha dedup misses. Per-row projection; the group shuffle carries only
  // (md5 digest, doc_id). Output is one row per canonical group.
  private val qTextCanonical = Q(
    "q_text_canonical",
    (s, d) => {
      val canon = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9\\s]", " "), "\\s+", " "))
      Tables.documents(s, d)
        .select(col("doc_id"), md5(canon).as("ckey"))
        .groupBy(col("ckey"))
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper"))
        .orderBy(col("ckey"))
    },
    Some("""WITH c AS (
             SELECT doc_id,
                    md5(trim(regexp_replace(
                          regexp_replace(lower(text), '[^a-z0-9\s]', ' ', 'g'),
                          '\s+', ' ', 'g'))) AS ckey
             FROM documents)
           SELECT ckey, count(*) AS n_docs, min(doc_id) AS keeper
           FROM c GROUP BY ckey ORDER BY ckey"""))

  override def queries: Seq[Q] =
    Seq(qGlobalIndex, qShardManifest, qWinsorize, qTextCanonical)
}
