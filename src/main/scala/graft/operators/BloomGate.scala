package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter membership gate — the set-membership member of the
  * mergeable-sketch family (HLL = distinct counts, KLL = quantiles,
  * CMS = frequencies, Bloom = membership), applied to the standing
  * exact-dedup problem: "which rows of today's batch are NOT already in
  * the corpus?".
  *
  * Build side is Spark's own `BloomFilterAggregate` (the expression
  * behind AQE's injected runtime filters): a single distributed pass
  * over the corpus keys folds partition-local filters map-side and
  * OR-merges them — a fixed-size, commutative, mergeable binary, never
  * a per-key shuffle. Probe side is `BloomFilterMightContain` with the
  * filter embedded as a binary literal, so the batch-side probe is
  * whole-stage-codegen'd and shuffle-free.
  *
  * Exactness: a Bloom filter has NO false negatives, so rows the probe
  * rejects are definitely new and skip the confirm join entirely; only
  * the "maybe" rows (true duplicates + an fpp-sized sliver of false
  * positives) enter the exact anti-join against the corpus keys. The
  * union of both paths is therefore EXACTLY the anti-join answer — the
  * q_dedup_bloom_gate oracle proves this at hash strength, independent
  * of which rows took which path.
  *
  * Scale posture at 100 TB: the corpus never ships — one digest-column
  * scan builds the filter (~1.2 GiB for 10⁹ keys at 1% fpp; size is
  * O(corpus cardinality), not O(corpus bytes)). For the common
  * mostly-new batch (web crawl refresh), (1 − fpp)·|new| rows never
  * touch an exchange; the confirm join's stream side shrinks to
  * |dups| + fpp·|batch|. Keys are pre-hashed with xxhash64, so only
  * 8-byte longs enter the aggregate regardless of key width.
  */
object BloomGate {

  /** Serialized Bloom filter over xxhash64(key) for every row of `df`
    * (xxhash64 folds a null key to its seed, so null rows land in the
    * filter too — consistent with the probe side, and the confirm
    * join's null-never-equals still gives exact anti-join semantics).
    * Returns null iff `df` is empty (Spark's BloomFilterAggregate
    * convention) — [[newRows]] treats that as the empty corpus.
    * m = -n·ln(p)/(ln 2)² bits, the standard sizing.
    */
  def buildBloom(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double): Array[Byte] = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1,
      s"bad bloom params: n=$expectedItems p=$fpp")
    val numBits = math.ceil(
      -expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    val agg = new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = df.select(ColumnBridge.column(agg)).head()
    if (row.isNullAt(0)) null else row.getAs[Array[Byte]](0)
  }

  /** Codegen'd probe: might `key` be in the serialized filter? The
    * filter rides the plan as a literal (deserialized once per task,
    * not per row). No false negatives; false positives at ~fpp.
    */
  def mightContain(bloomBytes: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType),
      ColumnBridge.expression(xxhash64(key))))

  /** Rows of `batch` whose `keyName` value does not occur in
    * `corpus(keyName)` — exact (anti-join semantics), bloom-accelerated:
    * definitely-new rows short-circuit past the join; only maybe-rows
    * are confirmed against the corpus keys.
    */
  def newRows(batch: DataFrame, corpus: DataFrame, keyName: String,
      expectedItems: Long, fpp: Double): DataFrame = {
    val bytes =
      buildBloom(corpus.select(col(keyName)), col(keyName), expectedItems, fpp)
    if (bytes == null) return batch // empty corpus: everything is new
    val flagged = batch.withColumn("__bloom_maybe",
      mightContain(bytes, col(keyName)))
    val definite = flagged.filter(!col("__bloom_maybe")).drop("__bloom_maybe")
    val confirmed = flagged.filter(col("__bloom_maybe")).drop("__bloom_maybe")
      .join(corpus.select(col(keyName)).distinct(), Seq(keyName), "left_anti")
    definite.unionByName(confirmed)
  }
}
