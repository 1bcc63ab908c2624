package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions

/** Pins the oracle-free text/vector operators: language-ID known vectors,
  * fingerprint properties, ANN recall vs the brute-force baseline, approx
  * distinct tolerance, Spark-native hash determinism.
  */
class TextVectorSpec extends SparkSpec {

  test("language-ID heuristic: known vectors") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "the cat and the dog is near that tree"),
      (2L, "el perro es la casa del pueblo que canta"),
      (3L, "straße mit schöner übung für alle"),
      (4L, "这是 一个 测试 文档"),
      (5L, "zzz qqq rrr www")).toDF("id", "text")
      .select(col("id"), langIdHeuristic(col("text")).as("lang"))
    df.orderBy("id").collect().map(_.getString(1)).toSeq shouldBe
      Seq("en", "es", "de", "zh", "und")
  }

  test("fingerprint: deterministic, order-sensitive, bounded") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"), (4L, "")).toDF("id", "text")
      .select(col("id"), fingerprint(col("text")).as("fp"))
    val fps = df.orderBy("id").collect().map(_.getLong(1))
    fps(0) shouldBe fps(1)           // deterministic
    fps(0) should not be fps(2)      // rolling (order matters)
    fps(3) shouldBe 0L               // empty text → identity
    all(fps) should (be >= 0L and be < 2147483647L)
  }

  test("PII scrub: planted emails and phone numbers are replaced, clean text untouched") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, "contact me at alice.smith+spam@example-mail.co.uk for details"),
      (2L, "call +1 (555) 123-4567 or 555 867 5309 now"),
      (3L, "bob@corp.io and his line 0171-555-0123"),
      (4L, "no personal data here at all"),
      (5L, "server at 192.168.001.254 responded"),
      (6L, "paid with 4111-1111-1111-1111 and 4012 8888 8888 1881"),
      (7L, "mixed: 10.0.0.1 then card 5555555555554444 then 555-867-5309"),
      (8L, "acct 1234-5678-9012-3456-7890 via 10.1.2.3.4 today"))
      .toDF("id", "text")
      .select(col("id"), scrubPii(col("text")).as("scrubbed"))
    val out = df.orderBy("id").collect().map(_.getString(1)).toSeq
    out(0) shouldBe "contact me at [EMAIL] for details"
    out(1) shouldBe "call [PHONE] or [PHONE] now"
    out(2) shouldBe "[EMAIL] and his line [PHONE]"
    out(3) shouldBe "no personal data here at all"
    // scrub order: IP before phone (octet runs), card before phone
    // (16-digit runs) — each lands in its own bucket, never [PHONE]
    out(4) shouldBe "server at [IP] responded"
    out(5) shouldBe "paid with [CARD] and [CARD]"
    out(6) shouldBe "mixed: [IP] then card [CARD] then [PHONE]"
    // longer-than-expected sequences scrub WHOLE, never a valid-length
    // prefix with an identifying residue (the {3,} open repetition)
    out(7) shouldBe "acct [CARD] via [IP] today"
  }

  test("ANN LSH top-k achieves usable recall vs brute force on the fixture") {
    val brute = graft.SparkEntry.queries("q_sim_topk_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = graft.SparkEntry.queries("q_sim_topk_ann_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    brute should not be empty
    val recall = brute.count(ann.contains).toDouble / brute.size
    recall should be >= 0.4 // 3 tables × 8-bit buckets on near-uniform
                            // synthetic vectors; raise with more tables
  }

  test("LSH hard negatives: recall vs broadcast-brute baseline, no nested-loop join") {
    val brute = graft.SparkEntry.queries("q_hard_negatives")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val lshQ = graft.SparkEntry.queries("q_hard_negatives_lsh")(spark, sfDir)
    // the scale path routes candidates through bucket equi-joins — the
    // label-mismatch predicate must never become a nested loop
    val plan = lshQ.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val lsh = lshQ.collect()
    // same output contract as the brute twin: per-qid ranks 1..k, labels differ
    lsh.foreach { r => r.get(1) should not be r.get(4) }
    val lshPairs = lsh.map(r => (r.getLong(0), r.getLong(3))).toSet
    brute should not be empty
    val recall = brute.count(lshPairs.contains).toDouble / brute.size
    recall should be >= 0.4 // near-uniform synthetic vectors are LSH's
                            // worst case (cf. q_sim_topk_ann_lsh note)
  }

  test("embedding LSH near-dup: recall vs exact baseline, no nested-loop join") {
    val exact = graft.SparkEntry.queries("q_dedup_embedding_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshQ = graft.SparkEntry.queries("q_dedup_embedding_lsh")(spark, sfDir)
    // the scale path must never plan an all-pairs join
    val plan = lshQ.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val lsh = lshQ.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    // every LSH-surfaced pair is exact-verified, so zero false positives
    lsh.diff(exact) shouldBe empty
    val recall = exact.count(lsh.contains).toDouble / exact.size
    recall should be >= 0.4 // near-uniform synthetic vectors are LSH's
                            // worst case (cf. q_sim_topk_ann_lsh note)
  }

  test("SemDeDup within-cell pairs: zero false positives vs exact baseline, " +
      "recall at or above the LSH twin's floor, no all-pairs join") {
    val exact = graft.SparkEntry.queries("q_dedup_embedding_cosine")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sdQ = graft.SparkEntry.queries("q_dedup_embedding_semdedup")(spark, sfDir)
    // the corpus-scale plan must never be the all-pairs baseline
    val plan = sdQ.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    val sd = sdQ.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    exact should not be empty
    // within-cell pairs are exact-cosine verified ⇒ a strict subset
    sd.diff(exact) shouldBe empty
    // recall = P[both members co-locate in one top-nProbe cell]; the
    // nProbe=3 default measured 1.0 here (n=500) and 0.83 at the 2k
    // fixture — pin comfortably above the LSH twin's 0.4 floor
    val recall = exact.count(sd.contains).toDouble / exact.size
    recall should be >= 0.6
    // the native top-p assigner agrees with the argmin at p=1 and
    // orders by ascending distance
    val e0 = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.normSq(col("embedding")).as("n2"))
    val cents = graft.operators.IvfIndex.centroids(spark, e0, 4)
    val hard = graft.operators.IvfIndex.assign(e0, cents)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val soft1 = graft.operators.IvfIndex.assignTop(e0, cents, 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    soft1 shouldBe hard
    // p = k returns every valid cell exactly once per vector (the hash
    // sampler may yield fewer than the requested k seeds — use the
    // realized count)
    val nc = cents.count()
    graft.operators.IvfIndex.assignTop(e0, cents, nc.toInt)
      .groupBy(col("vec_id")).count()
      .agg(min(col("count")), max(col("count")))
      .collect().head.toSeq shouldBe Seq(nc, nc)
    // keeper composition is consistent: every cluster keeper is a pair
    // member, members count ≥ 2
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        graft.functions.VectorFunctions.normSq(col("embedding")).as("n2"))
    val keep = graft.operators.SemDedup.keepers(spark, e,
      graft.operators.SemDedup.cellsFor(500L), 0.45).collect()
    val members = sd.flatMap(p => Seq(p._1, p._2))
    keep.foreach { r =>
      members should contain(r.getLong(1)) // keeper
      r.getLong(2) should be >= 2L // n_members
    }
  }

  test("occupancy-targeted LSH bucket width: fixture stays at the pinned b=4, scale grows as log2") {
    // the recall test above runs at the auto-sized default, so this pins
    // that the default IS b=4 at fixture cardinalities (n ≤ 2000) and
    // grows exactly one bit per doubling beyond the 125-occupancy knee
    VectorQueries.lshBitsFor(1) shouldBe 4
    VectorQueries.lshBitsFor(2000) shouldBe 4
    VectorQueries.lshBitsFor(125L << 4) shouldBe 4
    VectorQueries.lshBitsFor((125L << 4) + 1) shouldBe 5
    VectorQueries.lshBitsFor(20000) shouldBe 8
    VectorQueries.lshBitsFor(10000000L) shouldBe 17
    // explicit conf override wins over auto-sizing: the planned
    // LshBuckets expression must carry the overridden width
    spark.conf.set("spark.graft.lsh.bits", "6")
    try {
      val plan = graft.SparkEntry.queries("q_dedup_embedding_lsh")(spark, sfDir)
        .queryExecution.optimizedPlan
      val widths = plan.collect { case node =>
        node.expressions.flatMap(_.collect {
          case graft.plans.LshBuckets(_, b, _) => b
        })
      }.flatten.toSet
      widths shouldBe Set(6)
    } finally spark.conf.unset("spark.graft.lsh.bits")
  }

  test("IVF top-k achieves usable recall vs brute force on the fixture") {
    val brute = graft.SparkEntry.queries("q_sim_topk_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.SparkEntry.queries("q_sim_topk_ivf")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    brute should not be empty
    val recall = brute.count(ivf.contains).toDouble / brute.size
    recall should be >= 0.3 // 3/16 cells probed on near-uniform vectors —
                            // the partition-pruning structure is what's
                            // under test, not the synthetic-data recall
  }

  test("SQ8 quantized top-k: high recall vs brute force (exact rescore over approx candidates)") {
    val brute = graft.SparkEntry.queries("q_sim_topk_brute")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val sq8 = graft.SparkEntry.queries("q_sim_topk_sq8")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    brute should not be empty
    // unlike the bucketed paths, SQ8 scores EVERY vector (on the coarse
    // grid) and rescores the top-3k exactly, so near-perfect recall is
    // the contract — a miss requires the true kth neighbor to fall
    // outside the approx top-15, i.e. quantization error > the cos gap
    val recall = brute.count(sq8.contains).toDouble / brute.size
    recall should be >= 0.8
  }

  test("freqItems vocab sketch: superset of all true heavy hitters") {
    import org.apache.spark.sql.functions.{col, explode, lower, split}
    val toks = graft.Tables.documents(spark, sfDir)
      .select(explode(split(lower(col("text")), "\\s+")).as("token"))
      .filter(org.apache.spark.sql.functions.length(col("token")) > 0)
    val total = toks.count()
    val exactHeavy = toks.groupBy("token").count()
      .filter(col("count") > total * 0.01)
      .collect().map(_.getString(0)).toSet
    val sketch = graft.SparkEntry.queries("q_vocab_approx")(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    exactHeavy should not be empty
    // one-sided guarantee: no heavy hitter is missed
    exactHeavy.diff(sketch) shouldBe empty
  }

  test("sq8_code_dot equals dot over dequantized byte codes bit-exactly") {
    import graft.operators.Sq8Index
    val e = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        VectorFunctions.normSq(col("embedding")).as("n2"))
    val grid = Sq8Index.train(e)
    val coded = Sq8Index.packCodes(Sq8Index.encode(e, grid), grid)
    // a bounded pair sample: adjacent ids
    val pairs = coded.select(col("vec_id").as("ia"), col("bcode").as("ca"),
        col("an2"))
      .join(coded.select((col("vec_id") + 1).as("ia"), col("bcode").as("cb")),
        "ia")
      .withColumn("fused",
        VectorFunctions.sq8Dot(col("ca"), col("cb"), grid.lo, grid.step))
      .withColumn("composed", VectorFunctions.dot(
        Sq8Index.dequantByte(col("ca"), grid),
        Sq8Index.dequantByte(col("cb"), grid)))
      .withColumn("n2composed", VectorFunctions.normSq(
        Sq8Index.dequantByte(col("ca"), grid)))
      .collect()
    pairs.length should be > 10
    // bit-exact: same per-element float reconstruction, same double fold
    // (columns: ia, ca, an2, cb, fused, composed, n2composed)
    pairs.foreach { r =>
      r.getDouble(4) shouldBe r.getDouble(5)       // fused == composed dot
      r.getDouble(2) shouldBe r.getDouble(6)       // packCodes an2 == normSq
    }
  }

  test("float_vec_dot: length mismatch and null elements propagate as NULL") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(3.0f, 4.0f)),
      (2L, Array(1.0f), Array(3.0f, 4.0f))).toDF("id", "a", "b")
      .select(col("id"), graft.functions.VectorFunctions.dot(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    df(0).getDouble(1) shouldBe 11.0
    df(1).isNullAt(1) shouldBe true
  }

  test("cosine: self-similarity 1, orthogonal 0") {
    val sp = spark; import sp.implicits._
    val df = Seq(
      (1L, Array(1.0f, 0.0f), Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f), Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("id", "a", "b")
      .select(col("id"), round(VectorFunctions.cosine(col("a"), col("b")), 6).as("cos"))
    df.orderBy("id").collect().map(_.getDouble(1)).toSeq shouldBe Seq(1.0, 0.0, 0.0)
  }

  test("approx_percentile within 2% of the exact percentile on lineitem") {
    // accuracy=1000 bounds RANK error at ~0.1%; on the smooth
    // extendedprice distribution that is far inside a 2% VALUE band —
    // the tolerance pin the registry's rows-only contract names
    val approx = graft.SparkEntry.queries("q_agg_approx_percentile")(spark, sfDir)
      .collect()(0).getDouble(0)
    val exact = graft.Tables.lineitem(spark, sfDir)
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect()(0).getDouble(0)
    math.abs(approx - exact) / exact should be <= 0.02
  }

  test("approx_count_distinct within its 1% error band on lineitem") {
    val exact = graft.Tables.lineitem(spark, sfDir)
      .select(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = graft.SparkEntry.queries("q_agg_approx_distinct")(spark, sfDir)
      .collect()(0).getLong(0)
    math.abs(approx - exact).toDouble / exact should be <= 0.05
  }

  test("Spark-native hashes are stable across runs (pinned vectors)") {
    val sp = spark; import sp.implicits._
    val df = Seq("graft").toDF("s").select(
      hash(col("s")).as("murmur3"),
      xxhash64(col("s")).as("xx"),
      crc32(col("s").cast("binary")).as("crc"))
    val r1 = df.collect()(0)
    val r2 = df.collect()(0)
    r1 shouldBe r2
    // murmur3/xxhash64 seeds are fixed in Spark — values are contractual
    r1.getLong(2) shouldBe 31255620L // CRC32 of "graft" (public algorithm)
  }
}
