package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions.normSq

/** Pins the incremental SemDeDup artifact (operators/SemDedup §persisted):
  * append == re-assignment at the frozen model, planted cross-batch
  * duplicate recovery across TWO ingest days, batch-purity (standing
  * pairs never re-emitted), exact-verified zero false positives, and the
  * meta-last commit contract.
  */
class SemDedupSpec extends SparkSpec {

  // deterministic synthetic corpus: 4 well-separated direction clusters
  // in dim 8, unit-ish vectors with a small per-id wobble — cosine within
  // a cluster ≈ 1, across clusters ≈ 0
  private def vec(cluster: Int, salt: Long): Array[Float] = {
    val v = Array.fill(8)(0.01f * ((salt % 7) + 1))
    v(cluster * 2) = 1.0f
    v(cluster * 2 + 1) = 0.1f * ((salt % 5) + 1)
    v
  }

  private def vdf(rows: (Long, Array[Float])*): DataFrame = {
    val sp = spark; import sp.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        normSq(col("embedding")).as("n2"))
  }

  private val base = vdf((0L until 40L).map(i =>
    (i, vec((i % 4).toInt, i))): _*)
  // day-1 batch: 101 duplicates base id 6 EXACTLY; 102 is a fresh
  // direction nothing matches; 103 near-duplicates base id 13
  private val day1 = vdf(
    (101L, vec(2, 6L)), (102L, Array.fill(8)(0.35f)), (103L, vec(1, 13L)))
  // day-2 batch: 201 duplicates DAY-1's 102 — found only if the day-1
  // append really grew the standing side
  private val day2 = vdf((201L, Array.fill(8)(0.35f)))

  private def freshArtifact(): String = {
    val dir = tmpDir("semdedup").toString + "/idx"
    SemDedup.save(dir, base, k = 4)
    dir
  }

  test("save commits meta-last; half-written artifact invisible") {
    val dir = freshArtifact()
    ArtifactPaths.exists(dir) shouldBe true
    val half = tmpDir("semdedup_half").toString + "/idx"
    // simulate a crash after the heavy write but before the marker
    SemDedup.save(half, base, k = 4)
    val meta = new java.io.File(s"$half/meta")
    meta.listFiles().foreach(_.delete()); meta.delete()
    ArtifactPaths.exists(half) shouldBe false
  }

  test("append == re-assignment at the frozen model (the IVF-append contract)") {
    val dir = freshArtifact()
    SemDedup.appendBatch(spark, dir, day1, base.unionAll(day1), 0.9)
    val m = SemDedup.load(spark, dir)
    // expected batch rows: the PUBLIC frozen-model pipeline the operator
    // documents — assignTop at the stored centroids + packCodes at the
    // stored grid
    val expected = IvfIndex.assignTop(day1, m.cents, m.nProbe)
      .join(Sq8Index.packCodes(Sq8Index.encode(day1, m.grid), m.grid),
        "vec_id")
      .select(col("vec_id"), col("cell"), col("bcode"), col("an2"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Byte](2), r.getDouble(3))).toSet
    val stored = m.assign.filter(col("vec_id") >= 100)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Byte](2), r.getDouble(3))).toSet
    stored shouldBe expected
    // and the standing table grew by exactly the batch's exploded rows
    m.assign.count() shouldBe
      IvfIndex.assignTop(base.unionAll(day1), m.cents, m.nProbe)
        .join(Sq8Index.packCodes(
          Sq8Index.encode(base.unionAll(day1), m.grid), m.grid), "vec_id")
        .count()
  }

  test("planted duplicates found across ingest days; batch-purity holds; " +
      "every pair exact-verified above threshold") {
    val dir = freshArtifact()
    val d1pairs = SemDedup.appendBatch(spark, dir, day1,
        base.unionAll(day1), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the exact twin (101 vs base 6) must surface with cos ≈ 1
    d1pairs.map(p => (p._1, p._2)) should contain((6L, 101L))
    d1pairs.find(p => (p._1, p._2) == (6L, 101L)).get._3 shouldBe 1.0 +- 1e-9
    // the near twin (103 vs base 13) too
    d1pairs.map(p => (p._1, p._2)) should contain((13L, 103L))
    // batch-purity: every pair touches a day-1 id
    d1pairs.foreach { p => assert(p._1 >= 100 || p._2 >= 100) }
    // zero false positives: every pair's exact cosine really clears 0.9
    d1pairs.foreach(p => p._3 should be > 0.9)
    // day 2: 201 duplicates day-1's 102 — visible only because the
    // append grew the standing side
    val d2pairs = SemDedup.appendBatch(spark, dir, day2,
        base.unionAll(day1).unionAll(day2), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    d2pairs should contain((102L, 201L))
    // ...and nothing re-reports the day-1-vs-base pairs
    d2pairs.foreach { case (a, b) => assert(a >= 200 || b >= 200) }
  }

  test("tombstone delete suppresses a standing vector's pairs; " +
      "compaction rewrites without tombstones under the frozen model") {
    val sp = spark; import sp.implicits._
    val dir = freshArtifact()
    val pre = SemDedup.probeBatch(spark, dir, day1, base.unionAll(day1), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pre should contain((6L, 101L))
    pre should contain((13L, 103L))
    // takedown of base id 6: O(removed) tombstone row, no rebuild —
    // its pair disappears from the next probe, others unaffected
    Tombstones.deleteIds(dir, Seq(6L).toDF("id"))
    val post = SemDedup.probeBatch(spark, dir, day1,
        base.unionAll(day1), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    post should not contain ((6L, 101L))
    post should contain((13L, 103L))
    // compaction: dest drops the tombstoned row physically, keeps the
    // frozen centroids/grid, and probes identically
    val dest = tmpDir("semdedup_compact").toString + "/idx"
    SemDedup.compact(spark, dir, dest)
    ArtifactPaths.exists(dest) shouldBe true
    Tombstones.count(spark, dest) shouldBe 0L
    SemDedup.load(spark, dest).assign
      .filter(col("vec_id") === 6).count() shouldBe 0L
    SemDedup.probeBatch(spark, dest, day1, base.unionAll(day1), 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe post
  }

  test("high-dup corpus (25% planted dups): exact verify is broadcast-free " +
      "with auto-broadcast disabled, lint-green, and recovers every dup (r12 task 1)") {
    // 160 base vectors + 40 EXACT duplicates (25% dup rate — the web-crawl
    // regime the old broadcast(survivors)/broadcast(withA) shape OOMed
    // on, because the broadcast scaled with the duplicate rate). With
    // auto-broadcast DISABLED this is the plan a 10⁹-vector corpus gets:
    // the exact verify must SHUFFLE-join packed vectors, never broadcast.
    val corpus = vdf(((0L until 160L).map(i => (i, vec((i % 4).toInt, i))) ++
      (0L until 40L).map(i => (1000L + i, vec((i % 4).toInt, i)))): _*)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = SemDedup.pairs(spark, corpus, k = 4, threshold = 0.95)
      val rows = df.collect()
      // every planted duplicate pair recovered at cos ≈ 1
      val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
      (0L until 40L).foreach { i =>
        withClue(s"planted dup $i <-> ${1000 + i}: ") {
          got should contain((i, 1000L + i))
        }
      }
      // plan pin: ZERO broadcast exchanges — nothing in this plan may
      // depend on any side fitting in memory
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
      def walk(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] = {
        val inner = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            Seq(q.plan)
          case other => other.children
        }
        p +: inner.flatMap(walk)
      }
      val all = walk(df.queryExecution.executedPlan)
      all.collect { case b: BroadcastExchangeLike => b } shouldBe empty
      // and the packed-vector exchanges carry the explicit exemption —
      // the physical lint (fail-mode CI posture) stays green
      graft.plans.ScaleLint.shuffleFindings(
        df.queryExecution.executedPlan) shouldBe empty
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("probeBatch is read-only and equals the pairs an append would emit") {
    val dir = freshArtifact()
    val before = SemDedup.load(spark, dir).assign.count()
    val probe1 = SemDedup.probeBatch(spark, dir, day1,
      base.unionAll(day1), 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    SemDedup.load(spark, dir).assign.count() shouldBe before
    val appended = SemDedup.appendBatch(spark, dir, day1,
      base.unionAll(day1), 0.9).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    probe1 shouldBe appended
  }
}
