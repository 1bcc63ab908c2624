package graft.operators

import graft.SparkSpec

class DedupClustersSpec extends SparkSpec {

  test("chains and separate components resolve to min-id clusters") {
    val sp = spark; import sp.implicits._
    // components: {1,2,3,4} via chain, {10,11}, pair order mixed
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = DedupClusters.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    comp(1L) shouldBe 1L
    comp(2L) shouldBe 1L
    comp(3L) shouldBe 1L
    comp(4L) shouldBe 1L
    comp(10L) shouldBe 10L
    comp(11L) shouldBe 10L
  }

  test("long chains converge within the default iteration budget (pointer jumping)") {
    val sp = spark; import sp.implicits._
    // a 41-node path: min-label-only propagation needs 40 rounds; with
    // pointer jumping it must finish inside the default maxIter=10
    val pairs = (1L until 41L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = DedupClusters.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    comp.length shouldBe 41
    comp.foreach { case (_, label) => label shouldBe 1L }
  }

  test("keepers: one canonical doc + member count per cluster") {
    val sp = spark; import sp.implicits._
    val pairs = Seq((5L, 7L), (7L, 9L), (20L, 21L)).toDF("id_a", "id_b")
    val k = DedupClusters.keepers(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    k.toSeq shouldBe Seq((5L, 5L, 3L), (20L, 20L, 2L))
  }

  test("keepersBy: highest score wins, ties break to the smallest doc_id") {
    val sp = spark; import sp.implicits._
    val pairs = Seq((5L, 7L), (7L, 9L), (20L, 21L), (30L, 31L)).toDF("id_a", "id_b")
    val scores = Seq(
      (5L, 0.3333), (7L, 1.0), (9L, 0.6667), // clear winner: 7
      (20L, 0.6667), (21L, 0.6667),          // tie → smaller id 20
      (30L, 0.0), (31L, 0.0)                 // all-zero tie → 30
    ).toDF("doc_id", "score")
    val k = DedupClusters.keepersBy(pairs, scores)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    k.toSeq shouldBe Seq(
      (5L, 7L, 1.0, 3L), (20L, 20L, 0.6667, 2L), (30L, 30L, 0.0, 2L))
  }

  test("concurrency-safe on a shared session: parallel components + queries agree with sequential") {
    val sp = spark; import sp.implicits._
    // the r5 blemish was a session-global shuffle-partitions override
    // inside the iteration loop — queries planned concurrently on the
    // same session inherited it. Pin the fix: run components() in
    // parallel with other components() calls and a shuffling aggregate,
    // all on one session, and require sequential-identical results and
    // an untouched session conf.
    val confBefore = sp.conf.get("spark.sql.shuffle.partitions")
    val pairsA = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val pairsB = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    def runA() = DedupClusters.components(pairsA)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    def runAgg() = graft.Tables.orders(sp, sfDir)
      .groupBy($"o_orderstatus").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    val (seqA, seqAgg) = (runA(), runAgg())
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = Seq(
      Future(runA()), Future(DedupClusters.components(pairsB).count()),
      Future(runAgg()), Future(runA()), Future(runAgg()))
    val results = Await.result(Future.sequence(futures), 120.seconds)
    results(0) shouldBe seqA
    results(1) shouldBe 30L
    results(2) shouldBe seqAgg
    results(3) shouldBe seqA
    results(4) shouldBe seqAgg
    sp.conf.get("spark.sql.shuffle.partitions") shouldBe confBefore
  }

  test("single-task union-find path == forced distributed loop (r19 opt)") {
    val sp = spark; import sp.implicits._
    // chain + star + two singleton-pair components, mixed orientations —
    // the default path (edges under MaxLocalEdges → one-task union-find)
    // must label identically to the pointer-jumping loop, which
    // localEdgeCap = 0 forces
    val pairs = ((1L until 25L).map(i => (i + 1, i)) ++
      Seq((100L, 101L), (100L, 102L), (103L, 100L), (200L, 201L), (301L, 300L)))
      .toDF("id_a", "id_b")
    val fast = DedupClusters.components(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val dist = DedupClusters.components(pairs, localEdgeCap = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    fast shouldBe dist
    fast.filter(_._1 >= 100L).filter(_._1 < 200L).foreach(_._2 shouldBe 100L)
  }

  test("end-to-end: minhash pairs on the fixture collapse into clusters") {
    val pairs = graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, sfDir)
      .select("id_a", "id_b")
    val k = DedupClusters.keepers(pairs).collect()
    // fixture has planted near-dup pairs; every cluster's keeper is its min
    k.foreach { r => r.getLong(1) shouldBe r.getLong(0) }
    // every doc appearing in a pair lands in exactly one cluster
    val distinctDocs = pairs.select("id_a").union(pairs.select("id_b"))
      .distinct().count()
    k.map(_.getLong(2)).sum shouldBe distinctDocs
  }
}
