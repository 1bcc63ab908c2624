package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the BloomGate contracts the q_dedup_bloom_gate oracle cannot
  * see: the no-false-negative guarantee in isolation, the false-positive
  * rate staying near the requested fpp, and the empty-corpus path.
  */
class BloomGateSpec extends SparkSpec {

  test("newRows equals the plain anti-join under heavy overlap") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 500).map(i => s"doc body $i").toDF("k")
    // half the batch duplicates the corpus, half is new
    val batch = ((0 until 250).map(i => (i.toLong, s"doc body $i")) ++
      (0 until 250).map(i => (1000L + i, s"fresh body $i"))).toDF("id", "k")
    val gated = BloomGate.newRows(batch, corpus, "k", 10000L, 0.01)
      .select($"id").as[Long].collect().sorted
    val exact = batch.join(corpus, Seq("k"), "left_anti")
      .select($"id").as[Long].collect().sorted
    gated shouldBe exact
    exact.length shouldBe 250
  }

  test("no false negatives: every corpus key probes as maybe") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 2000).map(i => s"member $i").toDF("k")
    val bytes = BloomGate.buildBloom(corpus, $"k", 2000L, 0.01)
    val misses = corpus.filter(!BloomGate.mightContain(bytes, $"k")).count()
    misses shouldBe 0L
  }

  test("false-positive rate stays near the requested fpp") {
    val sp = spark; import sp.implicits._
    val corpus = (0 until 5000).map(i => s"member $i").toDF("k")
    val bytes = BloomGate.buildBloom(corpus, $"k", 5000L, 0.01)
    val probes = (0 until 5000).map(i => s"outsider $i").toDF("k")
    val fps = probes.filter(BloomGate.mightContain(bytes, $"k")).count()
    // 1% nominal; allow generous slack for hash-family variance
    assert(fps <= 5000 * 0.05, s"fp rate ${fps / 5000.0} way above fpp")
  }

  test("empty corpus: every batch row is new") {
    val sp = spark; import sp.implicits._
    val corpus = Seq.empty[String].toDF("k")
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "k")
    BloomGate.newRows(batch, corpus, "k", 100L, 0.01)
      .count() shouldBe 2L
  }

  test("plan shape: the definitely-new branch carries no join") {
    val sp = spark; import sp.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
    // parquet-backed inputs: local Seqs collapse under
    // ConvertToLocalRelation and the union folds away at optimize time
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter($"doc_id" % 10 =!= 0).select($"text".as("k"))
    val batch = docs.filter($"doc_id" % 10 === 0)
      .select($"doc_id".as("id"), $"text".as("k"))
    val plan = BloomGate.newRows(batch, corpus, "k", 1000L, 0.01)
      .queryExecution.optimizedPlan
    val union = plan.collectFirst { case u: Union => u }.get
    // first branch = !mightContain filter straight off the scan — the
    // rows that never pay the exchange; second = the confirm anti-join
    assert(union.children.head.collect { case j: Join => j }.isEmpty,
      "definite branch must not join")
    assert(union.children.last.collect { case j: Join => j }.nonEmpty,
      "confirm branch must anti-join")
  }

  test("null keys follow anti-join semantics (null never matches)") {
    val sp = spark; import sp.implicits._
    val corpus = Seq(Some("x"), None).map(Tuple1(_)).toDF("k")
    val batch = Seq((1L, Some("x")), (2L, None), (3L, Some("y")))
      .toDF("id", "k")
    val gated = BloomGate.newRows(batch, corpus, "k", 100L, 0.01)
      .select($"id").as[Long].collect().sorted
    val exact = batch.join(corpus, Seq("k"), "left_anti")
      .select($"id").as[Long].collect().sorted
    gated shouldBe exact
  }
}
