package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the learned-quality-gate contracts the DuckDB oracle can't see:
  * the weight fixture itself, known-vector scores, the empty/short-text
  * edge, and the plan shape (one md5 loop per row, not one per output
  * column).
  */
class QualityClassifierSpec extends SparkSpec {
  import QualityClassifier._

  test("pinned weight fixture: digest and range are frozen") {
    val w = pinnedWeights()
    w.length shouldBe 256
    all(w.toSeq) should (be >= -1001L and be <= 1001L)
    // any change to the formula (constant, modulus, offset) breaks the
    // fixture and every recorded score; pin a digest of the whole array
    val digest = w.foldLeft(0L)((a, x) => (a * 1315423911L) ^ x)
    digest shouldBe 6011744228122912560L
    // sign balance sanity: a degenerate all-positive vector would make
    // pass() trivially true for every document
    assert(w.count(_ > 0) > 80 && w.count(_ < 0) > 80, "weights skewed")
  }

  test("known vectors: logit is the exact fixed-point ngram-weight sum") {
    val sp = spark; import sp.implicits._
    def logitOf(s: String): (Long, Long) = {
      val r = Seq(s).toDF("t")
        .select(ngramLogit(col("t")).as("gl"))
        .select($"gl.n_grams", $"gl.logit").as[(Long, Long)].head()
      r
    }
    // manual replay of the expression's own definition for one string
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = pinnedWeights()
    def expected(s: String): (Long, Long) = {
      val grams = (0 to s.length - 3).map(i => s.substring(i, i + 3))
      val logit = grams.map { g =>
        md.reset()
        val d = md.digest(g.getBytes("UTF-8"))
        val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        w((h % 256).toInt)
      }.sum
      (grams.size.toLong, logit)
    }
    for (s <- Seq("the quick brown fox", "aaa", "ab", "", "döner in köln"))
      logitOf(s) shouldBe expected(s)
  }

  test("short/empty text: zero grams, zero logit, fails the gate") {
    val sp = spark; import sp.implicits._
    val out = Seq("", "ab").toDF("t")
      .select(ngramLogit(col("t")).as("gl"))
      .select($"gl.n_grams", $"gl.logit").as[(Long, Long)].collect()
    out.toSeq shouldBe Seq((0L, 0L), (0L, 0L))
    Seq(("", 1)).toDF("t", "i")
      .select(pass(lit(0L), lit(0L)).as("p")).as[Boolean]
      .head() shouldBe false
  }

  test("plan: one ngram_logit per row despite four output references") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val q = graft.SparkEntry.queries("q_quality_classifier")
    val plan = q(spark, sfDir).queryExecution.optimizedPlan
    val count = "ngram_logit".r.findAllIn(plan.treeString).size
    // CollapseProject must NOT inline the non-cheap expression into its
    // four consumers — that would run the md5 loop 4x per row
    assert(count == 1, s"expected 1 ngram_logit in the plan, got $count:\n" +
      plan.treeString.take(2000))
    assert(docs.count() > 0)
  }
}
