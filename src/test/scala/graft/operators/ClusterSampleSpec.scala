package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions.normSq

/** Topic-balanced resampling (r12 task 9): per-cell quotas hold exactly,
  * the keep rule is deterministic (zero RNG state — identical keepers on
  * every run), and a skewed corpus comes out balanced: the dominant
  * topic is capped while small topics survive whole.
  */
class ClusterSampleSpec extends SparkSpec {

  // 4 well-separated direction clusters in dim 8, heavily skewed:
  // cluster 0 has 400 members, clusters 1-3 have 40/25/10
  private def vec(cluster: Int, salt: Long): Array[Float] = {
    val v = Array.fill(8)(0.01f * ((salt % 7) + 1))
    v(cluster * 2) = 1.0f
    v(cluster * 2 + 1) = 0.1f * ((salt % 5) + 1)
    v
  }

  private def corpus: DataFrame = {
    val sp = spark; import sp.implicits._
    val rows =
      (0L until 400L).map(i => (i, vec(0, i))) ++
      (1000L until 1040L).map(i => (i, vec(1, i))) ++
      (2000L until 2025L).map(i => (i, vec(2, i))) ++
      (3000L until 3010L).map(i => (i, vec(3, i)))
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding"),
        normSq(col("embedding")).as("n2"))
  }

  test("per-cell quota holds exactly; small cells survive whole") {
    val kept = ClusterSample.balanced(spark, corpus, k = 4, perCell = 30)
      .collect()
    val byCell = kept.groupBy(_.getInt(1)).map { case (c, rs) =>
      c -> (rs.length, rs.head.getLong(2)) }
    byCell.foreach { case (cell, (nKept, nTotal)) =>
      withClue(s"cell $cell kept=$nKept total=$nTotal: ") {
        nKept shouldBe math.min(30L, nTotal).toInt
      }
    }
    // the skewed head (400 of 475 vectors in one topic) was capped: the
    // cell holding it keeps exactly the quota, so no topic dominates
    val counts = byCell.values.map(_._1)
    counts.max shouldBe 30
    // the sample is far smaller than the corpus, yet every realized
    // cell is represented
    counts.sum.toLong should be < corpus.count()
  }

  test("deterministic: identical keeper sets across independent runs") {
    def run(): Seq[(Long, Int)] =
      ClusterSample.balanced(spark, corpus, k = 4, perCell = 20)
        .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val a = run(); val b = run()
    a shouldBe b // same keepers, same cells — zero RNG state anywhere
    a.groupBy(_._2).values.foreach(_.size should be <= 20)
  }

  test("registry query emits the per-cell audit with quotas respected") {
    val rows = graft.SparkEntry.queries("q_sample_cluster_balanced")(
      spark, sfDir).collect()
    rows should not be empty
    rows.foreach { r =>
      val (nTotal, nKept) = (r.getLong(1), r.getLong(2))
      withClue(s"cell ${r.getInt(0)}: ") {
        nKept shouldBe math.min(50L, nTotal)
      }
    }
  }
}
