package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.functions.{QualityClassifier, TextFunctions}

/** In-engine TRAINING for the hashed char-trigram classifier — the half
  * of the quality family the engine was missing: `functions
  * .QualityClassifier` scores with a weight vector; this learns one, by
  * batch logistic regression over the SAME feature space
  * (plans.HashedNgramCounts shares the md5-bucket arithmetic with the
  * scoring expression, spec-pinned `dot(counts, w) == logit`), so a
  * trained vector plugs straight into the existing inference path with
  * zero feature skew. The fastText-classifier recipe (Joulin et al.
  * 2016, public literature): hashed n-gram bag → linear logit →
  * sigmoid; teacher labels come from any binary column (the registry
  * query distills the fixture's language label — the fastText-langid
  * use; a quality-seed teacher is the same call).
  *
  * Determinism (the UnigramTrainer standard — bit-identical across
  * runs, partitionings, and cluster sizes):
  *  - the per-doc gradient factor quantizes to a fixed-point Long
  *    BEFORE any cross-row combine, so the per-bucket gradient is an
  *    INTEGER sum — associative + commutative, partition-order-proof
  *    (float accumulation across partitions would be order-dependent);
  *  - weight updates happen on the driver over the 256-long gradient in
  *    one fixed order.
  *
  * Scale posture: features are computed once and localCheckpointed
  * (O(dim)=2 KB/row — training seed sets are the SMALL curated side of
  * a curation stack); each iteration is ONE partial-aggregated fold to
  * a single 256-long array (custom typed Aggregator, map-side combine,
  * O(dim) driver bytes) plus a broadcast-literal weight vector — no
  * shuffle wider than the 256-element merge, at any corpus size.
  * Per-doc per-bucket contribution is bounded by GradScale (counts_j ≤
  * n_grams cancels the 1/n), so the Long sums hold past 10⁹ docs.
  */
object QualityTrainer {

  /** Fixed-point scale of the quantized per-doc gradient factor. */
  val GradScale = 100000000L // 1e8

  /** Gradient buffer: per-bucket integer sums + doc count. */
  case class GBuf(g: Array[Long], n: Long)

  private val gradAgg: Aggregator[(Seq[Long], Long), GBuf, GBuf] =
    new Aggregator[(Seq[Long], Long), GBuf, GBuf] {
      override def zero: GBuf = GBuf(Array.empty, 0L)
      override def reduce(b: GBuf, row: (Seq[Long], Long)): GBuf = {
        val (counts, gq) = row
        val g = if (b.g.isEmpty) new Array[Long](counts.length) else b.g
        var j = 0
        while (j < counts.length) { g(j) += counts(j) * gq; j += 1 }
        GBuf(g, b.n + 1)
      }
      override def merge(a: GBuf, b: GBuf): GBuf = {
        if (a.g.isEmpty) b
        else if (b.g.isEmpty) a
        else {
          val g = a.g.clone()
          var j = 0
          while (j < g.length) { g(j) += b.g(j); j += 1 }
          GBuf(g, a.n + b.n)
        }
      }
      override def finish(b: GBuf): GBuf = b
      override def bufferEncoder: Encoder[GBuf] = Encoders.product[GBuf]
      override def outputEncoder: Encoder[GBuf] = Encoders.product[GBuf]
    }

  /** Integer dot of a counts array against a fixed-point weight literal
    * — exact, order-fixed (element order), codegen'd higher-order fold.
    */
  private def dotCounts(counts: Column, wS: Array[Long]): Column = {
    val w = array(wS.toIndexedSeq.map(lit): _*)
    aggregate(zip_with(counts, w, (c, x) => c * x), lit(0L), (acc, x) => acc + x)
  }

  /** Train fixed-point weights (QualityClassifier.Scale) by `iters`
    * batch-GD steps at learning rate `lr` from zero init. `docs` must
    * carry `textCol` (string) and `labelCol` (0/1 — the teacher).
    * Returns weights ready for `QualityClassifier.ngramLogit(text, w)`.
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, lr: Double = 2.0,
      dim: Int = QualityClassifier.Dim): Array[Long] = {
    require(iters >= 1, s"need at least one iteration: $iters")
    val spark = docs.sparkSession
    import spark.implicits._
    val S = QualityClassifier.Scale
    // features once: (y, n_grams, counts) — the only materialization
    val feat = docs.select(
        col(labelCol).cast("long").as("y"),
        TextFunctions.ngramCounts(lower(col(textCol)), dim = dim).as("counts"))
      .withColumn("n", aggregate(col("counts"), lit(0L), (a, x) => a + x))
      .filter(col("n") > 0)
      .localCheckpoint()
    var w = new Array[Long](dim)
    var it = 0
    while (it < iters) {
      // z = mean logit; p = sigmoid(z); per-doc factor (p - y)/n quantized
      // to fixed point BEFORE the cross-row integer sum (determinism)
      val logitS = dotCounts(col("counts"), w)
      val z = logitS.cast("double") / (lit(S.toDouble) * col("n").cast("double"))
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val gq = round((p - col("y").cast("double")) / col("n").cast("double") *
        lit(GradScale.toDouble), 0).cast("long")
      val folded = feat
        .select(col("counts"), gq.as("gq"))
        .select(udaf(gradAgg).apply(col("counts"), col("gq")).as("gb"))
        .select(col("gb.g"), col("gb.n"))
        .as[(Seq[Long], Long)]
        .head()
      val nDocs = math.max(1L, folded._2)
      val g = if (folded._1.isEmpty) new Array[Long](dim) else folded._1.toArray
      var j = 0
      while (j < dim) {
        // ΔwS_j = lr · S · mean_j, mean_j = G_j / (GradScale · nDocs)
        w(j) = w(j) - math.round(
          lr * S.toDouble * (g(j).toDouble / (GradScale.toDouble * nDocs)))
        j += 1
      }
      it += 1
    }
    w
  }

  /** Registry form: (bucket, weight) — `dim` rows, deterministic. */
  def trainDf(docs: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, lr: Double = 2.0,
      dim: Int = QualityClassifier.Dim): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = train(docs, textCol, labelCol, iters, lr, dim)
    w.zipWithIndex.map { case (x, j) => (j, x) }.toSeq
      .toDF("bucket", "weight")
  }
}
