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

  /** The ONE default base learning rate, shared by [[train]], [[trainDf]]
    * and the IndexMain train-quality CLI — three entry points with three
    * drifting defaults silently trained different models depending on
    * which API was called (r13 ADVICE). Callers wanting a different rate
    * pass it explicitly (the registry query pins its own).
    */
  val DefaultLr = 1.0

  /** Gradient buffer: per-bucket integer sums + doc count. */
  case class GBuf(g: Array[Long], n: Long)

  private val gradAgg: Aggregator[(Seq[Long], Long), GBuf, GBuf] =
    new Aggregator[(Seq[Long], Long), GBuf, GBuf] {
      override def zero: GBuf = GBuf(Array.empty, 0L)
      override def reduce(b: GBuf, row: (Seq[Long], Long)): GBuf = {
        val (counts, gq) = row
        // the encoder hands counts back as a LIST — positional indexing
        // would be O(dim²) per row (a measured wall blowup at dim=1024);
        // iterate linearly instead
        val g = if (b.g.isEmpty) new Array[Long](counts.length) else b.g
        var j = 0
        val it = counts.iterator
        while (it.hasNext) { g(j) += it.next() * gq; j += 1 }
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

  /** Integer dot of a counts array against a constant fixed-point weight
    * vector — exact, order-fixed (element order). One opaque native node
    * (plans.LongVecDotConst): the zip_with-over-dim-literals form made
    * every GD iteration PLANNING-bound at dim=1024.
    */
  private def dotCounts(counts: Column, wS: Array[Long]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.LongVecDotConst(
      ColumnBridge.expression(counts), wS.clone()))
  }

  /** Train fixed-point (weights, bias) by `iters` batch ADAGRAD steps
    * at base rate `lr` from zero init; model z = meanLogit + bias/S
    * (the intercept absorbs the class prior — without it an imbalanced
    * teacher pins every prediction to the majority class). Adagrad's
    * per-coordinate scaling is load-bearing: the intercept's
    * z-sensitivity is 1/S while a bucket carrying fraction f of a doc's
    * grams has f/S — they differ by orders of magnitude, so one global
    * rate either diverges on the bias or crawls on the features; the
    * accumulator normalizes both to ~lr-sized first steps
    * (deterministic: accumulators live on the DRIVER and fold the same
    * integer gradient sums the update uses, in one fixed order).
    * `docs` must carry `textCol` (string) and `labelCol` (0/1). The
    * weights feed `QualityClassifier.ngramLogit(text, w)`; the keep
    * rule is `logit + bias·n_grams > 0` (i.e. mean-logit above the
    * TRAINED threshold −bias/S — [[keeps]]).
    */
  def train(docs: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, lr: Double = DefaultLr,
      dim: Int = QualityClassifier.Dim): (Array[Long], Long) = {
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
    // an empty/fully-filtered training set would surface as a cryptic
    // null-decode failure out of the sum(bq) fold — fail with the real
    // reason instead (one cheap limit(1) probe on the checkpointed rows)
    require(!feat.isEmpty,
      "QualityTrainer.train: no trainable documents — every input row " +
        s"is empty or has zero hashed $dim-bucket n-grams in '$textCol'")
    var w = new Array[Long](dim)
    var bS = 0L
    val acc = new Array[Double](dim) // adagrad Σ grad² per bucket
    var accB = 0.0
    var it = 0
    while (it < iters) {
      // z = mean logit + bias; p = sigmoid(z); the per-doc factors
      // quantize to fixed point BEFORE the cross-row integer sums
      // (determinism): gq carries the 1/n feature scaling, bq the bias
      val logitS = dotCounts(col("counts"), w)
      val z = logitS.cast("double") / (lit(S.toDouble) * col("n").cast("double")) +
        lit(bS.toDouble / S.toDouble)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val gq = round((p - col("y").cast("double")) / col("n").cast("double") *
        lit(GradScale.toDouble), 0).cast("long")
      val bq = round((p - col("y").cast("double")) *
        lit(GradScale.toDouble), 0).cast("long")
      val folded = feat
        .select(col("counts"), gq.as("gq"), bq.as("bq"))
        .select(udaf(gradAgg).apply(col("counts"), col("gq")).as("gb"),
          sum(col("bq")).as("bsum"))
        .select(col("gb.g"), col("gb.n"), col("bsum"))
        .as[(Seq[Long], Long, Long)]
        .head()
      val nDocs = math.max(1L, folded._2)
      val g = if (folded._1.isEmpty) new Array[Long](dim) else folded._1.toArray
      var j = 0
      while (j < dim) {
        // ΔwS_j = lr · S · mean_j / √acc_j, mean_j = G_j / (GradScale·nDocs)
        val mean = g(j).toDouble / (GradScale.toDouble * nDocs)
        acc(j) += mean * mean
        if (acc(j) > 0.0)
          w(j) = w(j) - math.round(lr * S.toDouble * mean / math.sqrt(acc(j)))
        j += 1
      }
      val meanB = folded._3.toDouble / (GradScale.toDouble * nDocs)
      accB += meanB * meanB
      if (accB > 0.0)
        bS = bS - math.round(lr * S.toDouble * meanB / math.sqrt(accB))
      it += 1
    }
    (w, bS)
  }

  /** The keep decision under a trained (weights, bias): mean-logit above
    * the trained threshold, in exact integer arithmetic —
    * logit + bias·n_grams > 0.
    */
  def keeps(nGrams: Column, logit: Column, biasS: Long): Column =
    nGrams > 0L && logit + lit(biasS) * nGrams > 0L


  /** Registry form: `dim`+1 rows, deterministic — the trained bias
    * (intercept) rides at bucket −1, the feature weights at 0..dim−1.
    */
  def trainDf(docs: DataFrame, textCol: String, labelCol: String,
      iters: Int = 8, lr: Double = DefaultLr,
      dim: Int = QualityClassifier.Dim): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (w, bS) = train(docs, textCol, labelCol, iters, lr, dim)
    ((-1, bS) +: w.zipWithIndex.map { case (x, j) => (j, x) }.toSeq)
      .toDF("bucket", "weight")
  }

  // --- Persisted weight artifact (the BpeTrainer.saveVocab discipline:
  // --- meta written LAST is the ArtifactPaths.exists commit marker, so
  // --- a crashed half-written save is invisible and gets rebuilt) ------
  //   weights/ (bucket, weight)  — dim tiny rows, fixed-point Scale
  //   meta/    (dim, iters, lr)

  def save(spark: org.apache.spark.sql.SparkSession, dir: String,
      weights: Array[Long], biasS: Long, iters: Int, lr: Double): Unit = {
    import spark.implicits._
    weights.zipWithIndex.map { case (x, j) => (j, x) }.toSeq
      .toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    Seq((weights.length, biasS, iters, lr)).toDF("dim", "bias", "iters", "lr")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
  }

  def load(spark: org.apache.spark.sql.SparkSession,
      dir: String): (Array[Long], Long) = {
    require(ArtifactPaths.exists(dir), s"no committed classifier weights at $dir")
    val rows = spark.read.parquet(s"$dir/weights").orderBy("bucket").collect()
    val meta = spark.read.parquet(s"$dir/meta").collect().head
    val dim = meta.getAs[Int]("dim")
    require(rows.length == dim && rows.iterator.zipWithIndex.forall {
        case (r, j) => r.getInt(0) == j },
      s"classifier weight artifact at $dir is not a dense 0..${dim - 1} vector")
    (rows.map(_.getLong(1)), meta.getAs[Long]("bias"))
  }
}
