package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.functions.{QualityClassifier, TextFunctions}

/** The in-engine classifier trainer (r13): feature identity with the
  * scoring expression, bit-exact plain-Scala replay (the UnigramTrainer
  * parity standard), cross-partitioning determinism, and actual
  * LEARNING — planted separable vocabularies classified on held-out
  * docs through the EXISTING inference path.
  */
class QualityTrainerSpec extends SparkSpec {

  test("feature identity: dot(ngramCounts, w) == ngramLogit.logit exactly") {
    val w = QualityClassifier.pinnedWeights()
    val docs = Tables.documents(spark, sfDir).limit(50)
      .select(lower(col("text")).as("lt"))
      .select(
        TextFunctions.ngramCounts(col("lt")).as("counts"),
        QualityClassifier.ngramLogit(col("lt")).getField("logit").as("logit"))
      .collect()
    docs.length shouldBe 50
    docs.foreach { r =>
      val counts = r.getSeq[Long](0)
      val dot = counts.iterator.zipWithIndex
        .map { case (c, j) => c * w(j) }.sum
      dot shouldBe r.getLong(1)
    }
  }

  // planted corpus: label-1 docs draw words from vocab A, label-0 from
  // vocab B — disjoint trigram mass, linearly separable
  private def planted: DataFrame = {
    val sp = spark; import sp.implicits._
    def doc(vocab: String, salt: Int): String =
      (0 until 12).map(k => s"$vocab${(salt * 7 + k * 3) % 20}").mkString(" ")
    val rows =
      (0 until 60).map(i => (i.toLong, doc("alpha", i), 1)) ++
      (0 until 60).map(i => (1000L + i, doc("zeta", i), 0))
    rows.toDF("doc_id", "text", "y")
  }

  test("learning: planted vocabularies separate on HELD-OUT docs through " +
      "the existing inference path") {
    val sp = spark; import sp.implicits._
    val train = planted.filter(col("doc_id") % 5 =!= 0)
    val held = planted.filter(col("doc_id") % 5 === 0)
    val (w, bS) = QualityTrainer.train(train, "text", "y")
    val scored = held
      .withColumn("gl", QualityClassifier.ngramLogit(lower(col("text")), w))
      .select(col("y"), QualityTrainer.keeps(col("gl.n_grams"),
        col("gl.logit"), bS).cast("int").as("pred"))
      .collect()
    val acc = scored.count(r => r.getInt(0) == r.getInt(1)).toDouble / scored.length
    withClue(s"held-out accuracy $acc: ") { acc should be >= 0.95 }
  }

  test("deterministic: identical weights across runs and partitionings") {
    val a = QualityTrainer.train(planted, "text", "y", iters = 4)
    val b = QualityTrainer.train(planted.repartition(7), "text", "y", iters = 4)
    a._1.toSeq shouldBe b._1.toSeq
    a._2 shouldBe b._2
  }

  test("plain-Scala replay reproduces the weights bit-for-bit (4 iterations)") {
    val docs = planted
    val got = QualityTrainer.train(docs, "text", "y", iters = 4, lr = 2.0)
    // independent replay: same features (collected once), same per-doc
    // arithmetic (Math.exp, HALF_UP fixed-point quantization), same
    // integer gradient sums, same driver-side update
    val feat = docs
      .select(col("y").cast("long").as("y"),
        TextFunctions.ngramCounts(lower(col("text"))).as("counts"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
      .filter(_._2.sum > 0)
    val dim = QualityClassifier.Dim
    val S = QualityClassifier.Scale
    val w = new Array[Long](dim)
    var bS = 0L
    val acc = new Array[Double](dim)
    var accB = 0.0
    for (_ <- 0 until 4) {
      val g = new Array[Long](dim)
      var bsum = 0L
      var nDocs = 0L
      feat.foreach { case (y, counts) =>
        val n = counts.sum
        val logitS = counts.iterator.zipWithIndex.map { case (c, j) => c * w(j) }.sum
        val z = logitS.toDouble / (S.toDouble * n.toDouble) + bS.toDouble / S.toDouble
        val p = 1.0 / (1.0 + math.exp(-z))
        val gq = BigDecimal((p - y.toDouble) / n.toDouble *
            QualityTrainer.GradScale.toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        val bq = BigDecimal((p - y.toDouble) *
            QualityTrainer.GradScale.toDouble)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        var j = 0
        while (j < dim) { g(j) += counts(j) * gq; j += 1 }
        bsum += bq
        nDocs += 1
      }
      var j = 0
      while (j < dim) {
        val mean = g(j).toDouble / (QualityTrainer.GradScale.toDouble * nDocs)
        acc(j) += mean * mean
        if (acc(j) > 0.0)
          w(j) = w(j) - math.round(2.0 * S.toDouble * mean / math.sqrt(acc(j)))
        j += 1
      }
      val meanB = bsum.toDouble / (QualityTrainer.GradScale.toDouble * nDocs)
      accB += meanB * meanB
      if (accB > 0.0)
        bS = bS - math.round(2.0 * S.toDouble * meanB / math.sqrt(accB))
    }
    got._1.toSeq shouldBe w.toSeq
    got._2 shouldBe bS
  }

  test("weight artifact round-trips; half-written save is invisible") {
    val (w, bS) = QualityTrainer.train(planted, "text", "y", iters = 2)
    val dir = tmpDir("graft_qt").toString + "/weights"
    QualityTrainer.save(spark, dir, w, bS, iters = 2, lr = 2.0)
    QualityTrainer.exists(dir) shouldBe true
    val (lw, lb) = QualityTrainer.load(spark, dir)
    lw.toSeq shouldBe w.toSeq
    lb shouldBe bS
    // meta-last commit inside the live version: an artifact whose
    // CURRENT-pointed version lacks meta/_SUCCESS is invisible
    val half = tmpDir("graft_qt_half").toString + "/weights"
    QualityTrainer.save(spark, half, w, bS, iters = 2, lr = 2.0)
    val cur = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(half, "CURRENT")), "UTF-8").trim
    new java.io.File(s"$half/$cur/meta/_SUCCESS").delete() shouldBe true
    QualityTrainer.exists(half) shouldBe false
    an[IllegalArgumentException] should be thrownBy
      QualityTrainer.load(spark, half)
  }

  test("retrain over a live artifact: versioned save swaps atomically, old version retained once") {
    val (w1, b1) = QualityTrainer.train(planted, "text", "y", iters = 2)
    val (w2, b2) = QualityTrainer.train(planted, "text", "y", iters = 4)
    assert(w1.toSeq != w2.toSeq) // distinct models, or the pin is vacuous
    val dir = tmpDir("graft_qt_retrain").toString + "/weights"
    QualityTrainer.save(spark, dir, w1, b1, iters = 2, lr = 2.0)
    QualityTrainer.save(spark, dir, w2, b2, iters = 4, lr = 2.0)
    // reader sees the NEW committed model, and sees it with its OWN meta
    val (lw, lb) = QualityTrainer.load(spark, dir)
    lw.toSeq shouldBe w2.toSeq
    lb shouldBe b2
    // the superseded version survives one generation (a reader that
    // resolved CURRENT just before the swap can still finish its read);
    // a third save prunes it
    def versions = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v_")).length
    versions shouldBe 2
    QualityTrainer.save(spark, dir, w1, b1, iters = 2, lr = 2.0)
    versions shouldBe 2 // new + its immediate predecessor, older pruned
    QualityTrainer.load(spark, dir)._1.toSeq shouldBe w1.toSeq
  }

  test("pre-versioning flat artifact layout still loads") {
    val sp = spark; import sp.implicits._
    val (w, bS) = QualityTrainer.train(planted, "text", "y", iters = 2)
    val dir = tmpDir("graft_qt_flat").toString + "/weights"
    // the r14 on-disk shape: weights/ + meta/ directly under dir, no
    // CURRENT pointer
    w.zipWithIndex.map { case (x, j) => (j, x) }.toSeq
      .toDF("bucket", "weight")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/weights")
    Seq((w.length, bS, 2, 2.0)).toDF("dim", "bias", "iters", "lr")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/meta")
    QualityTrainer.exists(dir) shouldBe true
    val (lw, lb) = QualityTrainer.load(spark, dir)
    lw.toSeq shouldBe w.toSeq
    lb shouldBe bS
  }

  test("registry query: 1025 deterministic rows — bias at bucket -1, weights 0..1023") {
    val rows = graft.SparkEntry.queries("q_quality_train")(spark, sfDir)
      .collect()
    rows.length shouldBe 1024 + 1
    rows.map(_.getInt(0)).toSeq shouldBe (-1 until 1024)
    // the teacher signal moved SOME weights off zero init
    rows.count(_.getLong(1) != 0L) should be > 0
  }
}
