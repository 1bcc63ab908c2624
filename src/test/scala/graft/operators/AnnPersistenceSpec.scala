package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Round-trip contract for the persisted ANN artifacts (VERDICT r6 #1):
  * a saved index, reloaded, must answer every query identically to the
  * in-memory train-and-query path — training is deterministic, so any
  * drift is a serialization bug, not noise.
  */
class AnnPersistenceSpec extends SparkSpec {

  private def embeddings = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("n2"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  test("PQ save/load round-trips codebooks exactly and reproduces topK") {
    val e = embeddings.localCheckpoint()
    val books = PqIndex.train(spark, e, dim = 64, m = 8, k = 16)
    val encoded = PqIndex.encode(e, books)
    val dir = tmpDir("graft_pq_rt").toString
    PqIndex.save(dir, books, encoded)
    ArtifactPaths.exists(dir) shouldBe true
    val idx = PqIndex.load(spark, dir)
    idx.cents shouldBe None
    idx.books.length shouldBe books.length
    for (s <- books.indices; c <- books(s).indices)
      idx.books(s)(c).toSeq shouldBe books(s)(c).toSeq
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val mem = rows(PqIndex.topK(queries, encoded, books, k = 5, pool = 25)
      .orderBy(col("qid"), col("rn")))
    val loaded = rows(PqIndex.topKFrom(queries, idx.codes, e, idx.books,
      k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    loaded shouldBe mem
  }

  test("IVF save/load reproduces topK; cells artifact carries no float vectors") {
    val e = embeddings.localCheckpoint()
    val cents = IvfIndex.centroids(spark, e, 16)
    val indexed = IvfIndex.assign(e, cents)
    val dir = tmpDir("graft_ivf_rt").toString
    IvfIndex.save(dir, cents, indexed)
    ArtifactPaths.exists(dir) shouldBe true
    val (lCents, lCells) = IvfIndex.load(spark, dir)
    // the artifact's scan side is payload-free by contract
    lCells.columns.toSet shouldBe Set("vec_id", "cell", "n2")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val mem = rows(IvfIndex.topK(queries, indexed, cents, k = 5, nProbe = 3))
    val loaded = rows(IvfIndex.topKFrom(queries, lCells, e, lCents, k = 5, nProbe = 3))
    loaded shouldBe mem
  }

  test("IVF-PQ save/load (codes carry cell) reproduces topKIvf") {
    val e = embeddings.localCheckpoint()
    val cents = IvfIndex.centroids(spark, e, 16)
    val books = PqIndex.train(spark, e, dim = 64, m = 8, k = 16)
    val encoded = PqIndex.encode(IvfIndex.assign(e, cents), books)
    val dir = tmpDir("graft_ivfpq_rt").toString
    PqIndex.save(dir, books, encoded, Some(cents))
    val idx = PqIndex.load(spark, dir)
    idx.cents.isDefined shouldBe true
    idx.codes.columns.toSet shouldBe Set("vec_id", "n2", "code", "cell")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val mem = rows(PqIndex.topKIvf(queries, encoded, books, cents,
      k = 5, pool = 25, nProbe = 6).orderBy(col("qid"), col("rn")))
    val loaded = rows(PqIndex.topKIvfFrom(queries, idx.codes, e, idx.books,
      idx.cents.get, k = 5, pool = 25, nProbe = 6).orderBy(col("qid"), col("rn")))
    loaded shouldBe mem
  }

  test("registry loaded twins equal their in-memory siblings") {
    val pairs = Seq(
      "q_sim_topk_pq_loaded" -> "q_sim_topk_pq",
      "q_sim_topk_ivf_loaded" -> "q_sim_topk_ivf",
      "q_sim_topk_ivfpq_loaded" -> "q_sim_topk_ivfpq",
      "q_sim_topk_sq8_loaded" -> "q_sim_topk_sq8")
    pairs.foreach { case (loadedName, memName) =>
      val loaded = rows(graft.SparkEntry.queries(loadedName)(spark, sfDir))
      val mem = rows(graft.SparkEntry.queries(memName)(spark, sfDir))
      withClue(s"$loadedName vs $memName: ") { loaded shouldBe mem }
    }
  }

  test("PQ append with frozen books equals re-encoding the union") {
    val e = embeddings.localCheckpoint()
    val day0 = e.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val day1 = e.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val books = PqIndex.train(spark, day0, dim = 64, m = 8, k = 16)
    val dir = tmpDir("graft_pq_append").toString
    PqIndex.save(dir, books, PqIndex.encode(day0, books))
    PqIndex.append(spark, dir, day1)
    val idx = PqIndex.load(spark, dir)
    idx.codes.count() shouldBe e.count()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val appended = rows(PqIndex.topKFrom(queries, idx.codes, e, idx.books,
      k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    val rebuilt = rows(PqIndex.topKFrom(queries, PqIndex.encode(e, books), e,
      books, k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    appended shouldBe rebuilt
  }

  test("IVF append with frozen centroids equals re-assigning the union") {
    val e = embeddings.localCheckpoint()
    val day0 = e.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val day1 = e.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val cents = IvfIndex.centroids(spark, day0, 16)
    val dir = tmpDir("graft_ivf_append").toString
    IvfIndex.save(dir, cents, IvfIndex.assign(day0, cents))
    IvfIndex.append(spark, dir, day1)
    val (lCents, lCells) = IvfIndex.load(spark, dir)
    lCells.count() shouldBe e.count()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val appended = rows(IvfIndex.topKFrom(queries, lCells, e, lCents, k = 5, nProbe = 3))
    val rebuilt = rows(IvfIndex.topKFrom(queries,
      IvfIndex.assign(e, cents).select(col("vec_id"), col("cell"), col("n2")),
      e, cents, k = 5, nProbe = 3))
    appended shouldBe rebuilt
  }

  test("IVF-PQ append stamps cells with the frozen centroids") {
    val e = embeddings.localCheckpoint()
    val day0 = e.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val day1 = e.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val cents = IvfIndex.centroids(spark, day0, 16)
    val books = PqIndex.train(spark, day0, dim = 64, m = 8, k = 16)
    val dir = tmpDir("graft_ivfpq_append").toString
    PqIndex.save(dir, books, PqIndex.encode(IvfIndex.assign(day0, cents), books),
      Some(cents))
    PqIndex.append(spark, dir, day1)
    val idx = PqIndex.load(spark, dir)
    idx.codes.columns.toSet shouldBe Set("vec_id", "n2", "code", "cell")
    idx.codes.count() shouldBe e.count()
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val appended = rows(PqIndex.topKIvfFrom(queries, idx.codes, e, idx.books,
      idx.cents.get, k = 5, pool = 25, nProbe = 6).orderBy(col("qid"), col("rn")))
    val rebuilt = rows(PqIndex.topKIvfFrom(queries,
      PqIndex.encode(IvfIndex.assign(e, cents), books)
        .select(col("vec_id"), col("n2"), col("code"), col("cell")),
      e, books, cents, k = 5, pool = 25, nProbe = 6)
      .orderBy(col("qid"), col("rn")))
    appended shouldBe rebuilt
  }

  test("SQ8 save/load round-trips the grid and reproduces topK; append == re-encoded union") {
    val e = embeddings.localCheckpoint()
    val day0 = e.filter(col("vec_id") % 2 === 0).localCheckpoint()
    val day1 = e.filter(col("vec_id") % 2 =!= 0).localCheckpoint()
    val grid = Sq8Index.train(day0)
    val dir = tmpDir("graft_sq8_rt").toString
    Sq8Index.save(dir, grid, Sq8Index.encode(day0, grid))
    ArtifactPaths.exists(dir) shouldBe true
    val (lGrid, _) = Sq8Index.load(spark, dir)
    lGrid.lo.toSeq shouldBe grid.lo.toSeq
    lGrid.step.toSeq shouldBe grid.step.toSeq
    Sq8Index.append(spark, dir, day1)
    val (_, codes) = Sq8Index.load(spark, dir)
    codes.count() shouldBe e.count()
    // the codes artifact is payload-free by contract
    codes.columns.toSet shouldBe Set("vec_id", "code")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val appended = rows(Sq8Index.topKFrom(queries, codes, e, grid,
      k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    val rebuilt = rows(Sq8Index.topKFrom(queries, Sq8Index.encode(e, grid), e,
      grid, k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    appended shouldBe rebuilt
  }

  test("SQ8 query-side quantization clamps to the grid exactly like packCodes " +
      "(out-of-grid query under a frozen drifted grid)") {
    val sp = spark; import sp.implicits._
    // grid trained on a narrow corpus then FROZEN; the query sits far
    // outside the trained [min, max] — the drifted-artifact regime
    val corpus = (0 until 20).map(i => (i.toLong, Array.fill(4)(i / 20.0f)))
      .toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val grid = Sq8Index.train(corpus)
    val q = Seq((0L, Array.fill(4)(5.0f))).toDF("qid", "qv")
      .withColumn("qv", col("qv").cast("array<float>"))
    // float path: quantize-then-reconstruct of the query side
    val qa = Sq8Index.quantizeQueries(q, grid)
      .select(col("qa")).collect()(0).getSeq[Float](0)
    // byte-code path: encode → packCodes (saturates at 255) → dequantByte
    val recon = Sq8Index.packCodes(Sq8Index.encode(
        q.select(col("qid").as("vec_id"), col("qv").as("embedding")), grid),
        grid)
      .select(Sq8Index.dequantByte(col("bcode"), grid).as("r"))
      .collect()(0).getSeq[Float](0)
    // both must saturate to the grid edge — unclamped reconstruction
    // would extrapolate to ~5.0 and the two scoring paths would diverge
    qa shouldBe recon
    all(qa) should be < 1.0f
  }

  test("IVF topKFrom with a LAGGING SQ8 artifact fails loudly instead of " +
      "silently dropping candidates; a complete artifact answers like inline") {
    val e = embeddings.localCheckpoint()
    val cents = IvfIndex.centroids(spark, e, 16)
    val indexed = IvfIndex.assign(e, cents)
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val grid = Sq8Index.train(e)
    // complete side-car: identical answer to the inline train+encode path
    val full = Sq8Index.encode(e, grid)
    val withArtifact = rows(IvfIndex.topKFrom(queries, indexed, e, cents,
      k = 5, nProbe = 3, quant = Some((full, grid))))
    val inline = rows(IvfIndex.topKFrom(queries, indexed, e, cents,
      k = 5, nProbe = 3))
    withArtifact shouldBe inline
    // lagging side-car (codes missing for half the corpus — the ivf
    // append reached the cells but not the sq8 artifact): loud failure,
    // not invisible recall loss
    val lagging = Sq8Index.encode(e.filter(col("vec_id") % 2 === 0), grid)
    val ex = intercept[IllegalStateException] {
      IvfIndex.topKFrom(queries, indexed, e, cents,
        k = 5, nProbe = 3, quant = Some((lagging, grid))).collect()
    }
    ex.getMessage should include("lags the IVF cells")
  }

  test("a half-written artifact (no meta) is invisible to exists") {
    val dir = tmpDir("graft_partial").toString
    new java.io.File(s"$dir/codes").mkdirs()
    ArtifactPaths.exists(dir) shouldBe false
  }
}
