package graft.tools

import graft.SparkSpec
import graft.operators.NearDup
import org.apache.spark.sql.functions._

/** check-jaccard (VERDICT r7 #4): the rebuild-cadence signal's CONSUMER.
  * The verdict function must stay quiet on a healthy fresh index and trip
  * on a drift-degraded one — driven here by REAL ProbeStats from real
  * indexes, not hand-built numbers, so the thresholds are exercised
  * against the actual kernel.
  */
class IndexCheckSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)]) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
  }

  test("healthy fresh index reads ok at the default thresholds") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val dir = tmpDir("graft_check_ok").toString
    NearDup.saveJaccardIndex(docs.filter(col("doc_id") % 10 > 1), dir)
    val s = NearDup.jaccardProbeStats(
      docs.filter(col("doc_id") % 10 === 0), spark, dir)
    IndexMain.jaccardDegraded(s, maxRatio = 50.0, maxCand = 20.0) shouldBe false
  }

  test("df drift after heavy append trips the degraded verdict") {
    // The drift story the saveJaccardIndex staleness contract warns
    // about, made concrete. Day 0: a library of 200 one-phrase docs plus
    // ONE doc carrying a 10-word "viral" block, so the block's shingles
    // freeze at df = 1 — maximally rare, guaranteed prefix slots (their
    // words sort before the library's, winning the df tie). Then the
    // corpus grows by append: 150 docs, each the viral block + a library
    // phrase — every shingle KNOWN to the frozen order (unseen df-0
    // shingles would harmlessly eat the prefix instead; this is the
    // drift case, not the unseen case). Under the frozen order every
    // appended doc still indexes the viral shingles as its "rare"
    // prefix, and a probe batch carrying the block (with held-out
    // phrases, so nothing verifies at τ = 0.8) collides with all of
    // them: candidates ≈ |batch| × |appended|, verified = 0 — exactly
    // the candidates-per-doc blowup check-jaccard exists to catch.
    val viral = (1 to 10).map(i => s"aaa$i").mkString(" ")
    def phrase(i: Int) = (1 to 20).map(k => s"lib${i}w$k").mkString(" ")
    val day0 = docsDf(
      (300L, viral) +: (1 to 200).map(i => (i.toLong, phrase(i))))
    val dir = tmpDir("graft_check_drift").toString
    NearDup.saveJaccardIndex(day0, dir)

    val appended = docsDf(
      (1 to 150).map(i => (1000L + i, s"$viral ${phrase(i)}")))
    NearDup.appendToJaccardIndex(appended, spark, dir)

    val batch = docsDf(
      (1 to 50).map(j => (2000L + j, s"$viral ${phrase(150 + j)}")))
    val s = NearDup.jaccardProbeStats(batch, spark, dir)

    // the blowup is real: every batch doc collides with every viral doc
    assert(s.candidates >= s.batchDocs * 100,
      s"expected a candidate blowup, got $s")
    s.verified shouldBe 0
    IndexMain.jaccardDegraded(s, maxRatio = 50.0, maxCand = 20.0) shouldBe true

    // and a REBUILD (recomputing df over the grown corpus — viral
    // shingles now common, out of every prefix) restores health
    val rebuilt = tmpDir("graft_check_rebuilt").toString
    NearDup.saveJaccardIndex(day0.union(appended), rebuilt)
    val s2 = NearDup.jaccardProbeStats(batch, spark, rebuilt)
    assert(s2.candidates < s.candidates / 10,
      s"rebuild should collapse candidates: before=${s.candidates} after=${s2.candidates}")
    IndexMain.jaccardDegraded(s2, maxRatio = 50.0, maxCand = 20.0) shouldBe false
  }

  test("phantom reps (r18 task 6): deleting every member of a collapsed " +
      "class is reported, trips the verdict, and compaction clears it") {
    val sp = spark; import sp.implicits._
    // 4 exact-set classes: one 20-member identical class + 3 singletons
    def phrase(i: Int) = (1 to 25).map(k => s"cls${i}w$k").mkString(" ")
    val corpus = docsDf(
      (1 to 20).map(i => (i.toLong, phrase(0))) ++
        (1 to 3).map(i => (100L + i, phrase(i))))
    val dir = tmpDir("graft_check_phantom").toString
    NearDup.saveJaccardIndex(corpus, dir)
    NearDup.phantomRepStats(spark, dir) shouldBe ((0L, 4L))
    val batch = docsDf(Seq((500L, phrase(0)), (501L, phrase(2))))
    val s0 = NearDup.jaccardProbeStats(batch, spark, dir)
    s0.phantomReps shouldBe 0L
    s0.matches shouldBe 21L // 20 class members + 1 singleton
    IndexMain.jaccardDegraded(s0, maxRatio = 50.0, maxCand = 20.0) shouldBe false

    // kill the whole 20-member class: its rep stays in prefix/docs (the
    // member-level exclusion contract) but every probe's expansion now
    // finds nothing — the phantom the stats must name
    graft.operators.Tombstones.deleteIds(dir, (1L to 20L).toDF("id"))
    NearDup.phantomRepStats(spark, dir) shouldBe ((1L, 4L))
    val s1 = NearDup.jaccardProbeStats(batch, spark, dir)
    s1.phantomReps shouldBe 1L
    s1.indexedReps shouldBe 4L
    s1.phantomShare shouldBe 0.25 +- 1e-9
    s1.matches shouldBe 1L // the class expands to zero rows
    // the phantom axis trips at maxPhantom below the share...
    IndexMain.jaccardDegraded(s1, maxRatio = 50.0, maxCand = 20.0,
      maxPhantom = 0.2) shouldBe true
    // ...and the other axes alone stay quiet
    IndexMain.jaccardDegraded(s1, maxRatio = 50.0, maxCand = 20.0,
      maxPhantom = 0.5) shouldBe false

    // compact re-collapses from live members only: phantom gone, probe
    // output unchanged
    val dest = tmpDir("graft_check_phantom_c").toString
    val thr = spark.read.parquet(s"$dir/meta").collect()(0).getDouble(0)
    NearDup.saveJaccardIndex(NearDup.loadJaccardDocs(spark, dir), dest, thr)
    NearDup.phantomRepStats(spark, dest) shouldBe ((0L, 3L))
    val s2 = NearDup.jaccardProbeStats(batch, spark, dest)
    s2.phantomReps shouldBe 0L
    s2.matches shouldBe 1L
    IndexMain.jaccardDegraded(s2, maxRatio = 50.0, maxCand = 20.0,
      maxPhantom = 0.2) shouldBe false

    // the band kind shares the member layout — same loop through
    // phantomRepStats (the stats-band/check-band surface)
    val bdir = tmpDir("graft_check_phantom_band").toString
    NearDup.saveBandIndex(corpus, bdir)
    NearDup.phantomRepStats(spark, bdir) shouldBe ((0L, 4L))
    graft.operators.Tombstones.deleteIds(bdir, (1L to 20L).toDF("id"))
    NearDup.phantomRepStats(spark, bdir) shouldBe ((1L, 4L))
    val bdest = tmpDir("graft_check_phantom_band_c").toString
    val idx = NearDup.loadBandIndex(spark, bdir)
    NearDup.saveBandIndex(idx.docs, bdest, idx.numHashes, idx.bands,
      idx.rowsPerBand)
    NearDup.phantomRepStats(spark, bdest) shouldBe ((0L, 3L))
  }

  test("check-semdedup: a many-batch stream trips the growth gate; " +
      "compaction restores health (r12 task 5)") {
    import graft.operators.SemDedup
    val sp = spark; import sp.implicits._
    def vecs(ids: Seq[Long]): org.apache.spark.sql.DataFrame =
      ids.map { i =>
        val v = Array.fill(8)(0.1f); v((i % 4).toInt * 2) = 1.0f; (i, v)
      }.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding"),
          graft.functions.VectorFunctions.normSq(col("embedding")).as("n2"))

    // empty-start streaming artifact: model trained on a sample, the
    // standing side populated ONLY by keyed appends — the regime where
    // the probe's storedFloats union grows with every committed batch
    val dir = tmpDir("graft_check_semdedup").toString + "/idx"
    SemDedup.saveModel(dir, vecs(0L until 32L), k = 4)
    val empty = vecs(Seq.empty)
    (0 until 6).foreach { b =>
      SemDedup.appendBatchKeyed(spark, dir,
        vecs((100L + 4 * b) until (100L + 4 * b + 4)), empty,
        threshold = 0.9, key = s"batch$b"): Unit
    }
    val s = SemDedup.appendStats(spark, dir)
    s.appendSubtrees shouldBe 6
    s.appendedFloatRows shouldBe 24L
    s.baseAssignRows shouldBe 0L // empty-start: everything is tail
    // the SUBTREE axis trips; the growth axis stays quiet while no base
    // exists (an empty-start stream would otherwise trip on batch one)
    IndexMain.semdedupDegraded(s, maxSubtrees = 4, maxGrowth = 2.0) shouldBe true
    IndexMain.semdedupDegraded(s, maxSubtrees = 32, maxGrowth = 2.0) shouldBe false

    // compact folds every committed subtree into the base: zero
    // subtrees, zero tail, the same 24 standing floats — healthy again
    val dest = tmpDir("graft_check_semdedup_c").toString + "/idx"
    SemDedup.compact(spark, dir, dest)
    val s2 = SemDedup.appendStats(spark, dest)
    s2.appendSubtrees shouldBe 0
    s2.appendedFloatRows shouldBe 0L
    s2.baseFloatRows shouldBe 24L
    s2.baseAssignRows shouldBe 72L // 24 vectors × nProbe=3 soft cells
    IndexMain.semdedupDegraded(s2, maxSubtrees = 4, maxGrowth = 2.0) shouldBe false

    // regrow on the COMPACTED base: now the growth axis is live —
    // appended floats exceeding maxGrowth × base trip it
    (0 until 2).foreach { b =>
      SemDedup.appendBatchKeyed(spark, dest,
        vecs((500L + 4 * b) until (500L + 4 * b + 4)), empty,
        threshold = 0.9, key = s"regrow$b"): Unit
    }
    val s3 = SemDedup.appendStats(spark, dest)
    s3.appendedFloatRows shouldBe 8L // 8 vs base 96 rows
    IndexMain.semdedupDegraded(s3, maxSubtrees = 32, maxGrowth = 2.0) shouldBe false
    IndexMain.semdedupDegraded(s3, maxSubtrees = 32, maxGrowth = 0.05) shouldBe true

    // and the compacted artifact still answers: a probe batch matching a
    // streamed vector pairs against the folded standing side
    val probe = SemDedup.probeBatch(spark, dest, vecs(Seq(999L)),
      vecs((100L until 124L) :+ 999L), threshold = 0.9)
    probe.count() should be > 0L
  }
}
