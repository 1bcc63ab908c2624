package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.normSq

/** Tombstone-delete contract (VERDICT r7 #1) for all six persisted index
  * kinds: a probe AFTER deleteIds must be row-identical to a probe
  * against an index REBUILT without those ids. For the ANN kinds the
  * rebuilt twin reuses the same trained codebooks/centroids/grid —
  * deletion removes rows from the index, it does not retrain — so the
  * comparison is exact. For the near-dup kinds the comparison holds even
  * though a rebuild recomputes the frozen df order, because both paths
  * are lossless candidate filters in front of the same exact
  * verification.
  */
class TombstoneSpec extends SparkSpec {

  private def embeddings = graft.Tables.embeddings(spark, sfDir)
    .select(col("vec_id"), col("embedding"), normSq(col("embedding")).as("n2"))

  private def documents = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"),
      graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))

  private def annRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq

  private def matchRows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  private def queriesOf(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"),
        col("n2").as("qn2"))

  // delete a slice that is guaranteed to intersect real top-k lists:
  // every third corpus vector / document
  private def deadVec(e: org.apache.spark.sql.DataFrame) =
    e.filter(col("vec_id") % 3 === 1 && col("vec_id") >= 10)
      .select(col("vec_id"))

  test("PQ: probe-after-delete == probe-against-rebuilt-without-ids") {
    val e = embeddings.localCheckpoint()
    val books = PqIndex.train(spark, e, dim = 64, m = 8, k = 16)
    val dead = deadVec(e).localCheckpoint()
    val live = e.join(dead, Seq("vec_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_pq_tomb").toString
    PqIndex.save(dirA, books, PqIndex.encode(e, books))
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_pq_tomb_rebuilt").toString
    PqIndex.save(dirB, books, PqIndex.encode(live, books))

    val q = queriesOf(e)
    val idxA = PqIndex.load(spark, dirA)
    val idxB = PqIndex.load(spark, dirB)
    val afterDelete = annRows(PqIndex.topKFrom(q, idxA.codes, e, idxA.books,
      k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    val rebuilt = annRows(PqIndex.topKFrom(q, idxB.codes, e, idxB.books,
      k = 5, pool = 25).orderBy(col("qid"), col("rn")))
    afterDelete shouldBe rebuilt
    // and no deleted id ever surfaces
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    afterDelete.map(_._3).toSet.intersect(deadIds) shouldBe empty
  }

  test("IVF: probe-after-delete == probe-against-rebuilt-without-ids") {
    val e = embeddings.localCheckpoint()
    val cents = IvfIndex.centroids(spark, e, 16)
    val dead = deadVec(e).localCheckpoint()
    val live = e.join(dead, Seq("vec_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_ivf_tomb").toString
    IvfIndex.save(dirA, cents, IvfIndex.assign(e, cents))
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_ivf_tomb_rebuilt").toString
    IvfIndex.save(dirB, cents, IvfIndex.assign(live, cents))

    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val (cA, cellsA) = IvfIndex.load(spark, dirA)
    val (cB, cellsB) = IvfIndex.load(spark, dirB)
    annRows(IvfIndex.topKFrom(q, cellsA, e, cA, k = 5, nProbe = 3)) shouldBe
      annRows(IvfIndex.topKFrom(q, cellsB, e, cB, k = 5, nProbe = 3))
  }

  test("IVF-PQ: probe-after-delete == probe-against-rebuilt-without-ids") {
    val e = embeddings.localCheckpoint()
    val cents = IvfIndex.centroids(spark, e, 16)
    val books = PqIndex.train(spark, e, dim = 64, m = 8, k = 16)
    val dead = deadVec(e).localCheckpoint()
    val live = e.join(dead, Seq("vec_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_ivfpq_tomb").toString
    PqIndex.save(dirA, books, PqIndex.encode(IvfIndex.assign(e, cents), books),
      Some(cents))
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_ivfpq_tomb_rebuilt").toString
    PqIndex.save(dirB, books,
      PqIndex.encode(IvfIndex.assign(live, cents), books), Some(cents))

    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val idxA = PqIndex.load(spark, dirA)
    val idxB = PqIndex.load(spark, dirB)
    annRows(PqIndex.topKIvfFrom(q, idxA.codes, e, idxA.books, idxA.cents.get,
      k = 5, pool = 25, nProbe = 6).orderBy(col("qid"), col("rn"))) shouldBe
      annRows(PqIndex.topKIvfFrom(q, idxB.codes, e, idxB.books, idxB.cents.get,
        k = 5, pool = 25, nProbe = 6).orderBy(col("qid"), col("rn")))
  }

  test("SQ8: probe-after-delete == probe-against-rebuilt-without-ids") {
    val e = embeddings.localCheckpoint()
    val grid = Sq8Index.train(e)
    val dead = deadVec(e).localCheckpoint()
    val live = e.join(dead, Seq("vec_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_sq8_tomb").toString
    Sq8Index.save(dirA, grid, Sq8Index.encode(e, grid))
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_sq8_tomb_rebuilt").toString
    Sq8Index.save(dirB, grid, Sq8Index.encode(live, grid))

    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("n2").as("qn2"))
    val (gA, codesA) = Sq8Index.load(spark, dirA)
    val (gB, codesB) = Sq8Index.load(spark, dirB)
    annRows(Sq8Index.topKFrom(q, codesA, e, gA, k = 5, pool = 25)
      .orderBy(col("qid"), col("rn"))) shouldBe
      annRows(Sq8Index.topKFrom(q, codesB, e, gB, k = 5, pool = 25)
        .orderBy(col("qid"), col("rn")))
  }

  test("jaccard prefix index: probe-after-delete == probe-against-rebuilt-without-ids") {
    val corpus = documents.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
    val batch = documents.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val dead = corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id"))
      .localCheckpoint()
    val live = corpus.join(dead, Seq("doc_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_jac_tomb").toString
    NearDup.saveJaccardIndex(corpus, dirA)
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_jac_tomb_rebuilt").toString
    NearDup.saveJaccardIndex(live, dirB)

    val afterDelete = matchRows(
      NearDup.jaccardMatchesAgainstLoaded(batch, spark, dirA))
    val rebuilt = matchRows(
      NearDup.jaccardMatchesAgainstLoaded(batch, spark, dirB))
    afterDelete shouldBe rebuilt
    // sanity: the delete actually removed matches (the slice was chosen
    // to intersect real near-dup pairs; an always-empty diff would make
    // this spec vacuous)
    val before = matchRows(NearDup.jaccardMatchesAgainst(batch, corpus))
    assert(before.size > afterDelete.size,
      s"delete slice removed no matches (before=${before.size})")
  }

  test("band index: probe-after-delete == probe-against-rebuilt-without-ids") {
    val corpus = documents.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
    val batch = documents.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val dead = corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id"))
      .localCheckpoint()
    val live = corpus.join(dead, Seq("doc_id"), "left_anti").localCheckpoint()

    val dirA = tmpDir("graft_band_tomb").toString
    NearDup.saveBandIndex(corpus, dirA)
    Tombstones.deleteIds(dirA, dead)
    val dirB = tmpDir("graft_band_tomb_rebuilt").toString
    NearDup.saveBandIndex(live, dirB)

    matchRows(NearDup.matchAgainstBandIndex(batch,
      NearDup.loadBandIndex(spark, dirA))) shouldBe
      matchRows(NearDup.matchAgainstBandIndex(batch,
        NearDup.loadBandIndex(spark, dirB)))
  }

  test("compaction (load + save to dest) drops tombstoned rows and probes identically") {
    // the IndexMain compact-* kernel: load already excludes tombstones,
    // so a re-save under the same frozen parameters is the storage-
    // reclaim form of the artifact — identical probes, zero tombstones
    val e = embeddings.localCheckpoint()
    val books = PqIndex.train(spark, e, dim = 64, m = 8, k = 16)
    val dead = deadVec(e).localCheckpoint()
    val dir = tmpDir("graft_pq_compact_src").toString
    PqIndex.save(dir, books, PqIndex.encode(e, books))
    Tombstones.deleteIds(dir, dead)
    val dest = tmpDir("graft_pq_compact_dst").toString
    val idx = PqIndex.load(spark, dir)
    PqIndex.save(dest, idx.books, idx.codes, idx.cents)

    Tombstones.count(spark, dest) shouldBe 0L
    val cIdx = PqIndex.load(spark, dest)
    cIdx.codes.count() shouldBe (e.count() - dead.count())
    val q = queriesOf(e)
    annRows(PqIndex.topKFrom(q, cIdx.codes, e, cIdx.books, k = 5, pool = 25)
      .orderBy(col("qid"), col("rn"))) shouldBe
      annRows(PqIndex.topKFrom(q, idx.codes, e, idx.books, k = 5, pool = 25)
        .orderBy(col("qid"), col("rn")))

    // jaccard flavor: compaction re-derives from the live docs half and
    // REFRESHES the frozen order — matches must equal the tombstoned
    // probe (both are lossless filters over the same live corpus)
    val corpus = documents.filter(col("doc_id") % 10 =!= 0).localCheckpoint()
    val batch = documents.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val deadDocs = corpus.filter(col("doc_id") % 3 === 1).select(col("doc_id"))
    val jdir = tmpDir("graft_jac_compact_src").toString
    NearDup.saveJaccardIndex(corpus, jdir)
    Tombstones.deleteIds(jdir, deadDocs)
    val jdest = tmpDir("graft_jac_compact_dst").toString
    val thr = spark.read.parquet(s"$jdir/meta").collect()(0).getDouble(0)
    // the compaction source is the FULL live member view (r17: the docs
    // half is class-collapsed — reading it raw would lose members)
    val live = NearDup.loadJaccardDocs(spark, jdir)
    NearDup.saveJaccardIndex(live.select(col("doc_id"), col("sh")), jdest, thr)
    matchRows(NearDup.jaccardMatchesAgainstLoaded(batch, spark, jdest)) shouldBe
      matchRows(NearDup.jaccardMatchesAgainstLoaded(batch, spark, jdir))
  }

  test("deletes are idempotent, suppress later appends, and a rebuild compacts them") {
    val corpus = documents.filter(col("doc_id") % 10 > 1).localCheckpoint()
    val day1 = documents.filter(col("doc_id") % 10 === 1).localCheckpoint()
    val batch = documents.filter(col("doc_id") % 10 === 0).localCheckpoint()
    val dir = tmpDir("graft_jac_tomb_life").toString
    NearDup.saveJaccardIndex(corpus, dir)
    val deadIds = NearDup.jaccardMatchesAgainst(batch, corpus)
      .select(col("matched_id")).distinct().localCheckpoint()

    // idempotence: same delete twice == once
    Tombstones.deleteIds(dir, deadIds)
    val once = matchRows(NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir))
    Tombstones.deleteIds(dir, deadIds)
    matchRows(NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir)) shouldBe once

    // durability: tombstones also suppress rows added by a LATER append
    // (delete day-1 ids up front, then append day-1 — none may surface)
    val day1Ids = day1.select(col("doc_id"))
    Tombstones.deleteIds(dir, day1Ids)
    NearDup.appendToJaccardIndex(day1, spark, dir)
    val day1Set = day1Ids.collect().map(_.getLong(0)).toSet
    val afterAppend = matchRows(
      NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir))
    afterAppend.map(_._2).toSet.intersect(day1Set) shouldBe empty

    // compaction: a rebuild (save) clears the tombstone table, so the
    // fresh artifact serves all its ids again
    Tombstones.count(spark, dir) should be > 0L
    NearDup.saveJaccardIndex(corpus, dir)
    Tombstones.count(spark, dir) shouldBe 0L
    matchRows(NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir)) shouldBe
      matchRows(NearDup.jaccardMatchesAgainst(batch, corpus))
  }
}
