package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins UnigramTrainer (rows-only by declared design) the PageRankSpec
  * way: an INDEPENDENTLY-written plain-Scala Viterbi-EM replay over the
  * collected word-frequency table must match the distributed trainer
  * exactly — counts are longs (order-invariant aggregation) and log-probs
  * are pure functions of those longs, so parity is IEEE-exact, not
  * approximate. Plus the tie-break contract, segmentation round-trip,
  * artifact lifecycle, and determinism.
  */
class UnigramTrainerSpec extends SparkSpec {

  private val TargetVocab = 200
  private val Iters = 3
  private val MaxLen = 6
  private val SeedFactor = 4

  /** Independent reference: memoized recursive Viterbi (different shape
    * from the trainer's iterative DP, same declared tie rule: best
    * log-prob, ties to the longest LAST piece).
    */
  private def refViterbi(w: String, logp: Map[String, Double]):
      Option[List[String]] = {
    val memo = scala.collection.mutable.Map.empty[Int, Option[(Double, List[String])]]
    def best(j: Int): Option[(Double, List[String])] =
      if (j == 0) Some((0.0, Nil))
      else memo.getOrElseUpdate(j, {
        var r: Option[(Double, List[String])] = None
        // ascending start i — on equal scores keep the FIRST (smallest i,
        // longest last piece), matching the trainer's strict improvement
        var i = math.max(0, j - MaxLen)
        while (i < j) {
          val piece = w.substring(i, j)
          logp.get(piece).foreach { lp =>
            best(i).foreach { case (s, ps) =>
              val cand = s + lp
              if (r.forall(_._1 < cand)) r = Some((cand, ps :+ piece))
            }
          }
          i += 1
        }
        r
      })
    if (w.isEmpty) Some(Nil) else best(w.length).map(_._2)
  }

  /** Full plain-Scala replay of seed → EM×iters → prune → final count. */
  private def refTrain(words: Seq[(String, Long)]): Seq[(String, Long, Double)] = {
    def logpOf(v: Seq[(String, Long)]): Map[String, Double] = {
      val lt = math.log(v.map(_._2).sum.toDouble)
      v.map { case (p, c) => p -> (math.log(c.toDouble) - lt) }.toMap
    }
    // seed: frequency-weighted substring counts, top seedFactor×target by
    // (cnt desc, piece asc), union all single chars
    val subCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; i <- 0 until w.length;
         l <- 1 to math.min(MaxLen, w.length - i)) {
      val p = w.substring(i, i + l)
      subCounts(p) = subCounts.getOrElse(p, 0L) + f
    }
    val top = subCounts.toSeq.sortBy { case (p, c) => (-c, p) }
      .take(SeedFactor * TargetVocab)
    val chars = subCounts.toSeq.filter(_._1.length == 1)
    var vocab = (top ++ chars).distinct.sortBy(_._1)

    def emCounts(v: Seq[(String, Long)]): Map[String, Long] = {
      val lp = logpOf(v)
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- words; ps <- refViterbi(w, lp).toSeq; p <- ps)
        counts(p) = counts.getOrElse(p, 0L) + f
      counts.toMap
    }
    for (_ <- 1 to Iters) {
      val counts = emCounts(vocab)
      vocab = vocab.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (c > 0) Some((p, c))
        else if (p.length == 1) Some((p, 1L)) else None
      }.sortBy(_._1)
    }
    val (cs, multi) = vocab.partition(_._1.length == 1)
    val kept = cs ++ multi.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, TargetVocab - cs.size))
    val fc = emCounts(kept)
    val fin = kept.map { case (p, _) =>
      (p, math.max(fc.getOrElse(p, 0L), 1L))
    }.sortBy(_._1)
    val lp = logpOf(fin)
    fin.map { case (p, c) => (p, c, lp(p)) }
  }

  private def fixtureWords() = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    BpeTrainer.wordFreq(docs, col("text"))
  }

  test("distributed Viterbi-EM matches the plain-Scala replay exactly " +
      "(pieces, counts, IEEE log-probs)") {
    val wordsDf = fixtureWords()
    val got = UnigramTrainer.train(spark, wordsDf, TargetVocab, Iters,
      MaxLen, SeedFactor)
    val ref = refTrain(wordsDf.collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq)
    got.map(p => (p.piece, p.cnt)) shouldBe ref.map(t => (t._1, t._2))
    // bitwise log-prob parity: same longs, same ln
    got.map(_.logp) shouldBe ref.map(_._3)
    got.size should be <= TargetVocab
    got.map(_.piece).distinct.size shouldBe got.size
  }

  test("viterbi: tie resolves to the longest LAST piece; uncovered " +
      "characters make a word unsegmentable") {
    val lp = Map("a" -> -1.0, "b" -> -1.0, "c" -> -1.0,
      "ab" -> -1.0, "bc" -> -1.0)
    // "a·bc" and "ab·c" tie at -2.0: the rule keeps the longest last piece
    UnigramTrainer.viterbi("abc", lp, MaxLen) shouldBe Some(Seq("a", "bc"))
    UnigramTrainer.viterbi("abc", lp, MaxLen) shouldBe
      refViterbi("abc", lp).map(_.toSeq)
    UnigramTrainer.viterbi("abq", lp, MaxLen) shouldBe None
    UnigramTrainer.viterbi("", lp, MaxLen) shouldBe Some(Seq.empty)
  }

  test("segmentation: pieces concatenate back to each word; parity with " +
      "the reference on the fixture") {
    val wordsDf = fixtureWords()
    val vocab = UnigramTrainer.train(spark, wordsDf, TargetVocab, Iters,
      MaxLen, SeedFactor)
    val lp = vocab.map(p => p.piece -> p.logp).toMap
    val words = wordsDf.collect().map(_.getString(0))
    words.foreach { w =>
      val seg = UnigramTrainer.viterbi(w, lp, MaxLen)
      seg should not be None // char floor: everything stays segmentable
      seg.get.mkString("") shouldBe w
      seg.map(_.toList) shouldBe refViterbi(w, lp)
    }
    // corpus pass shape: one row per doc, n_pieces ≥ n_words, seg parity
    // on the first doc
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val segDf = UnigramTrainer.segment(spark, docs, vocab)
      .orderBy(col("doc_id")).collect()
    segDf.length shouldBe docs.count()
    segDf.foreach(r => r.getLong(2) should be >= r.getLong(1))
    val first = docs.orderBy(col("doc_id")).select(lower(col("text")))
      .head().getString(0).split("\\s+").filter(_.nonEmpty)
    val expect = first.map(w =>
      refViterbi(w, lp).map(_.mkString("·")).getOrElse(w)).mkString(" ")
    segDf.head.getString(3) shouldBe expect
  }

  test("vocab artifact round-trips; training is deterministic") {
    val wordsDf = fixtureWords()
    val v1 = UnigramTrainer.train(spark, wordsDf, TargetVocab, Iters,
      MaxLen, SeedFactor)
    val v2 = UnigramTrainer.train(spark, wordsDf, TargetVocab, Iters,
      MaxLen, SeedFactor)
    v1 shouldBe v2
    val dir = java.nio.file.Files.createTempDirectory("unigram").toString + "/v"
    UnigramTrainer.saveVocab(spark, dir, v1)
    assert(ArtifactPaths.exists(dir))
    UnigramTrainer.loadVocab(spark, dir) shouldBe v1
  }
}
