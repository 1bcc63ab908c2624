package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contract for the persisted incremental near-dup index (VERDICT r6 #2):
  * probing a batch against the LOADED frozen-order artifact must equal
  * the recomputed union-df path exactly — the prefix lemma holds for any
  * fixed common total order, so the two lossless filters feed the same
  * exact verification and the outputs are identical sets.
  */
class NearDupIndexSpec extends SparkSpec {

  private def docsDf(rows: (Long, String)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
  }

  private def matches(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("dictFromShingles returns a MATERIALIZED dict: the unstable id " +
      "expression can never re-evaluate (r15 verdict footgun #3)") {
    val sp = spark; import sp.implicits._
    val shingles = (1 to 500).map(i => s"sh_$i")
    // adversarial layout: many partitions, then a repartition the
    // builder cannot see — token stability must not depend on it
    val dict = NearDup.dictFromShingles(
      shingles.toDF("shingle").repartition(7).distinct())
    // the returned plan is a pinned RDD scan; monotonically_increasing_id
    // is GONE from the plan, so no downstream re-planning (a second
    // subtree, AQE, a different join layout) can ever re-evaluate it
    val planStr = dict.queryExecution.optimizedPlan.toString
    planStr should not include "monotonically_increasing_id"
    planStr should include("LogicalRDD")
    // injective over the full vocabulary
    dict.select(countDistinct(col("tok"))).collect()(0).getLong(0) shouldBe 500L
    dict.select(countDistinct(col("shingle"))).collect()(0).getLong(0) shouldBe 500L
    // two independently-planned subtrees (one re-partitioned, one
    // aggregated) observe the SAME token assignment
    val a = dict.repartition(3, col("tok")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = dict.groupBy(col("shingle")).agg(min(col("tok")).as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    a shouldBe b
  }

  test("loaded-index probe equals recomputed batch-vs-corpus on the fixture") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val dir = tmpDir("graft_jacidx").toString
    NearDup.saveJaccardIndex(corpus, dir)
    ArtifactPaths.exists(dir) shouldBe true
    val loaded = matches(NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir))
    val recomputed = matches(NearDup.jaccardMatchesAgainst(batch, corpus))
    loaded shouldBe recomputed
  }

  test("seeded random batches with UNSEEN shingles still match brute force (3 rounds)") {
    // the frozen corpus order cannot rank shingles it has never seen —
    // they take df = 0 (rarest); this loop plants exactly that drift:
    // batch docs carry fresh tokens absent from the indexed corpus
    val rnd = new scala.util.Random(7117)
    def tok() = s"t${rnd.nextInt(120)}"
    val bases = Array.fill(6)(Array.fill(25)(tok()))
    def doc(fresh: Boolean): String = {
      val b = bases(rnd.nextInt(bases.length)).clone()
      val edits = rnd.nextInt(9)
      (1 to edits).foreach(_ => b(rnd.nextInt(b.length)) =
        if (fresh) s"new${rnd.nextInt(1000)}" else tok())
      b.mkString(" ")
    }
    for (rep <- 1 to 3) {
      val corpusDocs = docsDf((101 to 120).map(i => (i.toLong, doc(fresh = false))): _*)
      val batchDocs = docsDf((1 to 12).map(i => (i.toLong, doc(fresh = true))): _*)
      val dir = tmpDir(s"graft_jacidx_r$rep").toString
      NearDup.saveJaccardIndex(corpusDocs, dir)
      val got = matches(NearDup.jaccardMatchesAgainstLoaded(batchDocs, spark, dir))
      val a = batchDocs.select(col("doc_id").as("ba"), col("sh").as("sh_a"))
      val b = corpusDocs.select(col("doc_id").as("ca"), col("sh").as("sh_b"))
      val truth = a.join(b, lit(true))
        .withColumn("inter", org.apache.spark.sql.functions
          .size(array_intersect(col("sh_a"), col("sh_b"))))
        .withColumn("uni", org.apache.spark.sql.functions.size(col("sh_a"))
          + org.apache.spark.sql.functions.size(col("sh_b")) - col("inter"))
        .withColumn("j",
          round(col("inter").cast("double") / col("uni").cast("double"), 4))
        .filter(col("j") >= NearDup.DefaultThreshold)
        .select(col("ba"), col("ca"), col("j"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      withClue(s"round $rep: ") { got shouldBe truth }
    }
  }

  test("appended index probes identically to recompute against the full corpus") {
    // daily-ingest shape: index day-0 corpus, append day-1 docs under the
    // FROZEN day-0 shingle order, then probe — must equal the recomputed
    // batch-vs-(day0 ∪ day1) matches (the lemma needs only one fixed
    // common order; drifted dfs cost selectivity, never pairs)
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val day0 = docs.filter(col("doc_id") % 10 > 1)
    val day1 = docs.filter(col("doc_id") % 10 === 1)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val dir = tmpDir("graft_jacidx_app").toString
    NearDup.saveJaccardIndex(day0, dir)
    NearDup.appendToJaccardIndex(day1, spark, dir)
    val appended = matches(NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir))
    val recomputed = matches(
      NearDup.jaccardMatchesAgainst(batch, day0.unionByName(day1)))
    appended shouldBe recomputed
  }

  test("appended band index equals a rebuild over the union") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val day0 = docs.filter(col("doc_id") % 10 > 1)
    val day1 = docs.filter(col("doc_id") % 10 === 1)
    val dir = tmpDir("graft_bandidx_app").toString
    NearDup.saveBandIndex(day0, dir)
    NearDup.appendToBandIndex(day1, spark, dir)
    val appended = NearDup.loadBandIndex(spark, dir)
    val rebuilt = NearDup.buildBandIndex(day0.unionByName(day1))
    appended.banded.count() shouldBe rebuilt.banded.count()
    val aSet = appended.banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rSet = rebuilt.banded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    aSet shouldBe rSet
  }

  test("batch band-index probe: loaded == built, every match exact-verified") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val dir = tmpDir("graft_bandidx_probe").toString
    NearDup.saveBandIndex(corpus, dir)
    val got = matches(
      NearDup.matchAgainstBandIndex(batch, NearDup.loadBandIndex(spark, dir)))
    val built = matches(
      NearDup.matchAgainstBandIndex(batch, NearDup.buildBandIndex(corpus)))
    got shouldBe built
    // LSH is recall-approximate but NEVER precision-approximate: every
    // reported pair must be in the exact cross-set jaccard output
    val exact = matches(NearDup.jaccardMatchesAgainst(batch, corpus))
    got.diff(exact) shouldBe empty
    got should not be empty // the fixture's planted cross-set near-dups
  }

  test("probe stats measure the matcher's own kernel: verified == match count, candidates bound it") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    val dir = tmpDir("graft_jacidx_stats").toString
    NearDup.saveJaccardIndex(corpus, dir)
    val stats = NearDup.jaccardProbeStats(batch, spark, dir)
    val matchCount = NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir).count()
    stats.verified shouldBe matchCount
    stats.candidates should be >= stats.verified
    stats.batchDocs shouldBe batch.filter(
      org.apache.spark.sql.functions.size(col("sh")) > 0).count()
    stats.indexedDocs shouldBe corpus.filter(
      org.apache.spark.sql.functions.size(col("sh")) > 0).count()
    stats.vocab should be > 0L
    stats.prefixRows should be > 0L
  }

  test("probing at a HIGHER threshold than the build is allowed; lower is rejected") {
    val corpus = docsDf((101L, (1 to 30).map(i => s"c$i").mkString(" ")))
    val nearDup = (1 to 29).map(i => s"c$i").mkString(" ") + " x30"
    val batch = docsDf((1L, nearDup))
    val dir = tmpDir("graft_jacidx_thr").toString
    NearDup.saveJaccardIndex(corpus, dir, threshold = 0.8)
    // τ_probe > τ_build: prefixes are longer than the wider filter needs
    val strict = matches(
      NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir, threshold = 0.95))
    val strictTruth = matches(
      NearDup.jaccardMatchesAgainst(batch, corpus, threshold = 0.95))
    strict shouldBe strictTruth
    // τ_probe < τ_build would need corpus prefixes the artifact never wrote
    an[IllegalArgumentException] should be thrownBy
      NearDup.jaccardMatchesAgainstLoaded(batch, spark, dir, threshold = 0.5)
  }

  test("band-index split verify: encoded base + string-path appends + OOV batch shingles == in-memory rebuild") {
    // the r15 dictionary-encoded verify splits candidates between the
    // long-array path (docs covered by the build-time dictionary) and
    // the string path (appends after the dictionary froze). This plants
    // all three hard cases at once: a batch doc matching a BASE doc, a
    // batch doc matching an APPENDED doc on shingles the dictionary has
    // never seen (both sides out-of-vocabulary — any encode-only verify
    // would undercount the intersection to zero), and a batch doc with
    // mixed seen/unseen shingles. Truth = the in-memory index over the
    // union, whose dictionary covers everything.
    def uni(rows: (Long, String)*) = {
      val sp = spark; import sp.implicits._
      rows.toDF("doc_id", "text").select(col("doc_id"),
        graft.functions.TextFunctions.wordShingles(col("text"), 1).as("sh"))
    }
    val base = uni(
      (101L, (1 to 20).map(i => s"b$i").mkString(" ")),
      (102L, (1 to 20).map(i => s"c$i").mkString(" ")))
    // appended day: entirely fresh vocabulary, frozen dict covers none of it
    val appended = uni((201L, (1 to 20).map(i => s"z$i").mkString(" ")))
    val batch = uni(
      (1L, (1 to 19).map(i => s"b$i").mkString(" ") + " b99"), // vs base
      (2L, (1 to 19).map(i => s"z$i").mkString(" ") + " z99"), // vs append, OOV
      (3L, (1 to 10).map(i => s"c$i").mkString(" ") + " " +
        (1 to 10).map(i => s"z$i").mkString(" "))) // mixed, below threshold
    val dir = tmpDir("graft_bandsplit").toString
    NearDup.saveBandIndex(base, dir)
    NearDup.appendToBandIndexKeyed(appended, spark, dir, "day1")
    val loaded = matches(NearDup.matchAgainstBandIndex(
      batch, NearDup.loadBandIndex(spark, dir), threshold = 0.5))
    val rebuilt = matches(NearDup.matchAgainstBandIndex(
      batch, NearDup.buildBandIndex(base.unionByName(appended)),
      threshold = 0.5))
    loaded shouldBe rebuilt
    // the planted base and appended pairs both surfaced (jaccard 19/21)
    loaded.map(m => (m._1, m._2)) should contain allOf ((1L, 101L), (2L, 201L))
  }
}
