package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the pipeline-second-wave operators beyond their DuckDB oracles:
  * planted-fixture behavior for decontamination and repetition, and the
  * coverage/overlap invariants of the chunker (the oracle proves engine
  * agreement; these prove the SEMANTICS are the intended ones).
  */
class PipelineDeepSpec extends SparkSpec {

  test("q_decontaminate flags the fixture overlap: train docs only, nonempty") {
    val out = graft.SparkEntry.queries("q_decontaminate")(spark, sfDir).collect()
    // the fixture split genuinely overlaps — an empty result would mean a
    // broken join/filter, not a clean corpus
    out should not be empty
    // every flagged doc is a train doc (never the eval split itself)
    out.foreach(r => (r.getLong(0) % 50) should not be 0L)
    // n_shared is a positive count
    out.foreach(r => r.getLong(1) should be > 0L)
  }

  test("decontamination catches a doc that copies an eval doc's text") {
    val sp = spark; import sp.implicits._
    // eval doc 0 (doc_id % 50 == 0) and a train doc 1 that embeds a
    // 3-token run from it; train doc 2 shares nothing
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "x y alpha beta gamma z"),
      (2L, "p q r s t u v")).toDF("doc_id", "text")
    val flagged = graft.operators.Decontaminate.flagged(
      docs.filter(col("doc_id") % 50 =!= 0),
      docs.filter(col("doc_id") % 50 === 0), k = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged shouldBe Map(1L -> 1L) // "alpha beta gamma", and only doc 1
  }

  test("decontamination sees the RAW eval split: a deduped-away eval doc still blocks its train twin") {
    val sp = spark; import sp.implicits._
    // doc 50 is eval; doc 7 is an exact train duplicate with a SMALLER id,
    // so exact dedup keeps 7 and drops 50. The operator must still flag 7
    // because eval shingles come from the raw split, not survivors.
    val raw = Seq(
      (7L, "secret eval passage here verbatim"),
      (50L, "secret eval passage here verbatim"),
      (8L, "completely unrelated training text")).toDF("doc_id", "text")
    val survivors = raw.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").join(raw, "doc_id") // exact dedup keeps 7, drops 50
    val flagged = graft.operators.Decontaminate.flagged(
      survivors.filter(col("doc_id") % 50 =!= 0),
      raw.filter(col("doc_id") % 50 === 0), k = 3)
      .collect().map(_.getLong(0)).toSet
    flagged shouldBe Set(7L)
  }

  test("chunker invariants: full windows except the final chunk, no redundant tail") {
    val out = graft.SparkEntry.queries("q_chunk_overlap")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    out should not be empty
    out.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getInt(1))
      // starts are exactly 0, 48, 96, ...
      sorted.zipWithIndex.foreach { case (r, i) =>
        r.getInt(1) shouldBe i
        r.getLong(2) shouldBe i.toLong * 48
      }
      // every non-final chunk is EXACTLY the full 64-token window (starts
      // stop at n-17, so a non-final start always has ≥ 48+17 tokens
      // ahead of it)
      sorted.dropRight(1).foreach(r => r.getLong(3) shouldBe 64L)
      // the final chunk is non-empty, ≤ 64, and contributes NEW tokens
      // beyond the previous chunk's coverage (> 16) unless it is the
      // doc's only chunk
      val last = sorted.last
      last.getLong(3) should (be > 0L and be <= 64L)
      if (sorted.length > 1) last.getLong(3) should be > 16L
    }
  }

  test("materializing chunker: chunk text is the exact token slice of the source doc") {
    // cross-check the TEXT variant against the metadata variant and the
    // source documents: same chunk grid, and each chunk's token count
    // matches its declared length; chunk 0's text is a prefix of the
    // whitespace-normalized document
    val meta = graft.SparkEntry.queries("q_chunk_overlap")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(3)).toMap
    val texts = graft.SparkEntry.queries("q_chunk_text")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getString(2)).toMap
    texts.keySet shouldBe meta.keySet
    texts.foreach { case (k, t) =>
      t.split("\\s+").count(_.nonEmpty).toLong shouldBe meta(k)
    }
    val doc0 = graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") === texts.keys.map(_._1).min)
      .select("text").collect().head.getString(0)
    val norm = doc0.split("\\s+").filter(_.nonEmpty).mkString(" ")
    norm should startWith(texts((texts.keys.map(_._1).min, 0)))
  }

  test("repetition ratios: a pathological repeated doc scores high, a unique doc zero") {
    val sp = spark; import sp.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "one two three four five six")).toDF("doc_id", "text")
    import graft.functions.TextFunctions
    val t = docs.select(col("doc_id"), TextFunctions.tokens(col("text")).as("t"))
    val tokStats = t.select(col("doc_id"), explode(col("t")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum(col("c")).as("n_toks"), max(col("c")).as("top_tok"),
        count(lit(1)).as("n_dist"))
      .select(col("doc_id"),
        round(lit(1.0) - col("n_dist") / col("n_toks"), 4).as("dup"),
        round(col("top_tok") / col("n_toks"), 4).as("top"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    tokStats(1L) shouldBe ((0.8333, 1.0))
    tokStats(2L) shouldBe ((0.0, 0.1667))
  }

  test("tfidf ranks a doc's distinctive token above corpus-wide stopwords") {
    val sp = spark; import sp.implicits._
    // "zebra" appears only in doc 1; "the" in every doc → idf("the") = 0
    val docs = Seq(
      (1L, "the zebra the the"),
      (2L, "the cat the dog"),
      (3L, "the bird the fish")).toDF("doc_id", "text")
    import graft.functions.TextFunctions
    val tc = docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dl = tc.groupBy("doc_id").agg(sum("tf").as("n_toks"))
    val df = tc.groupBy("tok").agg(count(lit(1)).as("df"))
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val top = tc.join(dl, "doc_id").join(df, "tok").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("tok"),
        round((col("tf") / col("n_toks")) * log(col("n_docs") / col("df")), 6).as("s"))
      .filter(col("doc_id") === 1L)
      .orderBy(col("s").desc, col("tok"))
      .collect()
    top.head.getString(1) shouldBe "zebra"
    // "the" scores exactly 0 (idf = ln(1)) despite tf = 3
    top.find(_.getString(1) == "the").get.getDouble(2) shouldBe 0.0
  }
}
