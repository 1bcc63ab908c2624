package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the pipeline-second-wave operators beyond their DuckDB oracles:
  * planted-fixture behavior for decontamination and repetition, and the
  * coverage/overlap invariants of the chunker (the oracle proves engine
  * agreement; these prove the SEMANTICS are the intended ones).
  */
class PipelineDeepSpec extends SparkSpec {

  test("q_decontaminate flags exactly the planted overlap on the fixture split") {
    val out = graft.SparkEntry.queries("q_decontaminate")(spark, sfDir).collect()
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
    import graft.functions.TextFunctions
    val sh = docs.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), 3)).as("sh"))
    val ev = sh.filter(col("doc_id") % 50 === 0).select("sh").distinct()
    val flagged = sh.filter(col("doc_id") % 50 =!= 0).join(ev, "sh")
      .groupBy("doc_id").agg(countDistinct(col("sh")).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    flagged shouldBe Map(1L -> 1L) // "alpha beta gamma", and only doc 1
  }

  test("chunker covers every token exactly ceil-wise: starts stride apart, last chunk short") {
    val out = graft.SparkEntry.queries("q_chunk_overlap")(spark, sfDir)
      .collect().groupBy(_.getLong(0))
    out.foreach { case (_, chunks) =>
      val sorted = chunks.sortBy(_.getInt(1))
      // starts are exactly 0, 48, 96, ...
      sorted.zipWithIndex.foreach { case (r, i) =>
        r.getInt(1) shouldBe i
        r.getLong(2) shouldBe i.toLong * 48
      }
      // every chunk but possibly the last is the full 64-token window;
      // every chunk is non-empty and ≤ 64
      sorted.foreach(r => r.getLong(3) should (be > 0L and be <= 64L))
      sorted.dropRight(1).foreach { r =>
        // a non-final chunk always has ≥ stride tokens after its start,
        // so only the final chunk may be shorter than the window ONLY
        // when the doc runs out
        r.getLong(3) should be >= 16L
      }
      // chunks tile the doc: next start < previous start + 64 (overlap ≥ 16)
      sorted.sliding(2).foreach {
        case Array(a, b) => b.getLong(2) - a.getLong(2) shouldBe 48L
        case _ => ()
      }
    }
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
