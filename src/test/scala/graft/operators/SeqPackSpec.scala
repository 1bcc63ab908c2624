package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the sequence-packing operator: exact next-fit layout, budget
  * invariant, oversize-singleton policy, determinism, and the
  * partition-boundary rule (packs never span partitions).
  */
class SeqPackSpec extends SparkSpec {

  private def docsDf(rows: (Long, Long)*) = {
    val sp = spark; import sp.implicits._
    rows.toDF("doc_id", "n_tokens")
  }

  test("next-fit packing in doc_id order with exact pack layout") {
    val df = docsDf((1L, 100L), (2L, 200L), (3L, 300L), (4L, 250L),
      (5L, 600L), (6L, 10L))
    val packed = SeqPack.pack(df, budget = 512, numPartitions = 1)
      .collect().sortBy(p => (p.pack_id, p.pos))
    // pack1: 1(100)+2(200)=300; doc3 would hit 600 → pack2: 3(300);
    // doc4 would hit 550 → pack3: 4(250); doc5 oversize → pack4: 5(600);
    // pack5: 6(10)
    packed.map(p => (p.pack_id & 0xFFFFFFFFFFL, p.pos, p.doc_id)).toSeq shouldBe Seq(
      (1L, 0, 1L), (1L, 1, 2L),
      (2L, 0, 3L),
      (3L, 0, 4L),
      (4L, 0, 5L),
      (5L, 0, 6L))
  }

  test("budget invariant: every multi-doc pack fits; only singletons exceed") {
    val df = docsDf((1L to 200L).map(i => (i, (i * 37) % 700 + 1)): _*)
    val packs = SeqPack.pack(df, budget = 512, numPartitions = 4).toDF()
      .groupBy(col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("used"))
      .collect()
    packs.foreach { r =>
      val (nDocs, used) = (r.getLong(1), r.getLong(2))
      if (nDocs > 1) used should be <= 512L
    }
    // all 200 docs land exactly once
    SeqPack.pack(df, budget = 512, numPartitions = 4)
      .collect().map(_.doc_id).sorted.toSeq shouldBe (1L to 200L).toSeq
  }

  test("deterministic: same input + partition count → identical layout") {
    val df = docsDf((1L to 100L).map(i => (i, (i * 13) % 300 + 1)): _*)
    def layout() = SeqPack.pack(df, budget = 256, numPartitions = 8)
      .collect().map(p => (p.pack_id, p.pos, p.doc_id)).sortBy(identity).toSeq
    layout() shouldBe layout()
  }
}
