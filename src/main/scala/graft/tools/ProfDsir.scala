package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch A/B for the q_sample_dsir feature pass (r20, verdict item 7):
  * per-occurrence md5 bucketing vs per-row sorted-run dedup (md5 once
  * per DISTINCT feature per doc, count carried). Prints wall for each
  * variant; run twice and read the second pair (JIT warm).
  */
object ProfDsir {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextFunctions._
    val B = 1024
    val docs = graft.Tables.documents(spark, d)
    val toks = docs.select(col("doc_id"), col("lang"),
      tokens(lower(col("text"))).as("t"))
    val nm1 = greatest(size(col("t")) - 1, lit(0))
    val fa = concat(col("t"),
      zip_with(slice(col("t"), lit(1), nm1), slice(col("t"), lit(2), nm1),
        (a, b) => concat_ws(" ", a, b)))

    def occurrence() = toks.select(col("doc_id"), col("lang"),
        explode(fa).as("f"))
      .select(col("doc_id"), col("lang"),
        pmod(conv(substring(md5(col("f")), 1, 8), 16, 10).cast("long"),
          lit(B.toLong)).as("b"))
      .agg(count(lit(1)), sum(col("b"))).collect()(0)

    def runs() = {
      val t2 = toks.select(col("doc_id"), col("lang"), fa.as("fa"))
        .withColumn("fs", sort_array(col("fa")))
      val n = size(col("fs"))
      val starts = filter(sequence(lit(0), n - 1), i =>
        (i === 0) || (element_at(col("fs"), i + 1) =!= element_at(col("fs"), i)))
      val pairs = zip_with(starts,
        concat(slice(starts, lit(2), greatest(size(starts) - 1, lit(0))), array(n)),
        (s, e) => struct(element_at(col("fs"), s + 1).as("f"), (e - s).as("cnt")))
      t2.filter(n > 0)
        .select(col("doc_id"), col("lang"), explode(pairs).as("p"))
        .select(col("doc_id"), col("lang"), col("p.cnt").as("cnt"),
          pmod(conv(substring(md5(col("p.f")), 1, 8), 16, 10).cast("long"),
            lit(B.toLong)).as("b"))
        .agg(sum(col("cnt")), sum(col("b") * col("cnt"))).collect()(0)
    }

    for (round <- 1 to 2) {
      var t0 = System.nanoTime()
      val o = occurrence()
      println(f"[dsir] r$round occurrence: ${(System.nanoTime() - t0) / 1e9}%6.2f s  -> $o")
      t0 = System.nanoTime()
      val r = runs()
      println(f"[dsir] r$round runs      : ${(System.nanoTime() - t0) / 1e9}%6.2f s  -> $r")
    }
    spark.stop()
  }
}
