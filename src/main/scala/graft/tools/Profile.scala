package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Ad-hoc profiling main for operator pieces (not part of the driver
  * contract): times isolated stages so regressions are attributable.
  */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.LogHygiene.suppressBoundedWindowWarn()

    time("tokens only") {
      Tables.documents(spark, d).select(tokenCount(col("text")).as("n"))
        .agg(sum(col("n"))).collect()
    }
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
    time("shingles compute") { docs.agg(sum(size(col("sh")))).collect() }
    val withSig = docs.withColumn("sig", minHashSignature(col("sh"), 32))
    time("shingles + minhash sig") { withSig.agg(sum(size(col("sig")))).collect() }
    val banded = withSig.withColumn("bandKey", explode(lshBandKeys(col("sig"), 8, 4)))
      .select(col("bandKey"), col("doc_id"))
    time("sig + band explode") { banded.count() }
    val inv = docs.select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("shingle"))
    time("inverted index explode") { inv.count() }
    val a = inv.select(col("shingle"), col("doc_id").as("id_a"), col("n").as("n_a"))
    val b = inv.select(col("shingle").as("sh_b"), col("doc_id").as("id_b"), col("n").as("n_b"))
    time("inv self-join + pair count") {
      a.join(b, col("shingle") === col("sh_b") && col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b")).agg(count(lit(1))).count()
    }
    time("full jaccard query") {
      graft.SparkEntry.queries("q_dedup_ngram_jaccard")(spark, d).count()
    }
    time("full minhash query") {
      graft.SparkEntry.queries("q_dedup_minhash_lsh")(spark, d).count()
    }
    // CC loop depth per cluster query (the iteration count IS the cost
    // model of DedupClusters.components — r19 opt attribution)
    Seq("q_dedup_simhash_clusters", "q_dedup_clusters",
        "q_dedup_image_clusters", "q_dedup_token_clusters").foreach { q =>
      time(s"$q (full)") { graft.SparkEntry.queries(q)(spark, d).count() }
      println(s"[profile] $q CC iterations: " +
        graft.operators.DedupClusters.lastIterations)
    }
    spark.stop()
  }
}
