package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic fixture scale-up for stress passes (SCALE.md §stress).
  *
  * Writes a `factor`× replica of the heavy-family tables (documents,
  * embeddings) plus unchanged copies of the small tables, so `graft.Bench`
  * subset mode can time the dedup/ANN/clusters family at sf1-equivalent
  * volume using the SAME query code paths.
  *
  * Replicas must be DISTINCT data, not clones: cloning every document
  * `factor`× would make every doc a member of a `factor`-clique, so
  * candidate volume per LSH bucket would grow as the square of the
  * replication — a data artifact, not an engine property. Instead each
  * replica k>0:
  *   - documents: word order is permuted by sorting on xxhash64(word, k)
  *     — length/vocab/token distributions are preserved, but 3-gram
  *     shingle sets (the near-dup signal) are destroyed, so cross-replica
  *     docs are honest negatives and the dup DENSITY of the original
  *     fixture is preserved at every factor;
  *   - embeddings: the float vector is circularly rotated by k positions
  *     — norms and per-dimension distributions are preserved while
  *     direction (the cosine signal) decorrelates.
  * Both transforms are pure functions of (row, k): re-running produces a
  * byte-identical fixture, so recorded stress numbers are reproducible.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {
  private val IdStride = 100000000L // replica id namespace; >> any fixture

  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: ScaleUp <srcSfDir> <outDir> <factor>")
    val Array(src, out, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1, "factor must be >= 1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events"))
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docReps = (0 until factor).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + lit(k * IdStride)).as("doc_id"),
        // hash-sort permutation of word order, seeded by the replica id
        expr(s"""array_join(
                   array_sort(split(text, ' '),
                     (l, r) -> CASE WHEN xxhash64(l, $k) < xxhash64(r, $k) THEN -1
                               WHEN xxhash64(l, $k) > xxhash64(r, $k) THEN 1
                               ELSE 0 END),
                   ' ')""").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    docReps.reduce(_.unionByName(_))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val embReps = (0 until factor).map { k =>
      if (k == 0) emb
      else emb.select(
        (col("vec_id") + lit(k * IdStride)).as("vec_id"),
        // circular rotation by k: slice(k+1..end) ++ slice(1..k)
        expr(s"concat(slice(embedding, ${k + 1}, size(embedding)), " +
          s"slice(embedding, 1, $k))").as("embedding"),
        col("label"))
    }
    embReps.reduce(_.unionByName(_))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val nd = spark.read.parquet(s"$out/documents.parquet").count()
    val ne = spark.read.parquet(s"$out/embeddings.parquet").count()
    println(s"[scaleup] wrote $out: documents=$nd embeddings=$ne factor=$factor")
    spark.stop()
  }
}
