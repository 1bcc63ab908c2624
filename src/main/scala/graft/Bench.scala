package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: JIT + codegen + parquet-footer caches, so the first
    // timed query doesn't absorb JVM startup (it skewed ~3-4 s onto
    // whichever query the map iterated first).
    // Materialize via the noop sink, NOT count(): count() lets the
    // optimizer prune every computed column and eliminate final sorts, so
    // projection-shaped queries would time a bare scan and a regression
    // in any projection expression would be invisible to the anchor.
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q_scan_agg").foreach(q => run(q(spark, sfDir)))
    } catch { case _: Throwable => () }
    // Sorted-name execution order: Map iteration order reshuffles whenever
    // the registry grows, silently changing which queries run warm (JIT,
    // FS cache) — sorted order keeps anchors comparable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { run(fn(spark, sfDir)) } catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // Locale.ROOT: the f-interpolator honors the default locale, and a
    // comma decimal separator would make the line unparseable JSON —
    // regenerating the exact driver-parse failure this format exists to fix
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // Full per-query timings go to a file: the driver captures only the
    // last ~2000 chars of output, and a 124-query JSON line (~3 KB) gets
    // its head truncated there, so the driver's parse fails (BENCH_r01 and
    // BENCH_r03 both recorded parsed:null). The printed line stays compact
    // — total + the slowest queries that fit a hard budget — and points at
    // bench_full.json for the complete map.
    val fullJson = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(
        s"""{"metric":"total","value":$total,"unit":"sec","n":${results.size},"cpus":$cpus,"sf":"$sfDir","queries":{""",
        ",", "}}")
    val fullPath = java.nio.file.Paths.get("bench_full.json").toAbsolutePath
    java.nio.file.Files.write(fullPath,
      fullJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val budget = 1500 // chars for the whole line; tail capture is 2000
    val head = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n":${results.size},"full":"bench_full.json","sf":"$sfDir","queries":{"""
    val slowestFirst = results.sortBy(-_._2)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var len = head.length + 2 // closing "}}"
    slowestFirst.foreach { case (k, v) =>
      val e = "\"" + k + "\":" + fmt(v)
      if (len + e.length + 1 <= budget) { entries += e; len += e.length + 1 }
    }
    println(head + entries.mkString(",") + "}}")
    spark.stop()
  }
}
