package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable streaming surface: replays the events fixture through a file
  * source (`readStream.parquet` with maxFilesPerTrigger — the A7 throttled-
  * ingest analog), applies the watermarked tumbling-window aggregation, and
  * writes the result to a parquet sink with a checkpoint:
  *
  *   sbt "runMain graft.streaming.StreamMain <eventsDir> <outDir> [files=N|bytes=N]"
  *
  * The optional third argument picks the ingest throttle: files=N →
  * maxFilesPerTrigger, bytes=N → maxBytesPerTrigger (both A7 analogs —
  * the reference throttles bytes/sec on the copy stream; a file stream
  * throttles admission per micro-batch). Default files=1.
  *
  * Prints one line per micro-batch and a final row count. Append-mode
  * watermark semantics on a finite replay: windows newer than
  * (max event time - watermark delay) are still open when input ends and
  * are correctly withheld from the sink — the sink row count reflects
  * CLOSED windows only (the streaming contract, not data loss).
  */
object StreamMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: StreamMain <eventsDir> <outDir>")
      sys.exit(2)
    }
    val Array(eventsDir, outDir) = args.take(2)
    val (throttleOpt, throttleVal) = args.lift(2).getOrElse("files=1").split("=", 2) match {
      case Array("files", n) => ("maxFilesPerTrigger", n)
      case Array("bytes", n) => ("maxBytesPerTrigger", n)
      case other =>
        System.err.println(s"bad throttle '${other.mkString("=")}': use files=N or bytes=N")
        sys.exit(2)
        ("", "")
    }
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-stream")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The streaming file source needs a DIRECTORY; the fixture is a single
    // parquet file — stage it into a DETERMINISTIC dir derived from the
    // input path (a fresh random temp dir would change the source paths
    // under a persistent checkpoint in $outDir, re-admitting every file
    // on re-run and appending duplicates to the sink).
    val srcDir = {
      val f = new java.io.File(eventsDir)
      if (f.isFile) {
        // key on (path, size, mtime) so a REGENERATED fixture at the same
        // path stages fresh instead of silently replaying stale data
        val key = java.security.MessageDigest.getInstance("MD5")
          .digest(s"${f.getAbsolutePath}|${f.length}|${f.lastModified}"
            .getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(16)
        val d = java.nio.file.Paths.get(
          sys.props("java.io.tmpdir"), s"graft_stream_src_$key")
        java.nio.file.Files.createDirectories(d)
        val staged = d.resolve(f.getName)
        if (!java.nio.file.Files.exists(staged))
          java.nio.file.Files.copy(f.toPath, staged)
        d.toString
      } else eventsDir
    }

    // File-source replay. The fixture stores ts as ns (read as Long under
    // nanosAsLong) — normalize to TimestampType exactly like Tables.events.
    val schema = spark.read.parquet(srcDir).schema
    val raw = spark.readStream
      .schema(schema)
      .option(throttleOpt, throttleVal) // throttled ingest (A7 analog)
      .parquet(srcDir)
    val events = graft.Tables.normalizeNanosTs(raw)

    val windowed = StreamingOps.windowedCounts(events, "10 minutes", "10 minutes")

    val q = windowed.writeStream
      .format("parquet")
      .option("path", s"$outDir/data")
      .option("checkpointLocation", s"$outDir/checkpoint")
      .outputMode("append")
      .start()
    q.processAllAvailable()
    q.stop()

    val n = spark.read.parquet(s"$outDir/data").count()
    println(s"""{"sink_rows":$n,"state":"finished"}""")
    spark.stop()
  }
}
