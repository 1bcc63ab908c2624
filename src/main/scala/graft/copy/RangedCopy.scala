package graft.copy

import java.io.{IOException, RandomAccessFile}
import java.security.MessageDigest

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.util.SerializableConfiguration

/** Range-split parallel copy of ONE large file — the copy engine's missing
  * scale dimension. `CopyEngine` fans a DIRECTORY out across executor
  * slots, but a single file still flows through one 64 KiB stream
  * (reference/service/HdfsCopyService.java:111-151), so one 1 TB file is
  * capped at single-stream throughput however many slots the cluster has.
  * Here the file splits into fixed-size byte ranges and each range copies
  * as its own Spark task:
  *
  *   - READ side: any Hadoop filesystem — `FSDataInputStream.seek` is the
  *     standard positioned-read API (HDFS serves ranges from whichever
  *     DataNodes hold the blocks, so N range tasks draw on N× the
  *     spindles/NICs, not one).
  *   - WRITE side: the destination must resolve to a `file:` path visible
  *     to every executor (the reference's destination IS the local
  *     filesystem; in local-mode and shared-mount deployments this holds).
  *     The driver preallocates the file to full length, then each task
  *     `RandomAccessFile.seek`s to its offset — ranges are disjoint, so
  *     writers never contend. An HDFS destination has no positional
  *     write; the documented posture there is per-range part files +
  *     `DFS.concat` (full-block ranges), which this class deliberately
  *     does not hide behind the same API.
  *
  * Verification stays end-to-end and read-back-shaped WITHOUT the
  * sequential whole-file MD5 pass the single-stream path uses (which
  * would re-serialize the copy): each task digests its range INLINE while
  * copying, then re-reads its own range from the written destination and
  * compares. Byte ranges partition the file, so "every range's read-back
  * digest matches its source digest" is exactly byte-equality of the
  * whole file — the same guarantee, verified at range granularity, in
  * parallel. A mismatch reports the familiar message with the offending
  * range's offset; the bad destination file stays in place (reference
  * parity, CopyEngine rule).
  *
  * Throttling: `bandwidthMbPerSec` keeps its CopyEngine meaning — it caps
  * THIS FILE's aggregate rate. The per-file budget is divided across the
  * ranges that can run concurrently (bw·2²⁰ / min(ranges, slots) bytes/s
  * per stream), so a caller reusing a CopyRequest-style bandwidth value
  * gets the same file-level cap whether the file goes single-stream or
  * ranged — NOT a silent bw × fan-out multiplication. (Directory fan-out
  * keeps the reference's per-item semantic — SURVEY §7.4; that is N
  * files, not one.) The cluster-global token bucket
  * (`graft.copy.global.mbps`, GlobalThrottle) still caps the JVM-wide
  * aggregate on top, regardless of range fan-out.
  */
object RangedCopy {

  final case class RangeSpec(idx: Int, offset: Long, len: Long)
  final case class RangeResult(idx: Int, bytes: Long, verified: Boolean,
      error: String)

  val DefaultRangeBytes: Long = 128L * 1024 * 1024 // one HDFS block

  /** Split [0, length) into ⌈length/rangeBytes⌉ ranges. */
  def ranges(length: Long, rangeBytes: Long): Seq[RangeSpec] = {
    require(rangeBytes > 0, s"rangeBytes must be positive: $rangeBytes")
    if (length == 0) Seq.empty
    else (0L until length by rangeBytes).zipWithIndex.map { case (off, i) =>
      RangeSpec(i, off, math.min(rangeBytes, length - off))
    }
  }

  /** Local filesystem path of a `file:`-scheme (or scheme-less) dest;
    * error for anything else — positional writes need a real file.
    */
  private def localPathOf(dst: Path): String = {
    val uri = dst.toUri
    val scheme = uri.getScheme
    if (scheme != null && scheme != "file")
      throw new IOException(
        s"Ranged copy needs a file: destination (positional writes); got $dst")
    uri.getPath
  }

  /** Copy `sourcePath` (any Hadoop FS) to local `destPath` with
    * `rangeBytes`-sized ranges as Spark tasks. Small files (one range)
    * fall through to the ordinary single-stream `CopyEngine.copyOne`
    * so callers can use this unconditionally.
    */
  def copyFile(spark: SparkSession, conf: Configuration, sourcePath: String,
      destPath: String, bandwidthMbPerSec: Option[Int] = None,
      checksumEnabled: Boolean = true,
      rangeBytes: Long = DefaultRangeBytes,
      // test seam (the CopyEngine rule): runs per range after its write,
      // before its read-back verify — lets a spec corrupt a chosen range
      postWriteHook: Option[(String, RangeSpec) => Unit] = None): CopyResult = {
    val src = new Path(sourcePath)
    val srcFs = src.getFileSystem(conf)
    if (!srcFs.exists(src))
      throw new IOException(s"Source path does not exist: $sourcePath")
    val st = srcFs.getFileStatus(src)
    if (st.isDirectory)
      throw new IOException(s"Ranged copy is for files, got directory: $sourcePath")

    val specs = ranges(st.getLen, rangeBytes)
    if (specs.size <= 1) {
      val r = CopyEngine.copyOne(conf, sourcePath, destPath,
        bandwidthMbPerSec, checksumEnabled, None)
      if (r.error != null) throw new IOException(r.error)
      return CopyResult(r.bytes, r.verified)
    }

    val dst = new Path(destPath)
    val local = localPathOf(dst)
    val parent = new java.io.File(local).getParentFile
    if (parent != null && !parent.isDirectory && !parent.mkdirs())
      throw new IOException(s"Failed to create parent directory: $parent")
    // Preallocate to full length so disjoint writers never race on extend.
    val raf = new RandomAccessFile(local, "rw")
    try raf.setLength(st.getLen) finally raf.close()

    import spark.implicits._
    val sconf = new SerializableConfiguration(conf)
    val srcStr = sourcePath
    // Per-file budget divided across the ranges that can run at once:
    // tasks queue beyond the executor slots, so at most min(ranges, slots)
    // streams are concurrent — each gets budget/concurrency bytes/s and
    // the file's aggregate stays ≤ the requested bandwidth (see scaladoc).
    val concurrency = math.max(1,
      math.min(specs.size, spark.sparkContext.defaultParallelism))
    val bwBytes = bandwidthMbPerSec.map(b =>
      math.max(1L, b.toLong * 1024 * 1024 / concurrency))
    val checksum = checksumEnabled
    val hook = postWriteHook
    val par = math.min(specs.size, spark.sparkContext.defaultParallelism * 2)
    val results = spark.createDataset(specs)
      .repartition(par)
      .mapPartitions { it =>
        val c = sconf.value
        it.map(sp => copyRange(c, srcStr, local, sp, bwBytes, checksum, hook))
      }
      .collect() // O(#ranges) tiny rows — payload never crosses the driver

    results.find(_.error != null).foreach(r => throw new IOException(r.error))
    CopyResult(results.map(_.bytes).sum,
      checksum && results.nonEmpty && results.forall(_.verified))
  }

  /** One range: positioned read (throttled) → positional local write,
    * digesting inline; then re-read the WRITTEN range and compare — the
    * read-back verify at range granularity. Never throws; errors ride
    * back as rows (the copyOne rule).
    */
  private[copy] def copyRange(conf: Configuration, srcPath: String,
      localDst: String, spec: RangeSpec, bwBytesPerSec: Option[Long],
      checksumEnabled: Boolean,
      postWriteHook: Option[(String, RangeSpec) => Unit] = None): RangeResult = {
    try {
      val src = new Path(srcPath)
      val srcFs = src.getFileSystem(conf)
      val digest = if (checksumEnabled) MessageDigest.getInstance("MD5") else null
      var total = 0L

      val rawIn = srcFs.open(src)
      val perStream: java.io.InputStream = bwBytesPerSec match {
        case Some(b) => new ThrottledInputStream(rawIn, b)
        case None => rawIn
      }
      val in = conf.getInt(CopyEngine.GlobalMbpsKey, 0) match {
        case mbps if mbps > 0 =>
          new GloballyThrottledInputStream(perStream,
            GlobalThrottle.bucket("copy-global", mbps.toLong * 1024 * 1024))
        case _ => perStream
      }
      try {
        rawIn.seek(spec.offset)
        val out = new RandomAccessFile(localDst, "rw")
        try {
          out.seek(spec.offset)
          val buf = new Array[Byte](64 * 1024)
          var remaining = spec.len
          while (remaining > 0) {
            val n = in.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
            if (n < 0)
              throw new IOException(
                s"Unexpected EOF at ${spec.offset + total} in $srcPath")
            out.write(buf, 0, n)
            if (digest != null) digest.update(buf, 0, n)
            total += n
            remaining -= n
          }
        } finally out.close()
      } finally in.close()

      postWriteHook.foreach(_(localDst, spec))

      if (!checksumEnabled) return RangeResult(spec.idx, total, verified = false, null)

      // Read-back verify of THIS range from the written file.
      val sourceHash = digest.digest()
      val back = MessageDigest.getInstance("MD5")
      val raf = new RandomAccessFile(localDst, "r")
      try {
        raf.seek(spec.offset)
        val buf = new Array[Byte](64 * 1024)
        var remaining = spec.len
        while (remaining > 0) {
          val n = raf.read(buf, 0, math.min(buf.length.toLong, remaining).toInt)
          if (n < 0) throw new IOException(
            s"Unexpected EOF reading back $localDst at ${spec.offset}")
          back.update(buf, 0, n)
          remaining -= n
        }
      } finally raf.close()
      val localHash = back.digest()
      if (!MessageDigest.isEqual(sourceHash, localHash))
        // bad dest file stays in place — reference parity
        RangeResult(spec.idx, total, verified = false,
          s"Checksum mismatch for $localDst (range ${spec.idx} @ ${spec.offset}+${spec.len}): " +
            s"source=${CopyEngine.hex(sourceHash)}, local=${CopyEngine.hex(localHash)}")
      else RangeResult(spec.idx, total, verified = true, null)
    } catch {
      case e: Exception =>
        RangeResult(spec.idx, 0L, verified = false,
          if (e.getMessage != null) e.getMessage else e.toString)
    }
  }
}
