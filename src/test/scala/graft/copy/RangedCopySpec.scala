package graft.copy

import java.io.IOException
import java.nio.file.Files
import org.apache.hadoop.conf.Configuration
import graft.SparkSpec

/** Range-split single-file parallel copy (RangedCopy): byte fidelity via
  * disjoint positional writes, partition-exact range math, small-file
  * fallback, per-range read-back mismatch detection (with the bad dest
  * left in place — the CopyEngine parity rule), and error messages.
  */
class RangedCopySpec extends SparkSpec {

  private def conf = new Configuration()

  private def writeRandom(bytes: Int, seed: Long = 7L): java.nio.file.Path = {
    val p = tmpDir("graft_ranged_src").resolve("big.bin")
    val buf = new Array[Byte](bytes)
    new java.util.Random(seed).nextBytes(buf)
    Files.write(p, buf)
    p
  }

  test("ranges partition [0, length) exactly, remainder in the last range") {
    val rs = RangedCopy.ranges(10L * 1024 * 1024 + 123, 1024 * 1024)
    rs.size shouldBe 11
    rs.head.offset shouldBe 0L
    rs.map(_.len).sum shouldBe 10L * 1024 * 1024 + 123
    rs.sliding(2).foreach { case Seq(a, b) =>
      b.offset shouldBe a.offset + a.len
    }
    rs.last.len shouldBe 123
    RangedCopy.ranges(0L, 1024) shouldBe empty
  }

  test("multi-range copy is byte-identical and verified; bytes sum") {
    val src = writeRandom(5 * 1024 * 1024 + 789)
    val dst = tmpDir("graft_ranged_dst").resolve("copy.bin")
    val r = RangedCopy.copyFile(spark, conf, src.toString, dst.toString,
      rangeBytes = 512 * 1024)
    r.bytesCopied shouldBe 5 * 1024 * 1024 + 789
    r.checksumVerified shouldBe true
    Files.readAllBytes(dst) shouldBe Files.readAllBytes(src)
  }

  test("single-range file falls back to the single-stream path") {
    val src = writeRandom(64 * 1024)
    val dst = tmpDir("graft_ranged_dst1").resolve("small.bin")
    val r = RangedCopy.copyFile(spark, conf, src.toString, dst.toString,
      rangeBytes = 1024 * 1024)
    r.bytesCopied shouldBe 64 * 1024
    r.checksumVerified shouldBe true
    Files.readAllBytes(dst) shouldBe Files.readAllBytes(src)
  }

  test("checksum disabled: bytes land, verified=false (reference rule)") {
    val src = writeRandom(3 * 1024 * 1024)
    val dst = tmpDir("graft_ranged_dst2").resolve("nocheck.bin")
    val r = RangedCopy.copyFile(spark, conf, src.toString, dst.toString,
      checksumEnabled = false, rangeBytes = 1024 * 1024)
    r.checksumVerified shouldBe false
    Files.readAllBytes(dst) shouldBe Files.readAllBytes(src)
  }

  test("a corrupted range fails its read-back verify; bad dest stays in place") {
    val src = writeRandom(4 * 1024 * 1024)
    val dst = tmpDir("graft_ranged_dst3").resolve("corrupt.bin")
    // corrupt ONE byte inside range 2, after its write, before its verify
    val hook: (String, RangedCopy.RangeSpec) => Unit = { (path, spec) =>
      if (spec.idx == 2) {
        val raf = new java.io.RandomAccessFile(path, "rw")
        try {
          raf.seek(spec.offset + 17)
          val b = raf.read()
          raf.seek(spec.offset + 17)
          raf.write(b ^ 0xff)
        } finally raf.close()
      }
    }
    val e = intercept[IOException] {
      RangedCopy.copyFile(spark, conf, src.toString, dst.toString,
        rangeBytes = 1024 * 1024, postWriteHook = Some(hook))
    }
    e.getMessage should startWith("Checksum mismatch for ")
    e.getMessage should include("range 2 @ ")
    // bad dest file left in place, full length (reference parity)
    Files.size(dst) shouldBe 4 * 1024 * 1024
  }

  test("bandwidthMbPerSec caps the FILE's aggregate, not each range") {
    // 8 × 1 MiB ranges with a 2 MB/s FILE budget on local[4]: the budget
    // divides across the 4 concurrent ranges (512 KiB/s per stream), so
    // each 1 MiB range must sleep out at least one throttle window and
    // the two waves take ≳2 s. Under the old per-range semantic each
    // stream would get the full 2 MB/s, a 1 MiB range would fit inside
    // one burst window with zero sleeps, and the copy would finish in
    // well under 0.5 s — a CopyRequest-style bandwidth value silently
    // meaning fan-out× what it says.
    val src = writeRandom(8 * 1024 * 1024, seed = 21L)
    val dst = tmpDir("graft_ranged_filebw").resolve("filebw.bin")
    val t0 = System.nanoTime()
    val r = RangedCopy.copyFile(spark, conf, src.toString, dst.toString,
      bandwidthMbPerSec = Some(2), rangeBytes = 1024 * 1024)
    val sec = (System.nanoTime() - t0) / 1e9
    r.bytesCopied shouldBe 8L * 1024 * 1024
    r.checksumVerified shouldBe true
    Files.readAllBytes(dst) shouldBe Files.readAllBytes(src)
    // 8 MiB at 2 MB/s aggregate ⇒ ideal 4 s; window-burst admits each
    // stream's first second of budget free ⇒ require ≥ 1.2 s
    sec should be > 1.2
  }

  test("cluster-global cap bounds the RANGE fan-out in aggregate") {
    // 8 × 1 MiB ranges of one file fan out across slots; a global 4 MB/s
    // cap must bound their AGGREGATE (8 MiB ⇒ ideal ~2.1 s) even though
    // each range stream alone is unthrottled — the SURVEY claim that the
    // global bucket composes with ranged fan-out, pinned.
    GlobalThrottle.reset("copy-global")
    val src = writeRandom(8 * 1024 * 1024, seed = 3L)
    val dst = tmpDir("graft_ranged_gcap").resolve("capped.bin")
    val gconf = conf
    gconf.setInt(CopyEngine.GlobalMbpsKey, 4)
    val t0 = System.nanoTime()
    val r = RangedCopy.copyFile(spark, gconf, src.toString, dst.toString,
      rangeBytes = 1024 * 1024)
    val sec = (System.nanoTime() - t0) / 1e9
    r.bytesCopied shouldBe 8L * 1024 * 1024
    r.checksumVerified shouldBe true
    Files.readAllBytes(dst) shouldBe Files.readAllBytes(src)
    // burst (1 s of budget) + charge-after overshoot admit the first
    // chunks free: require ≥ 1.2 s, the CopyEngineSpec bound
    sec should be > 1.2
    GlobalThrottle.reset("copy-global")
  }

  test("missing source and directory source raise the engine's messages") {
    val dst = tmpDir("graft_ranged_dst4").resolve("x.bin")
    val missing = intercept[IOException] {
      RangedCopy.copyFile(spark, conf, "/no/such/file.bin", dst.toString)
    }
    missing.getMessage shouldBe "Source path does not exist: /no/such/file.bin"
    val dir = tmpDir("graft_ranged_srcdir")
    val isDir = intercept[IOException] {
      RangedCopy.copyFile(spark, conf, dir.toString, dst.toString)
    }
    isDir.getMessage should include("Ranged copy is for files")
    val hdfsDst = intercept[IOException] {
      val src = writeRandom(2 * 1024 * 1024, seed = 11L)
      RangedCopy.copyFile(spark, conf, src.toString,
        "hdfs://nn/none.bin", rangeBytes = 1024 * 1024)
    }
    hdfsDst.getMessage should include("needs a file: destination")
  }
}
