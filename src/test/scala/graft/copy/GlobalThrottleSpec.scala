package graft.copy

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The cluster-global cap (VERDICT r7 stretch): N parallel streams
  * sharing one token bucket must stay within cap·(1+ε) IN AGGREGATE —
  * the semantic the reference's per-stream limiter cannot give (N
  * streams there consume N× the cap; ThrottledInputStreamSpec pins that
  * behavior for parity).
  */
class GlobalThrottleSpec extends AnyFunSuite with Matchers {

  private val MiB = 1024 * 1024

  test("N parallel streams: aggregate ≤ cap·(1+ε), and the cap is actually used") {
    val cap = 16L * MiB                 // bytes/sec
    val burst = 2 * MiB
    val nStreams = 8
    val perStream = 4 * MiB             // 32 MiB total → ideal ~1.9 s after burst
    val bucket = new TokenBucket(cap, burst)

    val totals = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val threads = (1 to nStreams).map { _ =>
      new Thread(() => {
        val in = new GloballyThrottledInputStream(
          new java.io.ByteArrayInputStream(new Array[Byte](perStream)), bucket)
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n != -1) { totals.addAndGet(n.toLong); n = in.read(buf) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(30000))
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val total = totals.get()

    total shouldBe (nStreams.toLong * perStream)
    val aggregateRate = total / elapsedSec
    // ε budget: burst + nStreams × read-buffer of charge-after overshoot,
    // plus scheduler noise — 1.3× leaves real headroom while still being
    // ~6× tighter than the per-stream limiter's N× blowout
    assert(aggregateRate <= cap * 1.3,
      f"aggregate ${aggregateRate / MiB}%.1f MiB/s exceeds cap ${cap / MiB} (+30%%)")
    // liveness: the bucket must also GRANT its budget (a limiter that
    // just runs slow would pass the cap check trivially)
    assert(aggregateRate >= cap * 0.5,
      f"aggregate ${aggregateRate / MiB}%.1f MiB/s — bucket is under-granting")
  }

  test("single stream through the shared bucket behaves like a plain limiter") {
    val cap = 8L * MiB
    val bucket = new TokenBucket(cap, MiB)
    val size = 4 * MiB
    val in = new GloballyThrottledInputStream(
      new java.io.ByteArrayInputStream(new Array[Byte](size)), bucket)
    val buf = new Array[Byte](64 * 1024)
    val t0 = System.nanoTime()
    var n = in.read(buf)
    var total = 0L
    while (n != -1) { total += n; n = in.read(buf) }
    val sec = (System.nanoTime() - t0) / 1e9
    total shouldBe size.toLong
    (total / sec) should be <= cap * 1.4
  }

  test("interrupt during a blocked acquire surfaces as IOException, flag restored") {
    val bucket = new TokenBucket(1024, 1024) // 1 KiB/s — guaranteed to block
    @volatile var caught: Throwable = null
    @volatile var flagRestored = false
    val t = new Thread(() => {
      try bucket.acquire(1024 * 1024)
      catch {
        case e: Throwable =>
          caught = e
          flagRestored = Thread.currentThread().isInterrupted
      }
    })
    t.start()
    Thread.sleep(200)
    t.interrupt()
    t.join(5000)
    caught shouldBe a[java.io.IOException]
    caught.getMessage should include("interrupted")
    flagRestored shouldBe true
  }

  test("registry: one bucket per name per JVM; first rate wins") {
    GlobalThrottle.reset("spec-bucket")
    val a = GlobalThrottle.bucket("spec-bucket", 10 * MiB)
    val b = GlobalThrottle.bucket("spec-bucket", 99 * MiB)
    (a eq b) shouldBe true
    a.bytesPerSecond shouldBe 10L * MiB
    GlobalThrottle.reset("spec-bucket")
  }
}
