package graft.copy

import java.io.{FilterInputStream, IOException, InputStream}

/** Bandwidth-limiting InputStream: sleep-based throttling over a 1-second
  * window. Behavioral parity with the reference limiter
  * (reference/service/ThrottledInputStream.java:17-68): when a window has
  * consumed its byte budget, sleep out the window remainder, then reset.
  * The cap is per-stream — N concurrent copies consume N× the configured
  * bandwidth, exactly like the reference (see SURVEY.md §7.4). For the
  * cluster-global semantic the reference can't give, see GlobalThrottle:
  * streams sharing one TokenBucket cap their AGGREGATE.
  *
  * Interruption during the sleep surfaces as IOException("Throttled read
  * interrupted") with the interrupt flag restored.
  */
final class ThrottledInputStream(in: InputStream, maxBytesPerSecond: Long)
    extends FilterInputStream(in) {
  require(maxBytesPerSecond > 0,
    s"maxBytesPerSecond must be positive, got: $maxBytesPerSecond")

  private[this] var windowStartNanos: Long = System.nanoTime()
  private[this] var bytesReadInWindow: Long = 0L

  override def read(): Int = {
    throttle()
    val b = in.read()
    if (b != -1) bytesReadInWindow += 1
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    throttle()
    val n = in.read(b, off, len)
    if (n > 0) bytesReadInWindow += n
    n
  }

  private def throttle(): Unit = {
    if (bytesReadInWindow >= maxBytesPerSecond) {
      val elapsed = System.nanoTime() - windowStartNanos
      val remaining = 1000000000L - elapsed
      if (remaining > 0) {
        try Thread.sleep(remaining / 1000000L, (remaining % 1000000L).toInt)
        catch {
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new IOException("Throttled read interrupted", e)
        }
      }
      windowStartNanos = System.nanoTime()
      bytesReadInWindow = 0L
    }
  }
}
