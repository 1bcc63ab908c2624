package graft.copy

import java.io.{FilterInputStream, IOException, InputStream}

/** Cluster-global bandwidth cap — the semantic the reference's per-stream
  * limiter cannot express (reference/service/ThrottledInputStream.java
  * throttles each stream independently, so N concurrent copies consume
  * N× the configured bandwidth; SURVEY.md §7.4): all streams sharing one
  * `TokenBucket` consume at most the bucket's rate IN AGGREGATE, however
  * many run in parallel.
  *
  * Deployment shape: the bucket is a per-JVM singleton
  * (`GlobalThrottle.bucket(name, rate)`), so in the reference's own
  * single-JVM service shape — and in Spark local mode — one bucket IS
  * the global cap. On a multi-executor cluster the DRIVER coordinates by
  * dividing the global budget across executors (ship
  * `globalRate / numExecutors` in the task closure; each executor's
  * singleton then enforces its share). Under even task spread the
  * aggregate is exact; under skew it is CONSERVATIVE — an idle
  * executor's share goes unused, but the cluster-wide total can never
  * exceed the cap, which is the direction an ops cap must err.
  *
  * Accounting is charge-after-read (same as the per-stream limiter): a
  * read completes, then its bytes are acquired from the bucket, blocking
  * the NEXT read until the budget catches up. Aggregate overshoot is
  * therefore bounded by `burstBytes + streams × read-buffer`, a constant
  * independent of runtime — the ε in the spec's `aggregate ≤ cap·(1+ε)`.
  */
final class TokenBucket(val bytesPerSecond: Long, val burstBytes: Long) {
  require(bytesPerSecond > 0, s"bytesPerSecond must be positive: $bytesPerSecond")
  require(burstBytes > 0, s"burstBytes must be positive: $burstBytes")

  private[this] var tokens: Double = burstBytes.toDouble
  private[this] var lastRefill: Long = System.nanoTime()

  private def refill(): Unit = {
    val now = System.nanoTime()
    tokens = math.min(burstBytes.toDouble,
      tokens + (now - lastRefill) * bytesPerSecond / 1e9)
    lastRefill = now
  }

  /** Block until `n` tokens are granted. Work-conserving: a waiter drains
    * whatever tokens exist (so concurrent acquirers interleave instead of
    * convoying), then sleeps out exactly its remaining deficit at the
    * bucket rate. Total tokens granted over any window of length T are
    * ≤ burstBytes + rate·T regardless of caller count — the aggregate
    * invariant the spec measures. Interruption surfaces exactly like the
    * per-stream limiter: IOException with the interrupt flag restored.
    */
  def acquire(n: Long): Unit = synchronized {
    var remaining = n.toDouble
    while (remaining > 0) {
      refill()
      if (tokens > 0) {
        val take = math.min(tokens, remaining)
        tokens -= take
        remaining -= take
      }
      if (remaining > 0) {
        // sleep out the deficit for the next chunk (≤ burst at a time);
        // floor 1 ms so a sub-ms deficit doesn't busy-spin
        val deficit = math.min(remaining, burstBytes.toDouble) - tokens
        val waitNanos = math.max(1000000L,
          (deficit * 1e9 / bytesPerSecond).toLong)
        try wait(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
        catch {
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            throw new IOException("Throttled read interrupted", e)
        }
      }
    }
  }
}

/** The per-stream limiter's interface over a SHARED bucket: drop-in where
  * ThrottledInputStream is used, but the cap spans every stream holding
  * the same bucket.
  */
final class GloballyThrottledInputStream(in: InputStream, bucket: TokenBucket)
    extends FilterInputStream(in) {

  override def read(): Int = {
    val b = in.read()
    if (b != -1) bucket.acquire(1)
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    val n = in.read(b, off, len)
    if (n > 0) bucket.acquire(n)
    n
  }
}

/** Per-JVM bucket registry: tasks of one executor rendezvous on a name
  * ("copy", a tenant id, ...) and share that bucket. First registration
  * fixes the rate; later callers with a different rate get the existing
  * bucket (one cap per name per JVM — by design: two rates for one name
  * would mean two caps pretending to be one).
  */
object GlobalThrottle {
  private val buckets =
    new java.util.concurrent.ConcurrentHashMap[String, TokenBucket]()

  /** Default burst: a quarter-second of budget, floored at one copy
    * buffer (64 KiB) so a tiny rate still admits whole reads.
    */
  def bucket(name: String, bytesPerSecond: Long,
      burstBytes: Long = 0L): TokenBucket =
    buckets.computeIfAbsent(name, _ => new TokenBucket(bytesPerSecond,
      if (burstBytes > 0) burstBytes
      else math.max(65536L, bytesPerSecond / 4)))

  /** Test hook: drop a named bucket so specs get fresh state. */
  private[copy] def reset(name: String): Unit = { buckets.remove(name); () }
}
