package graft.copy

import java.time.Instant

/** Copy-job data model (the reference's model classes re-expressed as Scala case
  * classes + a mutable per-item state with volatile fields so in-flight
  * snapshots are safely readable — reference/model/CopyItemTask.java:6-27).
  * Statuses serialize by name (the reference's REST JSON uses enum names).
  */
object CopyTaskStatus extends Enumeration {
  val PENDING, IN_PROGRESS, COMPLETED, PARTIALLY_FAILED, FAILED = Value
}

object CopyItemStatus extends Enumeration {
  val PENDING, IN_PROGRESS, COMPLETED, FAILED = Value
}

/** One source→dest copy item of a request. */
final case class CopyItem(sourcePath: String, destPath: String)

/** A submitted request: namespace selects the per-cluster Hadoop config;
  * bandwidth (MB/s, per item-stream) is optional — None ⇒ unthrottled.
  */
final case class CopyRequest(
    namespace: String,
    items: Seq[CopyItem],
    bandwidthMbPerSec: Option[Int] = None)

/** Outcome of copying one path (file or whole directory). */
final case class CopyResult(bytesCopied: Long, checksumVerified: Boolean)

/** Live mutable state of one item; volatile fields → torn-free reads from
  * status pollers while a worker mutates (reference semantics: mid-flight
  * GET sees IN_PROGRESS items).
  */
final class CopyItemState(val sourcePath: String, val destPath: String) {
  @volatile var status: CopyItemStatus.Value = CopyItemStatus.PENDING
  @volatile var bytesCopied: Long = 0L
  @volatile var durationMs: Long = 0L
  @volatile var errorMessage: String = _
  @volatile var checksumVerified: Boolean = false

  /** "%.2f MB/s" with MB = 2^20 bytes; "N/A" when bytes or ms ≤ 0
    * (reference/model/CopyItemTask.java:20-27).
    */
  def speed: String =
    if (durationMs <= 0 || bytesCopied <= 0) "N/A"
    else {
      val mbPerSec = (bytesCopied / (1024.0 * 1024.0)) / (durationMs / 1000.0)
      f"$mbPerSec%.2f MB/s"
    }
}

/** Live mutable state of a whole request. */
final class CopyTaskState(
    val requestId: String,
    val namespace: String,
    val bandwidthMbPerSec: Option[Int],
    val items: Seq[CopyItemState]) {
  @volatile var status: CopyTaskStatus.Value = CopyTaskStatus.PENDING
  val createdAt: Instant = Instant.now()
  @volatile var completedAt: Instant = _
}

/** Point-in-time operational counters for the /metrics route: task and
  * item registries folded to counts-by-status, plus total bytes copied.
  */
final case class CopyMetricsSnapshot(
    tasksByStatus: Map[String, Long],
    itemsByStatus: Map[String, Long],
    bytesCopied: Long)

/** Distributed listing row: one file/dir under a copy root. */
final case class FileMeta(path: String, relPath: String, isDir: Boolean, length: Long)

/** Per-file result row coming back from executors. */
final case class FileCopyResult(
    relPath: String, bytes: Long, verified: Boolean,
    error: String) // null when ok
