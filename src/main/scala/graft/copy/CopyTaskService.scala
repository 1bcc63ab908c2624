package graft.copy

import java.io.IOException
import java.time.Instant
import java.util.UUID
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}

/** Driver-side copy-job orchestration: submit → async fan-out per item →
  * fan-in status fold (reference/service/CopyTaskService.java:35-127
  * semantics, kept exactly — per-item failure isolation, immediate
  * IN_PROGRESS on submit, COMPLETED / PARTIALLY_FAILED / FAILED fold,
  * wall-clock + bytes + derived speed per item).
  *
  * Architectural difference: each item's copy is a Spark job (CopyEngine
  * fans one directory across all executor slots), so the thread pool here
  * only bounds how many Spark jobs run concurrently — not the copy
  * parallelism itself. Validation lives here (the reference validates in
  * its REST controller, CopyController.java:21-33): submit returns
  * Left(message) with the controller's exact strings; getTask returns
  * None for unknown ids (the 404 analog).
  */
final class CopyTaskService(
    engine: CopyEngine,
    fsFactory: FsFactory,
    threadPoolSize: Int = 10) extends CopyApi {

  private val tasks = new ConcurrentHashMap[String, CopyTaskState]()
  private val pool = Executors.newFixedThreadPool(threadPoolSize)
  // graft_copy_bytes_total is a Prometheus COUNTER: it must be monotonic
  // for the service's lifetime. Accumulated here at item completion
  // instead of being re-summed from the task registry, so a future
  // registry eviction/retention policy cannot make the exposed value
  // regress (scrapers would interpret the drop as a process restart).
  private val bytesTotal = new java.util.concurrent.atomic.LongAdder()

  /** A17 submit. Validation errors use the reference's strings. */
  def submit(request: CopyRequest): Either[String, String] = {
    if (request.namespace == null || request.namespace.isBlank)
      return Left("namespace is required")
    if (request.items == null || request.items.isEmpty)
      return Left("items must not be empty")
    if (request.bandwidthMbPerSec.exists(_ <= 0))
      return Left("bandwidth must be positive")

    val requestId = UUID.randomUUID().toString
    val itemStates = request.items.map(i => new CopyItemState(i.sourcePath, i.destPath))
    val task = new CopyTaskState(requestId, request.namespace,
      request.bandwidthMbPerSec, itemStates)
    tasks.put(requestId, task)
    executeTask(task)
    Right(requestId)
  }

  /** A18 status poll: live snapshot, possibly mid-flight. */
  def getTask(requestId: String): Option[CopyTaskState] =
    Option(tasks.get(requestId))

  /** Task registry folded to counts-by-status (the /health payload). */
  override def statusCounts: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    tasks.values.asScala.toSeq
      .groupBy(_.status.toString).view.mapValues(_.size.toLong).toMap
  }

  /** One registry walk → /metrics counters. Volatile item fields make the
    * snapshot torn-free per field; cross-field consistency is not claimed
    * (same live-poll semantics as A18 status reads).
    */
  override def metricsSnapshot: CopyMetricsSnapshot = {
    import scala.jdk.CollectionConverters._
    val ts = tasks.values.asScala.toSeq
    val items = ts.flatMap(_.items)
    CopyMetricsSnapshot(
      ts.groupBy(_.status.toString).view.mapValues(_.size.toLong).toMap,
      items.groupBy(_.status.toString).view.mapValues(_.size.toLong).toMap,
      bytesTotal.sum())
  }

  private def executeTask(task: CopyTaskState): Unit = {
    task.status = CopyTaskStatus.IN_PROGRESS // synchronous, before return
    val latch = new CountDownLatch(task.items.size)
    task.items.foreach { item =>
      pool.execute(() => {
        try executeItemCopy(task.namespace, task.bandwidthMbPerSec, item)
        finally latch.countDown()
      })
    }
    pool.execute(() => {
      try {
        latch.await()
        finalizeTask(task)
      } catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          task.status = CopyTaskStatus.FAILED
          task.completedAt = Instant.now()
      }
    })
  }

  private def executeItemCopy(namespace: String, bw: Option[Int],
      item: CopyItemState): Unit = {
    item.status = CopyItemStatus.IN_PROGRESS
    val start = System.currentTimeMillis()
    try {
      val conf = fsFactory.configuration(namespace)
      val result = engine.copyPath(conf, item.sourcePath, item.destPath, bw)
      item.bytesCopied = result.bytesCopied
      bytesTotal.add(result.bytesCopied)
      item.checksumVerified = result.checksumVerified
      item.durationMs = System.currentTimeMillis() - start
      item.status = CopyItemStatus.COMPLETED
    } catch {
      case e: Exception =>
        item.durationMs = System.currentTimeMillis() - start
        item.status = CopyItemStatus.FAILED
        item.errorMessage = if (e.getMessage != null) e.getMessage else e.toString
    }
  }

  /** A13/A14 fan-in: fold item statuses into the task status. */
  private def finalizeTask(task: CopyTaskState): Unit = {
    val completed = task.items.count(_.status == CopyItemStatus.COMPLETED)
    val failed = task.items.count(_.status == CopyItemStatus.FAILED)
    task.status =
      if (failed == 0) CopyTaskStatus.COMPLETED
      else if (completed == 0) CopyTaskStatus.FAILED
      else CopyTaskStatus.PARTIALLY_FAILED
    task.completedAt = Instant.now()
  }

  def shutdown(): Unit = {
    pool.shutdown()
    pool.awaitTermination(30, TimeUnit.SECONDS)
  }
}
