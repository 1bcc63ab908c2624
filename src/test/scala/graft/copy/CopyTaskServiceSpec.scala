package graft.copy

import java.nio.file.Files
import org.scalatest.concurrent.Eventually
import org.scalatest.time.{Millis, Seconds, Span}
import graft.SparkSpec

/** Ports the reference task-orchestration suite
  * (reference/service/CopyTaskServiceTest.java:46-218): submit/registry,
  * status folds, per-item isolation, parallelism, immediate IN_PROGRESS,
  * bandwidth plumb-through — plus the controller's validation strings
  * (reference/controller/CopyControllerTest.java:48-113).
  */
class CopyTaskServiceSpec extends SparkSpec with Eventually {

  implicit override val patienceConfig: PatienceConfig =
    PatienceConfig(timeout = Span(60, Seconds), interval = Span(100, Millis))

  private def fsFactory = new FsFactory("/nonexistent-conf-dir")
  private def newService() = new CopyTaskService(new CopyEngine(spark), fsFactory)

  private def mkFile(n: Int): (java.nio.file.Path, Array[Byte]) = {
    val dir = tmpDir("src")
    val payload = Array.tabulate(n)(i => (i % 251).toByte)
    val p = dir.resolve("f.bin"); Files.write(p, payload); (p, payload)
  }

  test("submit validates namespace / items / bandwidth with exact messages") {
    val svc = newService()
    svc.submit(CopyRequest(null, Seq(CopyItem("a", "b")))) shouldBe Left("namespace is required")
    svc.submit(CopyRequest("  ", Seq(CopyItem("a", "b")))) shouldBe Left("namespace is required")
    svc.submit(CopyRequest("ns", Nil)) shouldBe Left("items must not be empty")
    svc.submit(CopyRequest("ns", Seq(CopyItem("a", "b")), Some(0))) shouldBe Left("bandwidth must be positive")
    svc.submit(CopyRequest("ns", Seq(CopyItem("a", "b")), Some(-3))) shouldBe Left("bandwidth must be positive")
  }

  test("submit returns an id, registers the task, status immediately IN_PROGRESS or done") {
    val svc = newService()
    val (src, _) = mkFile(100)
    val dst = tmpDir("dst").resolve("f.bin")
    val Right(id) = svc.submit(CopyRequest("ns", Seq(CopyItem(src.toString, dst.toString))))
    id should not be empty
    val task = svc.getTask(id).get
    Set(CopyTaskStatus.IN_PROGRESS, CopyTaskStatus.COMPLETED) should contain(task.status)
  }

  test("successful item → COMPLETED with bytes, checksum, duration, speed") {
    val svc = newService()
    val (src, payload) = mkFile(500000)
    val dst = tmpDir("dst").resolve("f.bin")
    val Right(id) = svc.submit(CopyRequest("ns", Seq(CopyItem(src.toString, dst.toString))))
    eventually { svc.getTask(id).get.status shouldBe CopyTaskStatus.COMPLETED }
    val item = svc.getTask(id).get.items.head
    item.status shouldBe CopyItemStatus.COMPLETED
    item.bytesCopied shouldBe payload.length
    item.checksumVerified shouldBe true
    item.errorMessage shouldBe null
    svc.getTask(id).get.completedAt should not be null
  }

  test("failing item → FAILED with the engine's error message") {
    val svc = newService()
    val missing = tmpDir("src").resolve("missing.bin")
    val dst = tmpDir("dst").resolve("f.bin")
    val Right(id) = svc.submit(CopyRequest("ns", Seq(CopyItem(missing.toString, dst.toString))))
    eventually { svc.getTask(id).get.status shouldBe CopyTaskStatus.FAILED }
    val item = svc.getTask(id).get.items.head
    item.status shouldBe CopyItemStatus.FAILED
    item.errorMessage shouldBe s"Source path does not exist: $missing"
  }

  test("mixed outcomes → PARTIALLY_FAILED, failures isolated per item") {
    val svc = newService()
    val (src, _) = mkFile(1000)
    val missing = tmpDir("src").resolve("missing.bin")
    val dstDir = tmpDir("dst")
    val Right(id) = svc.submit(CopyRequest("ns", Seq(
      CopyItem(src.toString, dstDir.resolve("ok.bin").toString),
      CopyItem(missing.toString, dstDir.resolve("bad.bin").toString))))
    eventually { svc.getTask(id).get.status shouldBe CopyTaskStatus.PARTIALLY_FAILED }
    val items = svc.getTask(id).get.items
    items.map(_.status).toSet shouldBe Set(CopyItemStatus.COMPLETED, CopyItemStatus.FAILED)
  }

  test("multiple items complete and all bytes land") {
    val svc = newService()
    val dstDir = tmpDir("dst")
    val items = (1 to 3).map { i =>
      val (src, _) = mkFile(1000 * i)
      CopyItem(src.toString, dstDir.resolve(s"f$i.bin").toString)
    }
    val Right(id) = svc.submit(CopyRequest("ns", items))
    eventually { svc.getTask(id).get.status shouldBe CopyTaskStatus.COMPLETED }
    svc.getTask(id).get.items.map(_.bytesCopied).sorted shouldBe Seq(1000L, 2000L, 3000L)
  }

  test("unknown request id → None") {
    newService().getTask("no-such-id") shouldBe None
  }

  test("bandwidth is plumbed through to the copy (throttled item is slow)") {
    val svc = newService()
    val dir = tmpDir("src")
    val payload = Array.tabulate(2 * 1024 * 1024)(i => (i % 251).toByte)
    val src = dir.resolve("big.bin"); Files.write(src, payload)
    val dst = tmpDir("dst").resolve("big.bin")
    val t0 = System.currentTimeMillis()
    val Right(id) = svc.submit(CopyRequest("ns",
      Seq(CopyItem(src.toString, dst.toString)), Some(1)))
    eventually { svc.getTask(id).get.status shouldBe CopyTaskStatus.COMPLETED }
    val item = svc.getTask(id).get.items.head
    (System.currentTimeMillis() - t0) should be > 900L
    item.bytesCopied shouldBe payload.length
    item.durationMs should be > 900L
    item.speed should endWith("MB/s")
  }

  test("speed formatting matches the reference (10 MiB in 1 s → 10.00 MB/s; N/A edges)") {
    val item = new CopyItemState("s", "d")
    item.bytesCopied = 10L * 1024 * 1024; item.durationMs = 1000
    item.speed shouldBe "10.00 MB/s"
    item.durationMs = 0
    item.speed shouldBe "N/A"
    item.durationMs = 1000; item.bytesCopied = 0
    item.speed shouldBe "N/A"
  }
}
