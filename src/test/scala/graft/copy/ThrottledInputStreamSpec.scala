package graft.copy

import java.io.{ByteArrayInputStream, IOException}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Ports the reference throttle suite
  * (reference/service/ThrottledInputStreamTest.java:14-129).
  */
class ThrottledInputStreamSpec extends AnyFunSuite with Matchers {

  private def data(n: Int): Array[Byte] = Array.tabulate(n)(i => (i % 251).toByte)

  test("constructor rejects non-positive rates") {
    val in = new ByteArrayInputStream(Array[Byte](1, 2, 3))
    an[IllegalArgumentException] should be thrownBy new ThrottledInputStream(in, 0)
    an[IllegalArgumentException] should be thrownBy new ThrottledInputStream(in, -5)
  }

  test("bytes pass through unmodified") {
    val payload = data(10000)
    val t = new ThrottledInputStream(new ByteArrayInputStream(payload), 1000000)
    val out = t.readAllBytes()
    out shouldBe payload
  }

  test("single-byte reads pass through unmodified") {
    val payload = data(100)
    val t = new ThrottledInputStream(new ByteArrayInputStream(payload), 1000000)
    val out = Iterator.continually(t.read()).takeWhile(_ != -1)
      .map(_.toByte).toArray
    out shouldBe payload
  }

  test("200 bytes at 100 B/s takes more than 500 ms") {
    val t = new ThrottledInputStream(new ByteArrayInputStream(data(200)), 100)
    val t0 = System.nanoTime()
    t.readAllBytes()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    elapsedMs should be > 500L
  }

  test("small read far below the rate is fast") {
    val t = new ThrottledInputStream(
      new ByteArrayInputStream(data(1024)), 10L * 1024 * 1024)
    val t0 = System.nanoTime()
    t.readAllBytes()
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    elapsedMs should be < 500L
  }

  test("interrupt during throttle surfaces as IOException") {
    val t = new ThrottledInputStream(new ByteArrayInputStream(data(5000)), 100)
    @volatile var caught: Throwable = null
    val worker = new Thread(() => {
      try t.readAllBytes()
      catch { case e: Throwable => caught = e }
    })
    worker.start()
    Thread.sleep(200)
    worker.interrupt()
    worker.join(5000)
    caught shouldBe an[IOException]
    caught.getMessage shouldBe "Throttled read interrupted"
  }
}
