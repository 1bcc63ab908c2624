package graft.copy

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Request-body parsing parity: the reference's JSON shape and field names
  * (reference/model/CopyRequest.java:8-12, CopyItem.java:6-9); malformed
  * bodies surface as "Invalid request body" from the CLI
  * (reference/controller/GlobalExceptionHandler.java:16-27).
  */
class CopyMainSpec extends AnyFunSuite with Matchers {

  test("parses the reference's request body shape") {
    val req = CopyMain.parseRequest(
      """{"namespace":"prod","bandwidth":100,
         "items":[{"hdfsPath":"/a","localPath":"/b"},
                  {"hdfsPath":"/c","localPath":"/d"}]}""")
    req.namespace shouldBe "prod"
    req.bandwidthMbPerSec shouldBe Some(100)
    req.items shouldBe Seq(CopyItem("/a", "/b"), CopyItem("/c", "/d"))
  }

  test("null bandwidth and missing fields map to service-level validation") {
    val req = CopyMain.parseRequest("""{"namespace":"x","items":[]}""")
    req.bandwidthMbPerSec shouldBe None
    req.items shouldBe empty // service rejects with "items must not be empty"
    val req2 = CopyMain.parseRequest("""{"items":[{"hdfsPath":"/a","localPath":"/b"}]}""")
    req2.namespace shouldBe null // service rejects with "namespace is required"
  }

  test("non-integral bandwidth is a malformed body, not a silent zero") {
    an[Exception] should be thrownBy CopyMain.parseRequest(
      """{"namespace":"x","items":[{"hdfsPath":"/a","localPath":"/b"}],"bandwidth":"fast"}""")
    an[Exception] should be thrownBy CopyMain.parseRequest(
      """{"namespace":"x","items":[{"hdfsPath":"/a","localPath":"/b"}],"bandwidth":0.9}""")
  }

  test("malformed JSON throws (CLI maps it to Invalid request body)") {
    an[Exception] should be thrownBy CopyMain.parseRequest("{not json")
    an[Exception] should be thrownBy CopyMain.parseRequest("[1,2]")
  }
}
