package graft.copy

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-style pins (SURVEY.md §5.2 #4): the A14 status fold over all
  * item-status multisets (exhaustive on a bounded domain), and the A15
  * speed formula edges (ScalaCheck-sampled — the scalatest/scalacheck
  * bridge artifact isn't in the offline cache, so we sample Gen directly).
  */
class PropertySpec extends AnyFunSuite with Matchers {

  private def foldStatus(completed: Int, failed: Int): CopyTaskStatus.Value =
    if (failed == 0) CopyTaskStatus.COMPLETED
    else if (completed == 0) CopyTaskStatus.FAILED
    else CopyTaskStatus.PARTIALLY_FAILED

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("status fold: reference semantics hold for every outcome multiset (exhaustive 0..50)") {
    for (c <- 0 to 50; f <- 0 to 50 if c + f > 0) {
      val s = foldStatus(c, f)
      withClue(s"c=$c f=$f") {
        if (f == 0) s shouldBe CopyTaskStatus.COMPLETED
        else if (c == 0) s shouldBe CopyTaskStatus.FAILED
        else s shouldBe CopyTaskStatus.PARTIALLY_FAILED
      }
    }
  }

  test("speed formula: N/A iff bytes<=0 or ms<=0; otherwise positive MB/s") {
    val gen = for {
      bytes <- Gen.choose(-10L, 10000000L)
      ms <- Gen.choose(-10L, 100000L)
    } yield (bytes, ms)
    val cases = samples(gen, 500) ++ Seq((0L, 100L), (100L, 0L), (-1L, -1L),
      (10L * 1024 * 1024, 1000L))
    cases.foreach { case (bytes, ms) =>
      val item = new CopyItemState("s", "d")
      item.bytesCopied = bytes; item.durationMs = ms
      withClue(s"bytes=$bytes ms=$ms") {
        if (bytes <= 0 || ms <= 0) item.speed shouldBe "N/A"
        else {
          item.speed should endWith(" MB/s")
          item.speed.stripSuffix(" MB/s").toDouble should be >= 0.0
        }
      }
    }
  }

  test("fingerprints stay in [0, 2^31) for arbitrary token streams") {
    val sp = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val texts = samples(Gen.listOfN(20, Gen.alphaNumStr).map(_.mkString(" ")), 50)
    val df = sp.createDataset(texts)(org.apache.spark.sql.Encoders.STRING).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val fps = df.collect().map(_.getLong(0))
    all(fps) should (be >= 0L and be < 2147483647L)
  }
}
