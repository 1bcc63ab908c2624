package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

/** Property-style checks (deterministic seeded loops — the scalacheck
  * bridge isn't in the offline cache) for the round-2 native expressions:
  * NearestCell must agree with a plain Scala argmin on every vector, and
  * LshBuckets must satisfy the hyperplane-sign invariants.
  */
class NativeExprPropertySpec extends SparkSpec {

  private val rnd = new scala.util.Random(42)
  private def vec(dim: Int): Array[Float] =
    Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)

  test("NearestCell equals the brute-force argmin on random vectors") {
    val sp = spark; import sp.implicits._
    val dim = 16
    val cents = Array.tabulate(6)(i => (i, vec(dim)))
    val cn2s = cents.map { case (_, c) => c.map(x => x.toDouble * x).sum }
    val vs = (1 to 200).map(i => (i.toLong, vec(dim)))

    val df = vs.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
      .withColumn("cell", VectorFunctions.nearestCell(col("embedding"),
        cents.map(_._1), cents.map(_._2), cn2s))
    val got = df.orderBy("vec_id").collect().map(r => r.getInt(2))

    val want = vs.map { case (_, v) =>
      cents.indices.minBy { c =>
        val dot = v.zip(cents(c)._2).map { case (a, b) => a.toDouble * b.toDouble }.sum
        // strict < scan in ascending cell order = lowest cell on exact ties
        cn2s(c) - 2.0 * dot
      }
    }
    got.toSeq shouldBe want
  }

  test("LshBuckets invariants: range, determinism, sign-flip complement") {
    val sp = spark; import sp.implicits._
    val seeds = Seq(1, 2, 3, 4)
    val vs = (1 to 100).map(i => (i.toLong, vec(32)))
    val df = vs.toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .withColumn("b", VectorFunctions.lshBuckets(col("v"), 4, seeds))
      .withColumn("bneg", VectorFunctions.lshBuckets(
        transform(col("v"), x => -x), 4, seeds))
    val rows = df.orderBy("vec_id").collect()
      .map(r => (r.getSeq[Long](2), r.getSeq[Long](3)))
    rows.foreach { case (b, bneg) =>
      b.length shouldBe seeds.length
      all(b) should (be >= 0L and be < 16L)
      // proj(-v) = -proj(v): every strictly-nonzero plane's bit flips.
      // With continuous random data projs are never exactly 0, so the
      // negated vector's bucket is the bitwise complement in 4 bits.
      b.zip(bneg).foreach { case (x, y) => (x ^ y) shouldBe 15L }
    }
    // determinism: rebuilding yields identical buckets
    val again = vs.toDF("vec_id", "v")
      .withColumn("v", col("v").cast("array<float>"))
      .withColumn("b", VectorFunctions.lshBuckets(col("v"), 4, seeds))
      .orderBy("vec_id").collect().map(_.getSeq[Long](2))
    again.toSeq shouldBe rows.map(_._1).toSeq
  }
}
