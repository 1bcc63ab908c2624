package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Properties of the Morton interleave itself (the layout effect is
  * covered in sources/LayoutSpec): the spread/interleave must be exactly
  * invertible — any dropped or colliding bit would silently merge
  * distinct (x, y) cells and break the per-file bounding rectangles the
  * layout promises.
  */
class ZOrderSpec extends SparkSpec {

  // reference de-interleave (inverse of the magic-mask spreading)
  private def unspread(z: Long): Long = {
    var x = z & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x >> 4)) & 0x00FF00FF00FF00FFL
    x = (x | (x >> 8)) & 0x0000FFFF0000FFFFL
    x = (x | (x >> 16)) & 0x00000000FFFFFFFFL
    x
  }

  test("zValue round-trips: de-interleaving recovers both coordinates exactly") {
    val sp = spark; import sp.implicits._
    // deterministic pseudo-random 31-bit coordinates incl. the edges
    val xs = (0 until 500).map(i =>
      (math.abs(i * 2654435761L) % 0x7FFFFFFFL,
        math.abs((i + 7) * 40503L * 65537L) % 0x7FFFFFFFL)) ++
      Seq((0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (0L, 0x7FFFFFFFL))
    val df = xs.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .collect()
    df.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      z should be >= 0L // never touches the sign bit
      unspread(z) shouldBe x
      unspread(z >> 1) shouldBe y
    }
  }

  private def unspread3(z: Long): Long = {
    var x = z & 0x1249249249249249L
    x = (x | (x >> 2)) & 0x10C30C30C30C30C3L
    x = (x | (x >> 4)) & 0x100F00F00F00F00FL
    x = (x | (x >> 8)) & 0x1F0000FF0000FFL
    x = (x | (x >> 16)) & 0x1F00000000FFFFL
    x = (x | (x >> 32)) & 0x1FFFFFL
    x
  }

  test("zValue3 round-trips all three 21-bit coordinates") {
    val sp = spark; import sp.implicits._
    val pts = (0 until 300).map(i =>
      (math.abs(i * 2654435761L) % 0x1FFFFFL,
        math.abs((i + 3) * 40503L) % 0x1FFFFFL,
        math.abs((i + 11) * 65537L) % 0x1FFFFFL)) ++
      Seq((0L, 0L, 0L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL))
    pts.toDF("x", "y", "zc")
      .withColumn("z", ZOrder.zValue3(col("x"), col("y"), col("zc")))
      .collect().foreach { r =>
        val (x, y, zc, z) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        z should be >= 0L
        unspread3(z) shouldBe x
        unspread3(z >> 1) shouldBe y
        unspread3(z >> 2) shouldBe zc
      }
  }

  test("z-order is monotone per dimension with the other fixed") {
    val sp = spark; import sp.implicits._
    // both lanes: the even-bit (x) lane and the odd-bit (y) lane have
    // independent mask paths — each must be monotone on its own
    val ys = (0L until 200L).map(y => (12345L, y))
    val zsY = ys.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .orderBy("y").collect().map(_.getLong(2))
    zsY.toSeq shouldBe zsY.sorted.toSeq
    val xs = (0L until 200L).map(x => (x, 54321L))
    val zsX = xs.toDF("x", "y")
      .withColumn("z", ZOrder.zValue(col("x"), col("y")))
      .orderBy("x").collect().map(_.getLong(2))
    zsX.toSeq shouldBe zsX.sorted.toSeq
  }
}
