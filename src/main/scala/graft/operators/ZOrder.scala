package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-dimensional layout clustering — the
  * storage-layout primitive for 2-D data skipping at 100 TB. Range
  * clustering on ONE column (LayoutSpec's first half) prunes scans that
  * filter on that column and nothing else; interleaving the bits of TWO
  * columns and range-partitioning on the interleave gives every output
  * file a bounded range on BOTH dimensions, so parquet min/max stats can
  * skip files for predicates on either column.
  *
  * The bit interleave is the standard magic-mask Morton spreading,
  * composed entirely from codegen'd bit built-ins (`&`, `|`,
  * `shiftleft`) — no UDF, stays inside whole-stage codegen, and the same
  * mask arithmetic is expressible in ANSI SQL for the DuckDB oracle.
  */
object ZOrder {

  // Each step doubles the gap between populated bits:
  // (x | x << s) & mask, for s = 16, 8, 4, 2, 1.
  private val steps: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 31 bits of a non-negative long onto the even bit
    * positions 0,2,…,60. 31 bits (not 32) so the odd-shifted second
    * dimension tops out at bit 61 and the z-value can never touch the
    * sign bit — a negative z would invert the range ordering.
    */
  def spread31(c: Column): Column =
    steps.foldLeft(c.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (acc, (sh, m)) => acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** Morton interleave of two non-negative integer columns: x on even
    * bits, y on odd bits. Nearby (x, y) points get nearby z-values.
    */
  def zValue(x: Column, y: Column): Column =
    spread31(x).bitwiseOR(shiftleft(spread31(y), 1))

  // 3-D spreading: bits land 3 apart (21 bits per dimension, top bit 62
  // — still sign-safe)
  private val steps3: Seq[(Int, Long)] = Seq(
    32 -> 0x1F00000000FFFFL,
    16 -> 0x1F0000FF0000FFL,
    8 -> 0x100F00F00F00F00FL,
    4 -> 0x10C30C30C30C30C3L,
    2 -> 0x1249249249249249L)

  /** Spread the low 21 bits so consecutive bits land 3 apart. */
  def spread21(c: Column): Column =
    steps3.foldLeft(c.cast("long").bitwiseAND(lit(0x1FFFFFL))) {
      case (acc, (sh, m)) => acc.bitwiseOR(shiftleft(acc, sh)).bitwiseAND(lit(m))
    }

  /** Three-dimensional Morton interleave (21 bits per dimension) — the
    * same either-dimension pruning argument extends to any filtered
    * subset of the three clustering columns.
    */
  def zValue3(x: Column, y: Column, z: Column): Column =
    spread21(x)
      .bitwiseOR(shiftleft(spread21(y), 1))
      .bitwiseOR(shiftleft(spread21(z), 2))

  /** Write-side clustering: range-partition into `numFiles` buckets on
    * the z-value and sort within each, so every output file covers a
    * contiguous z-range = a bounded rectangle (union of a few rectangles)
    * in (x, y) space. One shuffle, same cost shape as any clustered
    * write; the scan-side pruning it buys is asserted in LayoutSpec.
    *
    * Dimensions are min/max-normalized to 15 bits each BEFORE the
    * interleave: raw interleaving lets the wider-domain column dominate
    * the curve (a 4-bit suppkey against an 8-bit partkey leaves every
    * file spanning the whole suppkey domain — observed, not
    * hypothetical), exactly why production z-order implementations
    * bucket each column to equal width first. The bounds come from one
    * tiny stats agg (4 longs to the driver — the same stats pass any
    * layout optimizer runs).
    */
  // one stats agg for all dimensions: 2·dims longs to the driver
  private def bounds(df: DataFrame, cols: Seq[Column]): Seq[(Long, Long)] = {
    val aggs = cols.flatMap(c => Seq(min(c.cast("long")), max(c.cast("long"))))
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    cols.indices.map(i => (row.getLong(2 * i), row.getLong(2 * i + 1)))
  }

  private def scale(c: Column, b: (Long, Long)): Column =
    floor((c.cast("long") - lit(b._1)).cast("double") * 32767.0 /
      math.max(1L, b._2 - b._1)).cast("long")

  def cluster(df: DataFrame, x: Column, y: Column, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val Seq(bx, by) = bounds(df, Seq(x, y))
    df.withColumn("__z", zValue(scale(x, bx), scale(y, by)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Three-column clustering — same normalization and write shape as the
    * 2-D form over the 3-D interleave; a filter on ANY of the three
    * columns can skip files.
    */
  def cluster3(df: DataFrame, x: Column, y: Column, z: Column,
      numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    val Seq(bx, by, bz) = bounds(df, Seq(x, y, z))
    df.withColumn("__z",
        zValue3(scale(x, bx), scale(y, by), scale(z, bz)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
