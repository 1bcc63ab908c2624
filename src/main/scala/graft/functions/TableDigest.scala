package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Order-insensitive table digest (SURVEY.md §2 Part B "Custom typed
  * UDAF"): XOR + sum of per-row 64-bit hashes over a canonical row
  * rendering. Commutative/associative merge → safe under partial
  * aggregation on any partitioning; two DataFrames with equal multisets of
  * rows digest identically regardless of row order or partition layout.
  * The (xor, sum, count) triple makes multiset differences (not just
  * symmetric ones) overwhelmingly likely to change the digest.
  */
object TableDigest {

  case class Buf(xorAcc: Long, sumAcc: Long, n: Long)

  val aggregator: Aggregator[String, Buf, String] =
    new Aggregator[String, Buf, String] {
      override def zero: Buf = Buf(0L, 0L, 0L)
      override def reduce(b: Buf, row: String): Buf = {
        val h = hash64(row)
        Buf(b.xorAcc ^ h, b.sumAcc + h, b.n + 1)
      }
      override def merge(a: Buf, b: Buf): Buf =
        Buf(a.xorAcc ^ b.xorAcc, a.sumAcc + b.sumAcc, a.n + b.n)
      override def finish(b: Buf): String =
        f"${b.xorAcc}%016x-${b.sumAcc}%016x-${b.n}%d"
      override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }

  private def hash64(s: String): Long = {
    // FNV-1a 64 over UTF-8 bytes: stateless, portable, well-mixed enough
    // for equality digests.
    var h = 0xcbf29ce484222325L
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xFFL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Column form: digest of a canonical string column. */
  def digest(canonicalRow: Column): Column = udaf(aggregator).apply(canonicalRow)
}
