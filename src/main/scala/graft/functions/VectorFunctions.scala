package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, built from
  * Spark's codegen'd higher-order functions (`zip_with`/`aggregate`) — no
  * Scala UDFs, so the expressions stay inside whole-stage codegen and
  * columnar batches are never deserialized through an encoder.
  *
  * All arithmetic is in DOUBLE with a sequential left fold, which makes the
  * result bit-stable and comparable against DuckDB's list functions over a
  * DOUBLE[] cast (same fold order).
  */
object VectorFunctions {

  /** Sequential left-fold sum of an expression over zipped elements. */
  private def foldSum(zipped: Column): Column =
    aggregate(zipped, lit(0.0), (acc, x) => acc + x)

  /** Dot product via the native codegen'd expression (graft.plans
    * .FloatVecDot): identical semantics to the higher-order fold
    * (sequential double sum), ~100× less per-pair overhead inside
    * all-pairs similarity joins.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.FloatVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  def normSq(a: Column): Column = dot(a, a)

  /** Map-side nearest-centroid argmin over a driver-collected matrix
    * (graft.plans.NearestCell) — zero-shuffle IVF cell assignment.
    */
  def nearestCell(vec: Column, cells: Array[Int],
      cvecs: Array[Array[Float]], cn2s: Array[Double]): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.NearestCell(
      ColumnBridge.expression(vec), cells, cvecs, cn2s))
  }

  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity; 0.0 when either vector has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d  = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0.0, 0.0).otherwise(d / nn)
  }

  def euclideanSq(a: Column, b: Column): Column =
    foldSum(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double")
      diff * diff
    }))

  /** Deterministic random-hyperplane (SimHash-style) LSH bucket id for a
    * vector: `nBits` pseudo-random hyperplanes derived from xxhash64 of
    * (seed, planeIdx, dimIdx); bucket bit b = sign(dot(v, plane_b)).
    * Hyperplane components are in {-1, +1} (a Rademacher projection), which
    * is a valid random-projection family and needs no stored plane matrix —
    * crucial at 100 TB where the planes must be recomputable on every
    * executor without a broadcast.
    */
  def lshBucket(vec: Column, nBits: Int, seed: Int): Column = {
    // For each bit: fold over the vector with position, sign from xxhash64.
    val bits = (0 until nBits).map { b =>
      // aggregate over zipped (value, index)
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) => {
          val h = xxhash64(lit(seed), lit(b), i)
          when(pmod(h, lit(2)) === 0, x.cast("double")).otherwise(-x.cast("double"))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0.0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
