package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Learned quality gate — the fastText-style classifier that sits next
  * to the heuristic filters (`q_quality_score` / `q_quality_filter`) in
  * a standard curation stack: hashed char-n-gram features → weight
  * vector → logistic score, thresholded into keep/drop.
  *
  * The SCORING operator is the engine surface (plans.HashedNgramLogit —
  * exact fixed-point arithmetic so DuckDB replays the dot product
  * bit-for-bit); TRAINING happens offline, as with any production
  * classifier. The pinned weight fixture here stands in for a trained
  * artifact: a deterministic Knuth-multiplicative spread over the
  * buckets, reproducible in SQL, so the whole inference path — hashing,
  * lookup, sum, threshold — is oracle-checkable end to end. Swapping in
  * real trained weights is a constructor argument.
  */
object QualityClassifier {

  /** Feature space: char trigrams into 256 hashed buckets. */
  val N = 3
  val Dim = 256

  /** Fixed-point scale for weights and thresholds (3 decimals). */
  val Scale = 1000L

  /** Mean-logit keep threshold, fixed-point: score ≥ 0.05. */
  val TauNum = 50L // τ·Scale

  /** The pinned weight fixture: w(j) = ((j·2654435761) mod 2003) − 1001,
    * fixed-point in [−1.001, 1.001]. Knuth's multiplicative constant
    * gives a sign-balanced spread; the formula IS the fixture (the spec
    * pins its digest, the DuckDB oracle recomputes it inline).
    */
  def pinnedWeights(dim: Int = Dim): Array[Long] =
    Array.tabulate(dim)(j => (j.toLong * 2654435761L) % 2003L - 1001L)

  /** struct(n_grams, logit) for `text` (caller lowercases). */
  def ngramLogit(text: Column, weights: Array[Long] = pinnedWeights()): Column =
    ColumnBridge.column(graft.plans.HashedNgramLogit(
      ColumnBridge.expression(text), N, weights.length, weights))

  /** Mean-logit score in [−1.001, 1.001] at 4-decimal precision,
    * computed ENTIRELY in integer arithmetic (half-up on the magnitude):
    * score·10⁴ = sign · ⌊(|logit|·10⁴ + 500·n) / (1000·n)⌋, then one
    * exact division by 10⁴. The earlier round(double/double, 4) form
    * was believed engine-deterministic; the sf1 value leg caught a doc
    * whose quotient sat on a .00005 boundary where Spark's HALF_UP and
    * DuckDB's round split by one ulp of output (SCALE.md §sf1-oracle
    * convention: money/score arithmetic goes exact, not rounded). All
    * intermediates stay < 2⁵³ even at book-length documents, so the
    * long→double passage is lossless.
    */
  def score(nGrams: Column, logit: Column): Column = {
    val n = greatest(nGrams, lit(1L))
    val d = lit(1000L) * n
    val mag = abs(logit) * lit(10000L) + lit(500L) * n
    val se4 = ((mag - pmod(mag, d)) / d).cast("long")
    (when(logit < 0, -se4).otherwise(se4)).cast("double") / lit(10000.0)
  }

  /** Keep decision at τ = TauNum/Scale, in EXACT integer arithmetic
    * (cross-multiplied, no float compare): n_grams > 0 ∧
    * logit·Scale ≥ τ·Scale·n_grams·Scale ⇔ logit·(Scale/TauNum…) —
    * concretely logit·Scale ≥ TauNum·n_grams·Scale/… reduced to
    * logit · (Scale/gcd) ≥ … ; with Scale=1000, τnum=50:
    * logit·20 ≥ n_grams·1000.
    */
  def pass(nGrams: Column, logit: Column): Column =
    nGrams > 0 && logit * lit(Scale / TauNum) >= nGrams * lit(Scale)
}
