package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The engine-wide deterministic key hash for sampling / splitting —
  * multiplicative hashing with the Knuth constant, reduced mod 1e9 BEFORE
  * the multiply so the product can never overflow Long (critical under
  * ANSI mode and for exact DuckDB parity; a raw key × 2654435761 blows
  * past 2^63 for keys ≥ ~3.5e9 — exactly the corpus sizes this exists
  * for).
  *
  * ONE definition on purpose: q_sample_stratified / q_sample_mixture /
  * q_sample_exact_k / q_split_train_test / q_oov_rate must all bucket
  * IDENTICALLY — a retuned hash in one place and not another silently
  * shifts the train/test partition (train/eval leakage with no failing
  * assertion). The SQL-literal equivalent the oracles use is
  * `((key % 1000000000) * 2654435761) % m`.
  */
object DeterministicHash {
  def keyHash(key: Column, m: Long): Column =
    pmod(pmod(key.cast("long"), lit(1000000000L)) * lit(2654435761L), lit(m))
}
