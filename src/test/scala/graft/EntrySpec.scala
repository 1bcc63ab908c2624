package graft

/** The driver contract itself: entry() returns rows on sf0.001; every
  * query name has a builder; every oracle key refers to a real query.
  */
class EntrySpec extends SparkSpec {

  test("entry() flagship query returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("oracle keys are a subset of query names; no duplicate names") {
    val qnames = SparkEntry.queries.keySet
    SparkEntry.oracleSql.keySet.diff(qnames) shouldBe empty
    qnames.size should be >= 70
  }

  test("no oracle SQL carries a doubled backslash (escape-corruption guard)") {
    // A two-backslash run in the IN-MEMORY oracle string reaches DuckDB as
    // a literal backslash inside regex patterns, silently turning '\s+'
    // whitespace splits into match-nothing splits (the late-r9 incident:
    // an over-broad editor replace doubled four plain-string sites and the
    // shingle dedup oracles went empty). Plain """ strings must write \s;
    // s-interpolated ones write \\s (processed to \s). Either way the
    // runtime string must never hold two consecutive backslashes.
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(s"$name: ") { sql should not include "\\\\" }
    }
  }

  test("every query runs at sf0.001 and yields a readable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        noException should be thrownBy fn(spark, sfDir).schema
      }
    }
  }
}
