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

  test("every query runs at sf0.001 and yields a readable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      withClue(name) {
        noException should be thrownBy fn(spark, sfDir).schema
      }
    }
  }
}
