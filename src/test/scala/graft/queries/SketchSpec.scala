package graft.queries

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Pins q_sketch_hll: estimate accuracy vs exact distinct counts, and the
  * lossless-merge property that makes sketches THE 100 TB rollup shape —
  * union of per-group sketches must equal the sketch of the whole column
  * (register-wise max is associative), so any rollup is a merge, never a
  * rescan.
  */
class SketchSpec extends SparkSpec {

  test("hll estimates within 5% of exact; union-merge equals all-at-once") {
    val out = graft.SparkEntry.queries("q_sketch_hll")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.agg(countDistinct(col("l_partkey"))).head().getLong(0)

    exact.foreach { case (k, nd) =>
      math.abs(out(k) - nd).toDouble / nd should be < 0.05
    }
    math.abs(out("ALL") - exactAll).toDouble / exactAll should be < 0.05

    // merge losslessness: the unioned per-group sketches estimate exactly
    // what a single sketch over the whole column estimates
    val allAtOnce = li
      .agg(hll_sketch_estimate(hll_sketch_agg(col("l_partkey"), lit(12))))
      .head().getLong(0)
    out("ALL") shouldBe allAtOnce
  }

  test("cms: estimates bound by exact + eps*N; group merge equals whole-table sketch") {
    import org.apache.spark.util.sketch.CountMinSketch
    def parse(b: Array[Byte]) =
      CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b))
    val rows = graft.SparkEntry.queries("q_sketch_cms")(spark, sfDir)
      .collect().map(r => r.getString(0) -> parse(r.getAs[Array[Byte]](1)))
    rows should not be empty
    val li = Tables.lineitem(spark, sfDir)
    rows.foreach { case (flag, cms) =>
      val grp = li.filter(col("l_returnflag") === flag)
      val total = grp.count()
      val exact = grp.groupBy("l_partkey").count()
        .orderBy(col("count").desc).limit(5).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
      exact.foreach { case (k, n) =>
        val est = cms.estimateCount(k)
        withClue(s"$flag key $k: ") {
          est should be >= n // CMS never underestimates
          est should be <= n + math.ceil(0.001 * total).toLong * 2
        }
      }
    }
    // lossless merge: same seed + dims ⇒ merging the per-group sketches
    // reproduces the whole-table sketch's estimates exactly
    val merged = rows.map(_._2).reduce { (a, b) => a.mergeInPlace(b); a }
    val whole = parse(li
      .agg(count_min_sketch(col("l_partkey"), lit(0.001d), lit(0.99d),
        lit(42)).as("sk"))
      .collect().head.getAs[Array[Byte]](0))
    li.select("l_partkey").distinct().limit(20).collect().map(_.getLong(0))
      .foreach { k =>
        merged.estimateCount(k) shouldBe whole.estimateCount(k)
      }
  }

  test("kll quantile estimates have small normalized-rank error") {
    val est = graft.SparkEntry.queries("q_sketch_kll")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val li = Tables.lineitem(spark, sfDir)
    est.keySet should contain("ALL") // the kll_merge_agg rollup row
    est.foreach { case (flag, (p50, p95)) =>
      // "ALL" is the merged-sketch corpus estimate — rank it against the
      // whole table, pinning that the merge lost nothing
      val grp = if (flag == "ALL") li
        else li.filter(col("l_returnflag") === flag)
      val n = grp.count().toDouble
      val rank50 = grp.filter(col("l_extendedprice") <= p50).count() / n
      val rank95 = grp.filter(col("l_extendedprice") <= p95).count() / n
      rank50 shouldBe 0.5 +- 0.03
      rank95 shouldBe 0.95 +- 0.03
    }
  }
}
