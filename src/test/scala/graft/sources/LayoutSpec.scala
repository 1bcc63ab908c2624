package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Data-layout clustering for scan pruning — the storage-side half of the
  * 100 TB posture. `repartitionByRange` + `sortWithinPartitions` on the
  * filter column gives each parquet file a narrow min/max band, so
  * parquet row-group statistics pushdown skips whole files for range
  * predicates; a hash-shuffled layout puts every value range in every
  * file and nothing can be skipped. The spec measures both effects
  * directly: per-file range disjointness, and the scan's actual
  * numOutputRows metric under an identical filter.
  *
  * Clustering column: l_extendedprice (DOUBLE). The fixture's
  * l_shipdate is TIMESTAMP_NTZ, whose parquet stats pruning Spark does
  * not currently apply — a real layout would cluster on an epoch-long
  * or DATE column instead; the pruning MECHANISM under test is
  * type-agnostic.
  */
class LayoutSpec extends SparkSpec {

  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val resolved = plan.collectFirst {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    }.getOrElse(plan)
    val scans = resolved.collect { case f: FileSourceScanExec => f }
    scans should not be empty
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("range-clustered layout: disjoint per-file ranges, row-group skipping under a range filter") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
        col("l_extendedprice"))
    val dir = tmpDir("layout").toString
    li.repartitionByRange(4, col("l_extendedprice"))
      .sortWithinPartitions(col("l_extendedprice"))
      .write.mode("overwrite").parquet(s"$dir/clustered")
    li.repartition(4).write.mode("overwrite").parquet(s"$dir/shuffled")

    // 1. each clustered file covers a disjoint price band
    val files = new java.io.File(s"$dir/clustered").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).toSeq
    files.size should be > 1
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("l_extendedprice")).as("lo"),
          max(col("l_extendedprice")).as("hi"))
        .collect().head
      (r.getDouble(0), r.getDouble(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hiPrev), (loNext, _)) => loNext should be >= hiPrev
      case _ => ()
    }

    // 2. identical filter, measured at the scan: the clustered layout
    // reads a fraction of the rows; the shuffled layout reads everything
    // (every file's [min,max] spans the predicate, no row group prunes)
    val cutoff = li.stat.approxQuantile("l_extendedprice", Array(0.25), 0.01).head
    val total = li.count()
    val matching = li.filter(col("l_extendedprice") < cutoff).count()
    matching should be > 0L
    matching should be < total
    val clusteredRead = scanOutputRows(
      spark.read.parquet(s"$dir/clustered").filter(col("l_extendedprice") < cutoff))
    val shuffledRead = scanOutputRows(
      spark.read.parquet(s"$dir/shuffled").filter(col("l_extendedprice") < cutoff))
    shuffledRead shouldBe total
    clusteredRead should be < shuffledRead
    // a ~25th-percentile cutoff touches only the lowest band(s). Range
    // boundaries come from sampling (not exact quartiles) and the approx
    // cutoff has its own error, so allow one extra band: at least one of
    // the four bands must have been skipped outright
    clusteredRead should be <= (total * 3 / 4)
  }

  test("z-order layout: scans filtering on EITHER dimension skip files") {
    // Single-column range clustering prunes one dimension and destroys
    // the other; the Morton interleave bounds BOTH. 16 files over
    // (l_partkey, l_suppkey); a narrow filter on either key alone must
    // read strictly fewer rows than the full table — and the same filter
    // over a hash-shuffled layout must read everything.
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val dir = tmpDir("zorder").toString
    graft.operators.ZOrder
      .cluster(li, col("l_partkey"), col("l_suppkey"), 16)
      .write.mode("overwrite").parquet(s"$dir/z")
    li.repartition(16).write.mode("overwrite").parquet(s"$dir/shuffled")

    val total = li.count()
    val Row(pLo: Long, sLo: Long) = li
      .agg(min(col("l_partkey")), min(col("l_suppkey"))).collect().head
    // bottom ~1/8 of each key domain — a rectangle-edge predicate, the
    // z-curve's friendly case (what the layout exists to serve)
    val Row(pHi: Long, sHi: Long) = li
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).collect().head
    val pCut = pLo + (pHi - pLo) / 8
    val sCut = sLo + (sHi - sLo) / 8

    for ((cond, name) <- Seq(
        (col("l_partkey") <= pCut, "partkey"),
        (col("l_suppkey") <= sCut, "suppkey"))) {
      withClue(s"filter on $name: ") {
        val zRead = scanOutputRows(spark.read.parquet(s"$dir/z").filter(cond))
        val shufRead = scanOutputRows(
          spark.read.parquet(s"$dir/shuffled").filter(cond))
        shufRead shouldBe total // hash layout: no file can be skipped
        zRead should be < total // z layout: some files skipped outright
      }
    }
  }

  test("3-D z-order layout: scans filtering on ANY of three dimensions skip files") {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val dir = tmpDir("zorder3").toString
    graft.operators.ZOrder
      .cluster3(li, col("l_partkey"), col("l_suppkey"), col("l_orderkey"), 16)
      .write.mode("overwrite").parquet(s"$dir/z3")
    val total = li.count()
    for (name <- Seq("l_partkey", "l_suppkey", "l_orderkey")) {
      val Row(lo: Long, hi: Long) = li.agg(min(col(name)), max(col(name)))
        .collect().head
      val cut = lo + (hi - lo) / 8
      withClue(s"filter on $name: ") {
        scanOutputRows(spark.read.parquet(s"$dir/z3")
          .filter(col(name) <= cut)) should be < total
      }
    }
  }
}
