package graft.tools

import org.apache.spark.sql.SparkSession

/** Write FULL `.explain("formatted")` output for named queries to
  * `plans/<round>/<query>_<suffix>.txt` — the optimization-round evidence
  * files (the judge checks plan claims against these, so unlike the
  * console `Explain` tool nothing is truncated). Env:
  *   SPARK_GRAFT_SF_DIR   fixture (default sf0.1 — the bench fixture, so
  *                        AQE/broadcast decisions match the bench's)
  *   SPARK_GRAFT_PLAN_DIR output dir (default plans/r19)
  *   SPARK_GRAFT_PLAN_SUFFIX  file suffix (default "before")
  * Args: query names (required — plans are captured per touched query).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r19")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    args.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val exchanges = "Exchange".r.findAllIn(
          df.queryExecution.executedPlan.toString).size
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
          (s"-- $n @ $d (local[$cpus])  exchanges=$exchanges\n" + plan)
            .getBytes("UTF-8"))
        println(s"wrote $outDir/${n}_$suffix.txt (exchanges=$exchanges)")
      } catch {
        case e: Exception => println(s"ERROR $n: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
