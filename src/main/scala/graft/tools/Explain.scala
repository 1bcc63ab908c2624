package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for named queries (plan-review tool). */
object Explain {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n================ $n ================")
      try {
        val df = graft.SparkEntry.queries(n)(spark, d)
        // count exchanges + note plan shape
        val plan = df.queryExecution.executedPlan.toString
        val exchanges = "Exchange".r.findAllIn(plan).size
        println(s"-- exchanges: $exchanges")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          .linesIterator.take(60).mkString("\n"))
      } catch { case e: Exception => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
