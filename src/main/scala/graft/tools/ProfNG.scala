package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLongArray

/** Scratch stage-attribution profiler for the jaccard/containment
  * kernels (r20 working tool, not part of the driver contract): runs
  * each kernel phase in isolation and prints CPU/shuffle per phase.
  */
object ProfNG {
  private final class Tap extends SparkListener {
    val acc = new AtomicLongArray(3) // cpuNs, shrB, tasks
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        acc.addAndGet(0, m.executorCpuTime)
        acc.addAndGet(1, m.shuffleReadMetrics.totalBytesRead)
        acc.addAndGet(2, 1L)
      }
    }
    def snap() = (acc.get(0) / 1e9, acc.get(1) / 1e6, acc.get(2))
  }

  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.LogHygiene.suppressBoundedWindowWarn()
    val tap = new Tap
    spark.sparkContext.addSparkListener(tap)

    def phase[T](label: String)(f: => T): T = {
      val (c0, s0, t0) = tap.snap(); val w0 = System.nanoTime()
      val r = f
      Thread.sleep(300) // let task-end events drain
      val (c1, s1, t1) = tap.snap()
      println(f"[prof] $label%-28s wall ${(System.nanoTime() - w0) / 1e9}%6.2f  cpu ${c1 - c0}%6.2f  shr ${s1 - s0}%7.2f MB  tasks ${t1 - t0}%4d")
      r
    }

    import graft.functions.TextFunctions._
    val docs = graft.Tables.documents(spark, d)
      .select(col("doc_id"), array_distinct(wordShingles(col("text"), 3)).as("sh"))
    val tau = 0.8 - 0.0001

    val d0 = phase("d0 pin (shingles+ck)") {
      docs.filter(size(col("sh")) > 0)
        .select(col("doc_id"), col("sh"), size(col("sh")).as("n"),
          xxhash64(sort_array(col("sh"))).as("ckk"))
        .localCheckpoint()
    }
    val classes = phase("census agg+pin") {
      d0.select(col("doc_id"), col("ckk")).groupBy(col("ckk"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("m"))
        .localCheckpoint()
    }
    val dupExtra = phase("census scalar") {
      classes.agg(coalesce(sum(col("m")) - count(lit(1)), lit(0L)))
        .collect()(0).getLong(0)
    }
    println(s"[prof] dupExtra = $dupExtra")
    val dfreq = phase("dfreq agg+pin") {
      d0.select(explode(col("sh")).as("shingle"))
        .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
        .localCheckpoint()
    }
    val prefix = phase("prefix window+pin") {
      val wDoc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("df"), col("shingle"))
      d0.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
        .join(dfreq, "shingle")
        .withColumn("r", row_number().over(wDoc))
        .filter(col("r") <= ceil(lit(1.0 - tau) * col("n")) + 1)
        .select(col("shingle"), col("doc_id"), col("n"))
        .localCheckpoint()
    }
    val cand = phase("cand self-join+distinct") {
      val a = prefix.select(col("shingle"), col("doc_id").as("id_a"), col("n").as("n_a"))
      val b = prefix.select(col("shingle").as("sh_b"), col("doc_id").as("id_b"),
        col("n").as("n_b"))
      a.join(b,
          col("shingle") === col("sh_b") && col("id_a") < col("id_b") &&
            col("n_b") >= lit(tau) * col("n_a") - lit(1e-9) &&
            col("n_a") >= lit(tau) * col("n_b") - lit(1e-9))
        .select(col("id_a"), col("id_b")).distinct()
        .localCheckpoint()
    }
    println(s"[prof] candidates = ${cand.count()}")
    val dict = phase("dict pin") {
      dfreq.select(col("shingle"))
        .withColumn("tok", monotonically_increasing_id()).localCheckpoint()
    }
    val dIds = phase("encode corpus+pin") {
      d0.select(col("doc_id"), col("n"), explode(col("sh")).as("shingle"))
        .join(dict, "shingle")
        .groupBy(col("doc_id"))
        .agg(first(col("n")).as("n"), collect_list(col("tok")).as("ids"))
        .localCheckpoint()
    }
    phase("verify joins + count") {
      cand
        .join(dIds.select(col("doc_id").as("id_a"), col("ids").as("ids_a"),
          col("n").as("n_a")), "id_a")
        .join(dIds.select(col("doc_id").as("id_b"), col("ids").as("ids_b"),
          col("n").as("n_b")), "id_b")
        .withColumn("inter", size(array_intersect(col("ids_a"), col("ids_b"))))
        .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
        .withColumn("jaccard",
          round(col("inter").cast("double") / col("uni").cast("double"), 4))
        .filter(col("jaccard") >= 0.8)
        .count()
    }
    spark.stop()
  }
}
