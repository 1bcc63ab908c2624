package graft.copy

import org.apache.spark.sql.SparkSession

/** CLI surface for the copy engine — the analog of the reference's REST
  * API (submit → 202 id → poll → final task state), as a runnable main:
  *
  *   sbt "runMain graft.copy.CopyMain <src> <dest> [bandwidthMbPerSec]"
  *
  * Prints the submit id, then polls until the task finishes and prints the
  * per-item results exactly in the reference's status vocabulary.
  */
object CopyMain {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: CopyMain <src> <dest> [bandwidthMbPerSec]")
      sys.exit(2)
    }
    val bw = if (args.length > 2) Some(args(2).toInt) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .appName("graft-copy")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val svc = new CopyTaskService(new CopyEngine(spark),
      new FsFactory(sys.env.getOrElse("GRAFT_CONF_BASEDIR", "/etc/hadoop-namespaces")))
    svc.submit(CopyRequest("default", Seq(CopyItem(args(0), args(1))), bw)) match {
      case Left(err) =>
        println(s"""{"error":"$err"}""")
        sys.exit(1)
      case Right(id) =>
        println(s"""{"requestId":"$id"}""")
        var task = svc.getTask(id).get
        while (task.status == CopyTaskStatus.IN_PROGRESS ||
               task.status == CopyTaskStatus.PENDING) {
          Thread.sleep(100)
          task = svc.getTask(id).get
        }
        task.items.foreach { i =>
          println(s"""{"source":"${i.sourcePath}","dest":"${i.destPath}","status":"${i.status}",""" +
            s""""bytesCopied":${i.bytesCopied},"durationMs":${i.durationMs},""" +
            s""""speed":"${i.speed}","checksumVerified":${i.checksumVerified}""" +
            (if (i.errorMessage != null) s""","error":"${i.errorMessage}"""" else "") + "}")
        }
        println(s"""{"requestId":"$id","status":"${task.status}"}""")
        svc.shutdown()
        spark.stop()
        if (task.status != CopyTaskStatus.COMPLETED) sys.exit(1)
    }
  }
}
