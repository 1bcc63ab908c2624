package graft.copy

import graft.{SparkSpec, SparkTestSession, Tables}
import org.apache.spark.sql.functions._

/** Dynamic-partition backfill: only the patched partition is rewritten;
  * every other partition's files stay byte-identical on disk. Contrast
  * case pins WHY the operator exists: a static-mode overwrite of the
  * same patch truncates the whole table.
  */
class BackfillSpec extends SparkSpec {
  private val sp = SparkTestSession.spark

  private def dataFiles(dir: java.nio.file.Path): Map[String, (Long, Long)] = {
    val base = dir.toFile
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
      else Seq(f)
    walk(base)
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getAbsolutePath -> (f.length(), f.lastModified()))
      .toMap
  }

  test("backfill rewrites only the patched partition; others stay byte-identical") {
    val out = tmpDir("backfill")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("lang"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(out.toString)

    val langs = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).sorted
    langs.length should be > 1
    val target = langs.head

    val before = dataFiles(out)
    val untouchedBefore = before.filter(!_._1.contains(s"lang=$target"))

    // corrected rows for ONE partition: n_chars re-stamped
    val patch = docs.filter(col("lang") === target)
      .withColumn("n_chars", col("n_chars") + 1000000L)
    StructuredCopy.backfill(spark, out.toString, patch, Seq("lang"))

    // patched partition reflects the patch...
    val reread = spark.read.parquet(out.toString)
    reread.filter(col("lang") === target)
      .filter(col("n_chars") < 1000000L).count() shouldBe 0
    // ...row counts are preserved everywhere...
    reread.count() shouldBe docs.count()
    // ...and every OTHER partition's files are physically untouched
    // (same paths, sizes, mtimes — not merely equal contents)
    val after = dataFiles(out)
    val untouchedAfter = after.filter(!_._1.contains(s"lang=$target"))
    untouchedAfter shouldBe untouchedBefore
    // dynamic mode rides the per-write option — the session conf is
    // never touched (no leak to concurrent writers)
    sp.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      .getOrElse("STATIC").toUpperCase shouldBe "STATIC"
  }

  test("contrast: static-mode overwrite of the same patch truncates the whole table") {
    val out = tmpDir("backfill_static")
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), col("lang"))
    docs.write.mode("overwrite").partitionBy("lang").parquet(out.toString)
    val target = docs.select(col("lang")).distinct()
      .collect().map(_.getString(0)).min
    val patch = docs.filter(col("lang") === target)
    patch.write.mode("overwrite").partitionBy("lang").parquet(out.toString)
    // everything but the patched partition is GONE — the failure mode
    // backfill() exists to avoid
    spark.read.parquet(out.toString)
      .select(col("lang")).distinct().count() shouldBe 1
  }
}
