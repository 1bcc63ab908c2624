package graft.sources

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Sources/sinks coverage (SURVEY.md §2 Part B "Sources / sinks"):
  * CSV/JSON/parquet round-trips (inferred + explicit schema), partitioned
  * writes with partition pruning on read-back, and the binaryFile scan
  * (the whole-file ingestion path the copy engine's verification uses).
  */
class FormatSpec extends SparkSpec {

  private def sample = Tables.lineitem(spark, sfDir)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate")
    .limit(500)

  test("csv round-trip preserves values (header + explicit schema read)") {
    val dir = tmpDir("csv").toString + "/data"
    val src = sample
    src.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(src.schema).csv(dir)
    back.count() shouldBe src.count()
    val a = src.agg(sum("l_quantity"), sum("l_orderkey")).collect()(0)
    val b = back.agg(sum("l_quantity"), sum("l_orderkey")).collect()(0)
    b shouldBe a
  }

  test("csv schema inference parses numerics and headers") {
    val dir = tmpDir("csv2").toString + "/data"
    sample.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").option("inferSchema", "true").csv(dir)
    back.schema("l_quantity").dataType.typeName shouldBe "double"
    back.schema("l_orderkey").dataType.typeName should (be("long") or be("integer"))
  }

  test("json round-trip preserves values") {
    val dir = tmpDir("json").toString + "/data"
    val src = sample
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    val a = src.agg(sum("l_quantity"), count(lit(1))).collect()(0)
    val b = back.agg(sum("l_quantity"), count(lit(1))).collect()(0)
    b shouldBe a
  }

  test("partitioned parquet write prunes partitions on filtered read") {
    val dir = tmpDir("part").toString + "/data"
    Tables.orders(spark, sfDir)
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("status") === "F")
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_orderstatus") === "F").count()
    back.count() shouldBe expected
    // partition pruning visible in the scan
    val scan = back.queryExecution.executedPlan.collectLeaves().mkString
    scan should include("PartitionFilters")
    scan should include("status")
  }

  test("binaryFile scan reads whole files with path+length+content, recursively") {
    val dir = tmpDir("bin")
    val sub = dir.resolve("a/b"); java.nio.file.Files.createDirectories(sub)
    val payload = Array.tabulate(10000)(i => (i % 251).toByte)
    java.nio.file.Files.write(sub.resolve("x.bin"), payload)
    java.nio.file.Files.write(dir.resolve("y.bin"), payload.take(100))

    val df = spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .load(dir.toString)
      .select(col("path"), col("length"), md5(col("content")).as("digest"))
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    rows.length shouldBe 2
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedDigest = md.digest(payload).map("%02x".format(_)).mkString
    rows.find(_._1.endsWith("x.bin")).get._2 shouldBe 10000L
    rows.find(_._1.endsWith("x.bin")).get._3 shouldBe expectedDigest
  }

  test("parquet write round-trip of a query result is value-identical") {
    val dir = tmpDir("pq").toString + "/data"
    val src = graft.SparkEntry.queries("q1_agg")(spark, sfDir)
    src.write.parquet(dir)
    val back = spark.read.parquet(dir)
      .orderBy("l_returnflag", "l_linestatus")
    back.collect() shouldBe src.collect()
  }

  test("schema evolution: mergeSchema reads old and new files under one union schema") {
    // a 100 TB corpus is written over months — late files grow columns;
    // readers must see one union schema with nulls for pre-evolution rows
    val sp = spark; import sp.implicits._
    val dir = tmpDir("evolve").toString + "/docs"
    Seq((1L, "a")).toDF("id", "txt")
      .write.mode("append").parquet(dir)
    Seq((2L, "b", 0.9)).toDF("id", "txt", "quality")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.schema.fieldNames.sorted shouldBe Array("id", "quality", "txt")
    val rows = merged.orderBy("id").collect()
      .map(r => (r.getLong(r.fieldIndex("id")),
        if (r.isNullAt(r.fieldIndex("quality"))) None
        else Some(r.getDouble(r.fieldIndex("quality")))))
    rows shouldBe Array((1L, None), (2L, Some(0.9)))
    // without mergeSchema the footer-sampled schema may drop the new
    // column — the option is the declared evolution contract
  }

  test("parquet compression codecs round-trip: zstd and snappy value-identical") {
    val sp = spark; import sp.implicits._
    val src = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("k", "s", "v")
    Seq("zstd", "snappy").foreach { codec =>
      val dir = tmpDir(s"codec_$codec").toString + "/data"
      src.write.option("compression", codec).parquet(dir)
      // codec is actually applied (file suffix carries it), values intact
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getName)
      files should not be empty
      files.foreach(_ should include(codec))
      spark.read.parquet(dir).orderBy("k").collect() shouldBe
        src.orderBy("k").collect()
    }
  }

  test("orc round-trip preserves values (q_orc_roundtrip underlying path)") {
    val sp = spark; import sp.implicits._
    val dir = tmpDir("orc").toString + "/data"
    val src = Seq((1L, 10.5, "F"), (2L, 20.25, "O"))
      .toDF("k", "price", "status")
    src.write.orc(dir)
    val back = spark.read.schema(src.schema).orc(dir).orderBy("k")
    back.collect() shouldBe src.orderBy("k").collect()
  }

  test("malformed JSON: PERMISSIVE quarantines rows, FAILFAST throws, DROPMALFORMED drops") {
    // 100 TB ingest reality: some records are garbage. The three declared
    // postures — quarantine (_corrupt_record column), hard-fail, silently
    // drop — must each behave as documented, or bad data either poisons
    // the table or vanishes without audit.
    val dir = tmpDir("badjson")
    java.nio.file.Files.write(dir.resolve("data.json"),
      """{"k": 1, "v": "ok"}
        |{not json at all
        |{"k": 3, "v": "fine"}
        |""".stripMargin.getBytes("UTF-8"))
    val path = dir.toString
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k LONG, v STRING, _corrupt_record STRING")

    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE").json(path)
      .cache() // corrupt-record queries need the full row materialized
    permissive.count() shouldBe 3
    val bad = permissive.filter(col("_corrupt_record").isNotNull).collect()
    bad.length shouldBe 1
    bad.head.getAs[String]("_corrupt_record") should include("not json")

    val dropped = spark.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL("k LONG, v STRING"))
      .option("mode", "DROPMALFORMED").json(path)
    dropped.count() shouldBe 2

    val e = intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(org.apache.spark.sql.types.StructType.fromDDL("k LONG, v STRING"))
        .option("mode", "FAILFAST").json(path).collect()
    }
    // Spark 4 wraps the parse error in FAILED_READ_FILE; the malformed-
    // record error is the cause
    (e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse(""))
      .toLowerCase should include("malformed")
    permissive.unpersist()
  }

  test("text source/sink: one line per row, round-trip preserves every line") {
    val dir = tmpDir("text").toString + "/data"
    val src = Tables.documents(spark, sfDir)
      .select(col("text"))
      // Hadoop's line reader splits on \n AND bare \r — both would turn
      // one row into two on read-back
      .filter(!col("text").contains("\n") && !col("text").contains("\r"))
    src.write.text(dir)
    val back = spark.read.text(dir) // single `value` column
    back.count() shouldBe src.count()
    val a = src.agg(sum(org.apache.spark.sql.functions.length(col("text"))), sum(crc32(col("text").cast("binary"))))
      .collect()(0)
    val b = back.agg(sum(org.apache.spark.sql.functions.length(col("value"))), sum(crc32(col("value").cast("binary"))))
      .collect()(0)
    b shouldBe a
  }

  test("jsonl export: one JSON object per line, lossless round-trip with schema") {
    // THE standard LLM training-data interchange format: each row is one
    // self-contained JSON object on its own line (spark.write.json IS
    // jsonl — the point of this case is to pin that shape).
    val dir = tmpDir("jsonl").toString + "/data"
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    src.write.json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    back.count() shouldBe src.count()
    back.except(src).count() shouldBe 0
    src.except(back).count() shouldBe 0
    // physical shape: every data line parses alone as a JSON object with
    // the expected keys (no wrapping array, no multi-line objects)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
    files should not be empty
    val lines = scala.io.Source.fromFile(files.head)(scala.io.Codec.UTF8)
      .getLines().take(5).toSeq
    lines should not be empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    lines.foreach { l =>
      val node = mapper.readTree(l)
      node.isObject shouldBe true
      node.has("doc_id") shouldBe true
      node.has("text") shouldBe true
    }
  }
}
