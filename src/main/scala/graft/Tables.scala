package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loader for the driver-generated TPC-H-ish parquet tables
  * (see /root/repo/TESTDATA.md + FIXTURES.md).
  *
  * All tables are read straight from parquet so Catalyst sees a real
  * `FileSourceScanExec` — predicate pushdown / column pruning apply (we
  * assert this in PlanSpec). At 100 TB these would be partitioned
  * directories; the loader takes a directory so the same code serves any
  * scale factor.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark only reads as a
    // raw Long (spark.sql.legacy.parquet.nanosAsLong — set in every session
    // we build). Normalize to TimestampType (µs, floor) right at the scan
    // so the whole engine sees one timestamp type.
    if (name == "events") normalizeNanosTs(df) else df
  }

  /** ns-Long `ts` → TimestampType (µs, floor). Shared by batch scans and
    * the streaming replay path so both bucket identically pre-epoch.
    */
  def normalizeNanosTs(df: DataFrame): DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      // floor division via pmod (plain `div` truncates toward zero, which
      // would round pre-epoch timestamps the wrong way)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
    else df

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
