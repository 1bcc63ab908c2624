package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltingSpec extends SparkSpec {

  test("salted two-phase aggregate equals the plain aggregate under heavy key skew") {
    val sp = spark; import sp.implicits._
    // 100k rows, 99% on one hot key
    val skewed = sp.range(100000)
      .select(
        when(col("id") % 100 =!= 0, "HOT").otherwise(concat(lit("k"), col("id"))).as("k"),
        (col("id") % 7).cast("double").as("v"))
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("sum"))
      .orderBy("k").collect()
    val salted = Salting.saltedCountSum(skewed, Seq("k"), "v", saltFactor = 16)
      .orderBy("k").collect()
    salted.length shouldBe plain.length
    salted.zip(plain).foreach { case (s, p) =>
      s.getString(0) shouldBe p.getString(0)
      s.getLong(1) shouldBe p.getLong(1)
      s.getDouble(2) shouldBe p.getDouble(2) +- 1e-6
    }
  }

  test("salted join equals the plain join under heavy key skew, spreads the hot key") {
    val sp = spark; import sp.implicits._
    // fact: 50k rows, 99% on one hot key; dim: 200 keys with payload
    val fact = sp.range(50000)
      .select(
        when(col("id") % 100 =!= 0, "HOT")
          .otherwise(concat(lit("k"), pmod(col("id"), lit(200)))).as("k"),
        col("id").as("fact_id"))
    val dim = sp.range(200)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("dim_v"))
      .union(sp.range(1).select(lit("HOT").as("k"), lit(-1L).as("dim_v")))
    val plain = fact.join(dim, Seq("k"), "inner")
      .agg(count(lit(1)).as("n"), sum("fact_id").as("s"), sum("dim_v").as("sv"))
      .collect().head
    val salted = Salting.saltedJoin(fact, dim, "k", saltFactor = 8)
      .agg(count(lit(1)).as("n"), sum("fact_id").as("s"), sum("dim_v").as("sv"))
      .collect().head
    salted.getLong(0) shouldBe plain.getLong(0)
    salted.getLong(1) shouldBe plain.getLong(1)
    salted.getLong(2) shouldBe plain.getLong(2)
    // the hot key's rows actually spread: >1 distinct salt on the left
    val nSalts = fact.withColumn("__salt",
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(8)).cast("int"))
      .filter(col("k") === "HOT").select("__salt").distinct().count()
    nSalts should be > 1L
  }
}
