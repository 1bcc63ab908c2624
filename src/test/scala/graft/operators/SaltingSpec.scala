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
}
