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

  test("salted join plan: right side replicates saltFactor x and the join " +
      "rides (key, salt)") {
    val sp = spark; import sp.implicits._
    // k must be non-constant: a literal key would constant-fold the
    // k = k conjunct out of the optimized join condition
    val fact = sp.range(1000)
      .select(when(col("id") % 10 =!= 0, "HOT")
        .otherwise(concat(lit("k"), pmod(col("id"), lit(10)))).as("k"),
        col("id").as("fact_id"))
    val dim = sp.range(10)
      .select(concat(lit("k"), col("id")).as("k"), col("id").as("dim_v"))
      .union(sp.range(1).select(lit("HOT").as("k"), lit(-1L).as("dim_v")))
    val sj = Salting.saltedJoin(fact, dim, "k", saltFactor = 8)
    // plan shape: the right side carries an explode (Generate) that
    // replicates each dim row saltFactor times, and the equi-join keys
    // include the salt — the hot key's rows hash to 8 reducers, not 1
    val optimized = sj.queryExecution.optimizedPlan.toString
    optimized should include("explode")
    optimized should include("__salt")
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val joinKeys = sj.queryExecution.optimizedPlan.collect {
      case j: Join => j.condition.map(_.toString).getOrElse("")
    }
    joinKeys.exists(c => c.contains("__salt") && c.contains("k")) shouldBe true
    // value-level replication proof: each dim key joins from all 8 salted
    // replicas, so the HOT fact rows distribute over every replica and
    // the total row count still equals the plain join's
    sj.count() shouldBe fact.join(dim, Seq("k"), "inner").count()
  }
}
