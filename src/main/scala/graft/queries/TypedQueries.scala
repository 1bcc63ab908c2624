package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Typed Dataset[T] surface (SURVEY.md §1.2: case-class Encoders where
  * type safety helps). The typed filter/map runs through the product
  * encoder; the aggregate drops back to untyped columns so the partial
  * aggregation and codegen benefits are kept. Results are oracle-checked
  * like every other query, proving the typed path computes identically.
  */
object TypedQueries extends QueryModule {

  case class Lineitem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: Timestamp)

  def lineitems(spark: SparkSession, dir: String): Dataset[Lineitem] = {
    import spark.implicits._
    Tables.lineitem(spark, dir).as[Lineitem]
  }

  // Typed filter + typed projection into a case class, then untyped agg.
  case class Net(l_orderkey: Long, net: Double, flag: String)

  private val qTyped = Q(
    "q_typed_revenue",
    (s, d) => {
      import s.implicits._
      lineitems(s, d)
        .filter((li: Lineitem) => li.l_quantity > 10 && li.l_returnflag != "A")
        .map((li: Lineitem) =>
          Net(li.l_orderkey, li.l_extendedprice * (1 - li.l_discount), li.l_returnflag))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("net")), 2).as("revenue"))
        .orderBy(col("flag"))
    },
    Some("""SELECT l_returnflag AS flag, count(*) AS cnt,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
           FROM lineitem
           WHERE l_quantity > 10 AND l_returnflag <> 'A'
           GROUP BY l_returnflag ORDER BY flag"""))

  override def queries: Seq[Q] = Seq(qTyped)
}
