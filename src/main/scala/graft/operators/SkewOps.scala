package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Skew-handling join patterns for 100 TB fact tables.
  *
  * AQE's skew-join split handles most cases at runtime
  * (spark.sql.adaptive.skewJoin, on by default); explicit salting is
  * the portable fallback when one join key dominates so heavily that
  * even split partitions won't fit. The salted join is semantically
  * identical to the plain join — which the oracle check proves.
  */
object SkewOps {
  type Q = (SparkSession, String) => DataFrame

  /** Inner equi-join with an N-way salt: the (potentially skewed) left
    * side scatters each row to one of `salts` sub-keys; the right side
    * replicates each row to all of them. Hot keys spread across
    * `salts` reducers instead of melting one.
    */
  def saltedJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, salts: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  /** Revenue per nation through a salted customer⋈orders join — the
    * oracle proves salting preserves join semantics exactly.
    */
  private val skewSalted: Q = (spark, dir) => {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
    saltedJoin(orders, customer, "o_custkey", "c_custkey", salts = 8)
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy("c_nationkey")
  }

  val queries: Map[String, Q] = Map(
    "e_skew_salted" -> skewSalted,
  )

  val oracles: Map[String, String] = Map(
    "e_skew_salted" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
  )
}
