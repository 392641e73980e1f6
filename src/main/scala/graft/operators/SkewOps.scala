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

  /** Fact⋈dim join with a selective dim predicate — the shape whose
    * 100 TB plan relies on RUNTIME BLOOM-FILTER PRUNING: Spark's
    * InjectRuntimeFilter builds a bloom filter from the filtered dim
    * keys and applies might_contain on the fact side BEFORE its
    * shuffle, so only candidate rows pay exchange + join cost. At
    * fixture scale the injection thresholds (10 GB application-side
    * scan) don't trip; PlanSpec drops them and asserts the filter
    * appears, pinning that the query SHAPE qualifies — equi-join,
    * selective creation side, shuffle on the fact side.
    */
  private val joinBloom: Q = (spark, dir) => {
    val urgent = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") === "1-URGENT" &&
        col("o_totalprice") > 200000.0)
    Tables.load(spark, dir, "lineitem")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      .orderBy("l_returnflag")
  }

  val queries: Map[String, Q] = Map(
    "e_skew_salted" -> skewSalted,
    "e_join_bloom" -> joinBloom,
  )

  val oracles: Map[String, String] = Map(
    "e_skew_salted" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders o INNER JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "e_join_bloom" ->
      """SELECT l_returnflag, COUNT(*) AS n_items,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem l INNER JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT' AND o.o_totalprice > 200000.0
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
  )
}
