package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{Num, Tables}

/** Relational extension suite (SURVEY §2.3 `e_agg_*`, `e_join_*`,
  * `e_window_*`, `e_topk`, `e_set_*`) — the aggregation/join/window/set
  * algebra the reference delegates to pg/mysql (it declares none itself;
  * SURVEY §2.1 D/E/G), expressed with Catalyst built-ins only.
  *
  * Scale notes (100 TB): every group-by here is hash-partitioned with
  * map-side partial aggregation; dimension joins are broadcast; top-k
  * fuses to TakeOrderedAndProject (no global sort); windows shuffle once
  * on their partition key.
  */
object RelationalOps {
  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 shape: partial+final hash aggregation over the fact table.
    * Decimal-exact sums (see Num) keep results bit-identical across any
    * partitioning, so map-side combine stays on.
    */
  private val aggGroup: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Num.dsum(col("l_quantity")).as("sum_qty"),
        Num.dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
          (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2)))))
          .cast("double").as("sum_disc_price"),
        round(Num.dsum(col("l_quantity")) / count(lit(1)), 2).as("avg_qty"),
        count(lit(1)).as("cnt"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Distinct aggregate — Spark plans this as a two-phase expand +
    * aggregate; exact (no sketch), shuffles on the group key.
    */
  private val aggDistinct: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n_parts"))
      .orderBy("l_returnflag")

  /** ROLLUP grouping sets. Subtotal rows surface NULL keys; COALESCE to a
    * sentinel on both sides so ORDER BY is total without relying on
    * engine-specific NULL ordering (Spark: NULLS FIRST, DuckDB: LAST).
    */
  private val aggRollup: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("_all_")).as("rf"),
        coalesce(col("l_linestatus"), lit("_all_")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** Broadcast equi-join of two small dimensions. The explicit
    * broadcast() hint is what we'd write at 100 TB too: region/nation
    * stay tiny no matter the fact-table scale.
    */
  private val joinBroadcast: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region")
    n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "inner")
      .select("n_nationkey", "n_name", "r_name")
      .orderBy("n_nationkey")
  }

  /** Left outer join + aggregate: order count per customer including
    * zero-order customers. COUNT(o_orderkey) counts only matched rows —
    * the standard outer-join-count idiom.
    */
  private val joinOuter: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"), c("c_name"))
      .agg(count(o("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** Left semi join — EXISTS. No payload columns from the right side
    * cross the shuffle, which is the point at scale.
    */
  private val joinSemi: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left anti join — NOT EXISTS (null-safe by construction, unlike
    * NOT IN with nullable keys).
    */
  private val joinAnti: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Ranking window: top-3 orders per customer. One shuffle on
    * o_custkey; rank filter applies before any downstream exchange.
    */
  private val windowRank: Q = (spark, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running-total window with an explicit ROWS frame. Decimal-exact sum
    * keeps the running values deterministic.
    */
  private val windowRunning: Q = (spark, dir) => {
    val w = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Offset windows (LAG/LEAD) + NTILE bucketing — the remaining window
    * shapes: prior/next order price per customer and quartile binning,
    * all over one shuffle on the partition key.
    */
  private val windowLag: Q = (spark, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Relative-position window functions: percent_rank = (rank−1)/(n−1)
    * and cume_dist = rows≤current / n — exact rationals over a
    * tie-free ordering (o_orderkey breaks ties), so both round
    * bit-identically in the oracle. Single-row partitions (two exist
    * in the fixture) pin the 0/0 → 0.0 and 1.0 edge both engines
    * define the same way. Shares the one o_custkey exchange.
    */
  private val windowPct: Q = (spark, dir) => {
    val w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Discounted revenue in the decimal-exact pattern every money sum
    * here uses: per-row double product (bit-identical in any engine),
    * DECIMAL(18,6) sum (associative → partial aggregation stays on),
    * final double cast.
    */
  private def discRevenue =
    sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 6))).cast("double").as("revenue")

  /** TPC-H Q3 shape (shipping-priority): segment-filtered customers ⋈
    * orders ⋈ lineitem with complementary date filters, per-order
    * revenue, global top 10. Catalyst pushes all three filters into
    * the scans, the two joins shuffle on their keys under AQE, and
    * the final sort+limit fuses to TakeOrderedAndProject.
    */
  private val tpchQ3: Q = (spark, dir) => {
    val cut = lit("1998-01-01").cast("timestamp_ntz")
    val c = Tables.load(spark, dir, "customer")
      .where(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(spark, dir, "orders").where(col("o_orderdate") < cut)
    val l = Tables.load(spark, dir, "lineitem").where(col("l_shipdate") > cut)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy("l_orderkey", "o_orderdate")
      .agg(discRevenue)
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q14 shape (promotion effect): conditional aggregation over
    * a fact⋈dim join — CASE inside the sum, one pass, dim broadcast.
    * Both branches sum in DECIMAL(18,6) (associative, partial-agg
    * safe); the ratio divides two exactly-representable doubles.
    */
  private val tpchQ14: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1995-04-01").cast("timestamp_ntz"))
    val p = Tables.load(spark, dir, "part")
    val rev = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 6))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)
          .otherwise(lit(0).cast(DecimalType(18, 6)))).as("promo"),
        sum(rev).as("total"))
      .select(
        round(lit(100.0) * col("promo").cast("double") /
          col("total").cast("double"), 6).as("promo_pct"),
        col("promo").cast("double").as("promo_rev"),
        col("total").cast("double").as("total_rev"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicate): the
    * OR-of-ANDs join filter that exercises CNF extraction — Catalyst
    * pushes the common conjuncts it can derive (p_size lower bound,
    * quantity range hull) to the scans and evaluates the disjunction
    * post-join; the brand/size dim side broadcasts.
    */
  private val tpchQ19: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .where(cond)
      .agg(discRevenue, count(lit(1)).as("n_items"))
  }

  /** TPC-H Q5 shape (local-supplier volume): the six-way join — fact
    * tables shuffle on their keys, the three dims (supplier, nation,
    * region) broadcast — with the local-supplier constraint
    * c_nationkey = s_nationkey and a one-year order window, revenue
    * per nation.
    */
  private val tpchQ5: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders").where(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val l = Tables.load(spark, dir, "lineitem")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region").where(col("r_name") === "ASIA")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(discRevenue)
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q13 shape (customer distribution): order count per customer
    * through a filtered LEFT join (customers with no orders count as
    * 0), then the distribution of those counts — a two-level
    * aggregation, both keyed, all-integer output.
    */
  /** TPC-H Q10 shape (returned-item reporting): three fact-side joins
    * shuffle on their keys, the nation dim broadcasts, grouped revenue
    * per customer with the customer attributes riding the group key,
    * global top 20 via TakeOrdered — the canonical "who returned the
    * most merchandise this quarter" report.
    */
  private val tpchQ10: Q = (spark, dir) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1996-07-01").cast("timestamp_ntz")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") >= lo && col("o_orderdate") < hi)
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_returnflag") === "R")
    val c = Tables.load(spark, dir, "customer")
    val n = Tables.load(spark, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(discRevenue)
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q7 shape (volume shipping): bidirectional nation-pair flow
    * — supplier nation × customer nation via two broadcast copies of
    * the nation dim, shipdate-windowed, revenue per (direction, year).
    */
  private val tpchQ7: Q = (spark, dir) => {
    val lo = lit("1996-01-01").cast("timestamp_ntz")
    val hi = lit("1998-01-01").cast("timestamp_ntz")
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") >= lo && col("l_shipdate") < hi)
    val o = Tables.load(spark, dir, "orders")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation").select("n_nationkey", "n_name")
    val n1 = n.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" &&
          col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(discRevenue)
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  private val tpchQ13: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer").select("c_custkey")
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18 shape (large-volume orders): HAVING-filtered aggregate
    * keys semi-joined back to the fact — the aggregate-then-filter-
    * then-rejoin pattern (Spark plans the HAVING as a post-aggregate
    * filter and the IN-subquery as a LeftSemi hash join). Quantities
    * are integer-valued doubles, so the sums are exact.
    */
  private val tpchQ18: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val big = l.groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > 300.0)
    o.join(big, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(20)
  }

  /** TPC-H Q1 shape (pricing summary report): the canonical one-pass
    * scan-heavy aggregate — every money statistic in DECIMAL(18,6)
    * (associative, so map-side combine stays on and the result is
    * bit-identical under any partitioning); averages divide the exact
    * decimal sums by the group count instead of averaging doubles,
    * which would be order-dependent. At 100 TB this is the query the
    * columnar scan + partial aggregation exist for: 6 output rows,
    * one shuffle of 6×|partitions| partial rows.
    */
  private val tpchQ1: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
      .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp_ntz"))
    val disc = (col("l_extendedprice") * (lit(1) - col("l_discount")))
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 6))).as("bp"),
        sum(disc.cast(DecimalType(18, 6))).as("dp"),
        sum((disc * (lit(1) + col("l_tax"))).cast(DecimalType(18, 6)))
          .as("ch"),
        sum(col("l_discount").cast(DecimalType(18, 6))).as("dsum"),
        count(lit(1)).as("count_order"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("sum_qty"),
        col("bp").cast("double").as("sum_base_price"),
        col("dp").cast("double").as("sum_disc_price"),
        col("ch").cast("double").as("sum_charge"),
        round(col("sum_qty") / col("count_order"), 6).as("avg_qty"),
        round(col("bp").cast("double") / col("count_order"), 6)
          .as("avg_price"),
        round(col("dsum").cast("double") / col("count_order"), 6)
          .as("avg_disc"),
        col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q6 shape (forecast revenue change): pure scan-filter-agg —
    * all three predicates push to the parquet scan, no join, no
    * shuffle beyond the single-row final aggregate. The discount
    * bounds compare doubles directly: both engines evaluate the same
    * IEEE comparison on the same stored bits, so the boundary rows
    * cannot diverge.
    */
  private val tpchQ6: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
    l.where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        sum((col("l_extendedprice") * col("l_discount"))
          .cast(DecimalType(18, 6))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q8 shape (national market share): the widest classic join
    * tree — fact chain lineitem⋈orders⋈customer shuffles on its keys;
    * part, supplier, and BOTH nation copies plus region broadcast.
    * Share is a conditional decimal sum over the same rows as the
    * total, so one aggregate computes both. Adapted to the fixture
    * (p_type = 'ECONOMY', customers in AMERICA, supplier nation
    * NATION_19 — chosen non-degenerate at both gate SFs).
    */
  private val tpchQ8: Q = (spark, dir) => {
    val p = Tables.load(spark, dir, "part").where(col("p_type") === "ECONOMY")
    val o = Tables.load(spark, dir, "orders").where(
      col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val l = Tables.load(spark, dir, "lineitem")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    val r = Tables.load(spark, dir, "region").where(col("r_name") === "AMERICA")
    val n1 = n.select(col("n_nationkey").as("c_nk"),
      col("n_regionkey").as("c_rk"))
    val n2 = n.select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val v = (col("l_extendedprice") * (lit(1) - col("l_discount")))
      .cast(DecimalType(18, 6))
    val zero = lit(0).cast(DecimalType(18, 6))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("c_rk") === col("r_regionkey"))
      .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_19", v).otherwise(zero))
          .as("nat"),
        sum(v).as("tot"))
      .select(col("o_year"),
        round(col("nat").cast("double") / col("tot").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit): the fixture has no partsupp
    * / ps_supplycost, so cost is p_retailprice·quantity — same join
    * tree (part + supplier + nation broadcast, orders shuffled on
    * orderkey), same amount expression shape, profit per supplier
    * nation per order year.
    */
  private val tpchQ9: Q = (spark, dir) => {
    val p = Tables.load(spark, dir, "part")
      .where(col("p_name").like("%widget%"))
    val l = Tables.load(spark, dir, "lineitem")
    val o = Tables.load(spark, dir, "orders")
    val s = Tables.load(spark, dir, "supplier")
    val n = Tables.load(spark, dir, "nation")
    val amount = (col("l_extendedprice") * (lit(1) - col("l_discount")) -
      col("p_retailprice") * col("l_quantity")).cast(DecimalType(18, 6))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q12 shape (shipping-priority lines): the fixture has no
    * l_shipmode/l_commitdate/l_receiptdate, so "late" is the same
    * l_shipdate > o_orderdate predicate Q4/Q21 use and the group key
    * is l_linestatus — the shape (fact⋈fact join + conditional
    * two-way priority counts) is Q12's.
    */
  private val tpchQ12: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders")
    val l = Tables.load(spark, dir, "lineitem").where(
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q15 shape (top supplier): per-supplier revenue over one
    * quarter, then the supplier(s) AT the maximum — the max rides an
    * unpartitioned window over the POST-AGGREGATE frame (|suppliers|
    * rows, the bounded-window discipline the histogram quantiles use),
    * and the equality test compares the exact decimals, not doubles,
    * so a tie is a true tie in both engines.
    */
  private val tpchQ15: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem").where(
      col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
    val s = Tables.load(spark, dir, "supplier")
    val rev = l.groupBy(col("l_suppkey"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 6))).as("total_rev"))
    val top = rev
      .withColumn("mx",
        max("total_rev").over(Window.partitionBy(lit(1))))
      .where(col("total_rev") === col("mx"))
    top.join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Ratio-to-report: each nation's share of total order revenue — the
    * percent-of-total window pattern. The denominator is a window over
    * the 25-row aggregate, not the fact table, so the "global total"
    * costs one single-partition exchange of 25 rows.
    */
  private val shareOfTotal: Q = (spark, dir) => {
    val per = Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_nationkey")
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    per.select(col("c_nationkey"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") /
          sum(col("rev")).over(Window.partitionBy())
            .cast("double"), 6).as("share"))
      .orderBy("c_nationkey")
  }

  /** Column profiling — the data-quality audit a wrangler runs before
    * anything else: per column, null count, distinct count, and the
    * value-length range. One pass over the table computing all the
    * aggregates at once (no per-column scans), then a literal unpivot
    * of the 4-metric struct per column.
    */
  private val profile: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    val cols = Seq("doc_id", "lang", "source", "n_chars", "text")
    val aggs = cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct"),
        min(length(s)).cast("long").as(s"${c}_minlen"),
        max(length(s)).cast("long").as(s"${c}_maxlen"))
    }
    val wide = docs.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map(c => struct(lit(c).as("column_name"),
      col(s"${c}_nulls").as("n_nulls"),
      col(s"${c}_distinct").as("n_distinct"),
      col(s"${c}_minlen").as("min_len"),
      col(s"${c}_maxlen").as("max_len")))
    wide.select(explode(array(rows: _*)).as("p"))
      .select("p.column_name", "p.n_nulls", "p.n_distinct",
        "p.min_len", "p.max_len")
      .orderBy("column_name")
  }

  /** Min-max feature normalization per event_type: (v − min)/(max −
    * min), the scaling step feature pipelines apply before training.
    * The 5-row stats dim broadcasts back; the ratio is a fixed double
    * expression shape.
    */
  private val minmaxNorm: Q = (spark, dir) => {
    val ev = Tables.load(spark, dir, "events")
    val stats = ev.groupBy("event_type")
      .agg(min("value").as("v_min"), max("value").as("v_max"))
    ev.join(broadcast(stats), "event_type")
      .select(col("event_id"), col("event_type"),
        round((col("value") - col("v_min")) / (col("v_max") - col("v_min")), 6)
          .as("v_norm"))
      .orderBy("event_id")
  }

  /** Value-based (RANGE) window frame: how many of the same customer's
    * orders fall within ±5000 of this order's price — a frame bounded
    * by VALUE distance, not row count (the one window frame kind the
    * registry lacked). Prices are quantized to integer cents through
    * DECIMAL(18,2) on both sides — exact by construction (floor(x*100)
    * in double was exact only because both engines made the identical
    * IEEE rounding error; a price whose double*100 lands below the
    * integer would silently shift a bucket). first_value over the
    * ordered partition tags each row with the customer's cheapest
    * order. Both windows share the one o_custkey exchange.
    */
  private val windowRange: Q = (spark, dir) => {
    val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
      .cast("long")
    val byPrice = Window.partitionBy("o_custkey")
      .orderBy("price_cents")
      .rangeBetween(-500000L, 500000L)
    val byOrder = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("price_cents", cents)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        count(lit(1)).over(byPrice).as("n_nearby"),
        first_value(col("o_orderkey")).over(byOrder).as("cheapest_key"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** FULL OUTER join — both-side-preserving semantics (the one join
    * type the registry lacked): even-keyed customers against the
    * order counts of every-third order, so both sides contribute
    * unmatched rows and the coalesced key + presence flags make the
    * null patterns hash-checkable.
    */
  private val joinFull: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders")
      .where(col("o_orderkey") % 3 === 0)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"))
    val c = Tables.load(spark, dir, "customer")
      .where(col("c_custkey") % 2 === 0)
      .select("c_custkey", "c_name")
    c.join(o, col("c_custkey") === col("o_custkey"), "full")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        when(col("c_custkey").isNull, 0).otherwise(1).as("has_cust"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      .orderBy("custkey")
  }

  /** Multiset (ALL) set operations — EXCEPT ALL keeps multiplicity
    * differences, INTERSECT ALL keeps the minimum multiplicity, unlike
    * the distinct forms already registered. Aggregated afterwards so
    * the result is compact while the plan still carries the
    * ExceptAll/IntersectAll operators.
    */
  private val setOpsAll: Q = (spark, dir) => {
    val l = Tables.load(spark, dir, "lineitem")
    val a = l.where(col("l_quantity") < 3.0).select("l_linenumber")
    val b = l.where(col("l_quantity") > 48.0).select("l_linenumber")
    val ex = a.exceptAll(b).groupBy("l_linenumber")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
    val in = a.intersectAll(b).groupBy("l_linenumber")
      .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
    ex.unionAll(in).select("op", "l_linenumber", "n")
      .orderBy("op", "l_linenumber")
  }

  /** Explicit null ordering — a real cross-engine trap: Spark's ASC
    * default is NULLS FIRST, DuckDB's is NULLS LAST, so any nullable
    * sort key silently diverges unless the placement is spelled out.
    * The nullable key (priority NULLIF'd) is sorted NULLS FIRST on
    * both engines, tie-broken by the primary key.
    */
  private val nullOrdering: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        nullif(col("o_orderpriority"), lit("1-URGENT")).as("prio_opt"))
      .orderBy(col("prio_opt").asc_nulls_first, col("o_orderkey"))
      .limit(100)

  /** Pairwise correlation matrix of the lineitem measures — the
    * feature-screening step before modeling. All six pairs compute in
    * ONE aggregation pass (no per-pair scans), then unpivot to rows;
    * rounding to 4 decimals absorbs engine-order ulps exactly as
    * e_stats_agg's moments do.
    */
  private val corrMatrix: Q = (spark, dir) => {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      round(corr(col(a), col(b)), 4).as(s"${a}__$b")
    }
    val wide = Tables.load(spark, dir, "lineitem").agg(aggs.head, aggs.tail: _*)
    val rows = pairs.map { case (a, b) =>
      struct(lit(a).as("x"), lit(b).as("y"), col(s"${a}__$b").as("r"))
    }
    wide.select(explode(array(rows: _*)).as("p"))
      .select("p.x", "p.y", "p.r")
      .orderBy("x", "y")
  }

  /** Ordered string aggregation, deterministically: sort_array over
    * the collected distinct set before joining — collect_set order is
    * partition-dependent, the sort is not (listagg without WITHIN
    * GROUP has the same trap). Distinct set is bounded by the source
    * vocabulary, not the row count.
    */
  private val groupConcat: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(array_join(sort_array(collect_set(col("source"))), ",")
          .as("sources"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** Bitmask aggregation: one BIGINT of membership bits per group via
    * bit_or — the poor-man's bitmap index (presence of doc_id residue
    * classes per language). Constant-size aggregation state; popcount
    * audits slot coverage.
    */
  private val bitmask: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 60 AS INT)))")
        .as("mask"))
      .select(col("lang"), col("mask"),
        bit_count(col("mask")).cast("int").as("n_slots"))
      .orderBy("lang")

  /** Deterministic arg-max via struct ordering: max(struct(ord, id))
    * is lexicographic, so ties on the ordering value resolve to the
    * larger id — unlike bare max_by, whose tie choice is
    * partition-order-dependent. One two-phase aggregate, no window.
    */
  private val argmax: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .groupBy("c_nationkey")
      .agg(max(struct(col("c_acctbal"), col("c_custkey"))).as("m"))
      .select(col("c_nationkey"), col("m.c_acctbal").as("best_acctbal"),
        col("m.c_custkey").as("best_custkey"))
      .orderBy("c_nationkey")

  /** Global top-k: sort+limit fuses into TakeOrderedAndProject —
    * per-partition heaps + driver merge, no global sort. This is the
    * plan shape that survives 100 TB.
    */
  private val topk: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(25)

  /** CUBE grouping sets — all 4 grouping combinations in one pass
    * (Spark plans an Expand + single aggregation). Same NULL-sentinel
    * discipline as ROLLUP.
    */
  private val aggCube: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), Num.dsum(col("l_quantity")).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("_all_")).as("rf"),
        coalesce(col("l_linestatus"), lit("_all_")).as("ls"),
        col("cnt"), col("sum_qty"))
      .orderBy("rf", "ls")

  /** PIVOT with an explicit value list (explicit values keep the output
    * schema static — an implicit pivot would scan once just to discover
    * columns, and nondeterministic column sets break 100 TB jobs).
    */
  private val pivot: Q = (spark, dir) =>
    Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("day")

  /** Equi-width histogram via width_bucket + count — the binning
    * family. One two-phase aggregation; bucket ids are computed
    * per-row in codegen (values outside [min,max) land in the SQL-
    * standard overflow buckets 0 and n+1).
    */
  private val histogram: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .select(width_bucket(col("o_totalprice"),
        lit(0.0), lit(600000.0), lit(12)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))
      .orderBy("bucket")

  /** Z-order clustering key over (customer, price-bucket) — the
    * multi-dim layout sort ([[graft.sources.ZOrder]]): writing 100 TB
    * of orders sorted by this key lets file min/max stats prune scans
    * filtered on EITHER dimension. The query materializes the key and
    * the fused top-100 (TakeOrderedAndProject — the key computation is
    * one codegen'd projection, the sort never globalizes).
    */
  private val zorder: Q = (spark, dir) => {
    val a = col("o_custkey").bitwiseAND(lit(0xffffL))
    val b = floor(col("o_totalprice") / 10.0).cast("long")
      .bitwiseAND(lit(0xffffL))
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), graft.sources.ZOrder.interleave(a, b).as("zval"))
      .orderBy("zval", "o_orderkey")
      .limit(100)
  }

  /** Unpivot (melt) — the inverse of [[pivot]]: wide measure columns
    * become (metric, value) rows. Spark's unpivot is a zero-shuffle
    * row-expansion (an Expand node, like rollup), so it scales as a
    * pure map; the oracle states the same reshape as UNION ALL.
    */
  private val unpivot: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .where(col("l_orderkey") < 100)
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
        "metric", "value")
      .orderBy("l_orderkey", "l_linenumber", "metric")

  /** Time-series gap filling: a per-type hourly spine (sequence from
    * each type's min to max hour) left-joined to the hourly aggregate,
    * zero-filling missing hours — dashboards and training-data rate
    * monitors both need the explicit zeros. Scale shape: the corpus is
    * touched by two aggregations; the generated spine is tiny
    * (types × hours), so the join broadcasts.
    */
  private val gapFill: Q = (spark, dir) => {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_type"), date_trunc("hour", col("ts")).as("hr"),
        col("value"))
    // decimal quantization before the sum: partial-aggregation order
    // must not be able to flip the rounded double (see tumblingBatch)
    val counts = ev.groupBy("event_type", "hr")
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))), 2)
          .cast("double").as("sum_value"))
    val spine = ev.groupBy("event_type")
      .agg(min("hr").as("lo"), max("hr").as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("hr"))
    spine.join(counts, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("cnt"), lit(0L)).as("cnt"),
        coalesce(col("sum_value"), lit(0.0)).as("sum_value"))
      .orderBy("event_type", "hr")
  }

  /** Second-moment aggregates (stddev/variance/correlation/covariance)
    * — single-pass mergeable central-moment buffers, the same
    * partial+final shape as sum/avg. Rounded coarsely enough that the
    * engines' different merge orders (error ~1e-9 relative) cannot
    * surface in the hash.
    */
  private val statsAgg: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_quantity")), 2).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))
      .orderBy("l_returnflag")

  /** HLL++ sketch vs exact distinct — the constant-memory cardinality
    * path for 100 TB (exact distinct shuffles every distinct value; the
    * sketch shuffles one ~1.5 KB buffer per group per partition).
    * Deterministic for fixed input but engine-specific, so no DuckDB
    * oracle; the query carries its own error column instead.
    */
  private val aggApprox: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      // dedupe (group, value) FIRST with a codegen'd hash aggregate:
      // both the exact count and the HLL sketch are duplicate-insensitive,
      // so folding them over the distinct pairs gives the identical
      // answer while (a) the sketch update runs over ~10x fewer rows and
      // (b) countDistinct no longer needs its Expand rewrite (mixing a
      // distinct aggregate with a sketch in ONE agg doubles the input
      // via Expand before aggregating)
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(
        count(lit(1L)).as("exact_parts"),
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"))
      .select(col("l_returnflag"), col("exact_parts"), col("approx_parts"),
        round(abs(col("approx_parts") - col("exact_parts")) /
          col("exact_parts"), 4).as("rel_err"))
      .orderBy("l_returnflag")

  /** Top-3 orders per customer via the typed heap Aggregator
    * ([[graft.functions.TopKAggregator]]): partial aggregation carries
    * ≤k rows per key through the shuffle, where the window formulation
    * (e_window_rank) sorts every group in full. Same oracle shape as
    * the window query — semantics proven equal.
    */
  private val topkPerKey: Q = (spark, dir) => {
    import spark.implicits._
    import graft.functions.{Scored, TopK}
    Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"), col("o_orderkey"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, price, key) => Scored(price, key) }
      .agg(TopK.aggregator(3).toColumn.name("top"))
      .flatMap { case (cust, top) =>
        top.map(s => (cust, s.id, s.score)) }
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey"))
  }

  /** The custom KMV sketch ([[graft.functions.KmvDistinct]], a
    * TypedImperativeAggregate) next to the exact count — deterministic
    * constant-memory cardinality, unlike HLL's engine-specific buckets.
    */
  private val kmvDistinctQ: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      // distinct-first, as in [[aggApprox]]: KMV keeps the k smallest
      // DISTINCT hashes, so duplicates never change the sketch — the
      // string-cast + hash + heap update then runs over the ~10x
      // smaller distinct set and the Expand rewrite disappears
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(
        count(lit(1L)).as("exact_parts"),
        graft.functions.KmvDistinct.kmvDistinct(spark,
          col("l_partkey").cast("string")).as("kmv_parts"))
      .select(col("l_returnflag"), col("exact_parts"), col("kmv_parts"),
        round(abs(col("kmv_parts") - col("exact_parts")) /
          col("exact_parts"), 4).as("rel_err"))
      .orderBy("l_returnflag")

  /** Oracle-checkable KMV: the same TypedImperativeAggregate fed
    * md5-derived 60-bit hashes (pre-hashed LONG path, estimate over
    * [0, 2^60)) so DuckDB can replay the estimator exactly — rank the
    * distinct hashes per group, take the 256th smallest, apply
    * (k−1)/(kth/2^60). The internal-XXH64 variant stays the production
    * path; this one proves the sketch against an external engine.
    */
  /** KMV sketch SET OPERATIONS (Beyer et al., SIGMOD 2007): estimate
    * the union size, intersection size, and Jaccard of two corpus
    * slices' vocabularies from two k-minimum-value sketches — the
    * sketch-algebra capability that distinct-COUNTING alone (HLL, the
    * kmv_distinct pair) cannot express, and the way a 100 TB pipeline
    * answers "how much vocabulary do these two sources share" without
    * ever joining the full term sets: each slice is reduced map-side
    * to its k smallest term hashes (constant memory), and every
    * estimate below derives from those 2k values. The EXACT union/
    * intersection ride along as columns, so the gate row pins both the
    * estimator's determinism and its accuracy on the fixture. All
    * hashes are md5-derived (60-bit domain) so DuckDB replays the
    * sketches bit-for-bit.
    */
  private val KmvSetK = 256

  private val kmvSetOps: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    // word BIGRAMS, not tokens: the fixture's unigram vocabulary is a
    // deliberate 31 words, which never fills a k=256 sketch — bigrams
    // (~900 distinct per slice) actually exercise the estimator
    val t = graft.functions.TextShingles.tokens(col("text"))
    val n = greatest(size(t) - 1, lit(0))
    val bigrams = zip_with(slice(t, lit(1), n), slice(t, lit(2), n),
      (a, b) => concat(a, lit(" "), b))
    // NOTE (r16): InferFiltersFromGenerate only fires when the
    // generator child is a bare Attribute (verified in the 4.1.2
    // bytecode), so exploding this inline zip_with pays no inferred
    // re-evaluation — an explode_outer rewrite was measured ~0.2 s
    // WORSE (extra null-filter) and reverted
    val terms = docs
      .select(when(col("doc_id") % 2 === 0, "a").otherwise("b").as("slice"),
        explode(bigrams).as("term"))
      .distinct()
    val hashed = terms
      .select(col("slice"),
        graft.functions.TextShingles.md5Hash60(col("term")).as("h"))
      .distinct()
    val sk = hashed
      .withColumn("rn",
        row_number().over(Window.partitionBy("slice").orderBy("h")))
      .where(col("rn") <= KmvSetK)
    // combined sketch: the k smallest across both slices (k rows total)
    val uni = sk.select("h").distinct().orderBy("h").limit(KmvSetK)
    val uniAgg = uni.agg(count(lit(1)).as("n_uni"), max(col("h")).as("kth"))
    val inBoth = uni
      .join(sk.groupBy("h").agg(countDistinct(col("slice")).as("ns")),
        Seq("h"))
      .where(col("ns") === 2)
      .agg(count(lit(1)).as("k_int"))
    val exact = terms.groupBy("term")
      .agg(countDistinct(col("slice")).as("ns"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("ns") === 2, 1L).otherwise(0L)).as("exact_inter"))
    // (k-1)/F(kth) with F over the 60-bit md5 domain; exact when the
    // combined sketch is not full
    val estUnionRaw = when(col("n_uni") < KmvSetK, col("n_uni").cast("double"))
      .otherwise(round(lit((KmvSetK - 1).toDouble) * pow(lit(2.0), lit(60))
        / col("kth")))
    exact.crossJoin(uniAgg).crossJoin(inBoth)
      .select(col("exact_union"), col("exact_inter"),
        estUnionRaw.cast("long").as("est_union"),
        round(col("k_int").cast("double") / col("n_uni") * estUnionRaw)
          .cast("long").as("est_inter"),
        round(col("k_int").cast("double") / col("n_uni"), 4).as("jacc_est"))
  }

  private val kmvDistinctMd5Q: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      // distinct-first (see [[aggApprox]]): the md5 derivation — the
      // expensive part of this variant — now runs once per distinct
      // (flag, partkey) pair instead of once per lineitem row
      .select("l_returnflag", "l_partkey").distinct()
      .groupBy("l_returnflag")
      .agg(
        count(lit(1L)).as("exact_parts"),
        graft.functions.KmvDistinct.kmvDistinct(spark,
          graft.functions.TextShingles.md5Hash60(
            col("l_partkey").cast("string"))).as("kmv_parts"))
      .select(col("l_returnflag"), col("exact_parts"), col("kmv_parts"),
        round(abs(col("kmv_parts") - col("exact_parts")) /
          col("exact_parts"), 4).as("rel_err"))
      .orderBy("l_returnflag")

  /** UNION ALL — no shuffle at all, just partition concatenation. */
  private val setUnion: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer").select(col("c_name").as("name"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_name").as("name"))
    c.unionAll(s).orderBy("name")
  }

  /** INTERSECT (set semantics — Spark plans a left-semi over distinct). */
  private val setIntersect: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.intersect(s).orderBy("nationkey")
  }

  /** EXCEPT (set semantics — left-anti over distinct). */
  private val setExcept: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val s = Tables.load(spark, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.except(s).orderBy("nationkey")
  }

  val queries: Map[String, Q] = Map(
    "e_agg_group" -> aggGroup,
    "e_agg_distinct" -> aggDistinct,
    "e_agg_rollup" -> aggRollup,
    "e_agg_approx" -> aggApprox,
    "e_kmv_distinct" -> kmvDistinctQ,
    "e_kmv_distinct_md5" -> kmvDistinctMd5Q,
    "e_kmv_setops" -> kmvSetOps,
    "e_agg_cube" -> aggCube,
    "e_pivot" -> pivot,
    "e_gap_fill" -> gapFill,
    "e_stats_agg" -> statsAgg,
    "e_unpivot" -> unpivot,
    "e_histogram" -> histogram,
    "e_zorder" -> zorder,
    "e_join_broadcast" -> joinBroadcast,
    "e_join_outer" -> joinOuter,
    "e_join_semi" -> joinSemi,
    "e_join_anti" -> joinAnti,
    "e_window_rank" -> windowRank,
    "e_window_running" -> windowRunning,
    "e_window_lag" -> windowLag,
    "e_window_pct" -> windowPct,
    "e_group_concat" -> groupConcat,
    "e_bitmask" -> bitmask,
    "e_argmax" -> argmax,
    "e_tpch_q1" -> tpchQ1,
    "e_tpch_q3" -> tpchQ3,
    "e_tpch_q5" -> tpchQ5,
    "e_tpch_q6" -> tpchQ6,
    "e_tpch_q8" -> tpchQ8,
    "e_tpch_q9" -> tpchQ9,
    "e_tpch_q12" -> tpchQ12,
    "e_tpch_q15" -> tpchQ15,
    "e_tpch_q7" -> tpchQ7,
    "e_tpch_q10" -> tpchQ10,
    "e_tpch_q13" -> tpchQ13,
    "e_tpch_q14" -> tpchQ14,
    "e_tpch_q19" -> tpchQ19,
    "e_tpch_q18" -> tpchQ18,
    "e_share_of_total" -> shareOfTotal,
    "e_profile" -> profile,
    "e_minmax_norm" -> minmaxNorm,
    "e_window_range" -> windowRange,
    "e_join_full" -> joinFull,
    "e_set_ops_all" -> setOpsAll,
    "e_null_ordering" -> nullOrdering,
    "e_corr_matrix" -> corrMatrix,
    "e_topk" -> topk,
    "e_topk_per_key" -> topkPerKey,
    "e_set_union" -> setUnion,
    "e_set_intersect" -> setIntersect,
    "e_set_except" -> setExcept,
  )

  val oracles: Map[String, String] = Map(
    // Replays the KMV estimator on the same md5-derived 60-bit hashes:
    // kth-smallest distinct hash per group, (k-1)/(kth/2^60), exact
    // count below k. 1152921504606846976 = 2^60.
    "e_kmv_setops" ->
      s"""WITH t0 AS (
         |  SELECT CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS slice,
         |    regexp_split_to_array(lower(text), '\\s+') AS toks
         |  FROM documents
         |), big AS (
         |  SELECT slice, toks[i] || ' ' || toks[i+1] AS term
         |  FROM t0, unnest(generate_series(1, len(toks) - 1)) AS s(i)
         |), terms AS (SELECT DISTINCT slice, term FROM big),
         |hashed AS (
         |  SELECT DISTINCT slice,
         |    ('0x' || substr(md5(term), 1, 15))::BIGINT AS h
         |  FROM terms
         |), sk AS (
         |  SELECT slice, h FROM (
         |    SELECT slice, h,
         |      row_number() OVER (PARTITION BY slice ORDER BY h) AS rn
         |    FROM hashed) WHERE rn <= $KmvSetK
         |), uni AS (SELECT DISTINCT h FROM sk ORDER BY h LIMIT $KmvSetK),
         |uniagg AS (SELECT count(*) AS n_uni, max(h) AS kth FROM uni),
         |bothsk AS (
         |  SELECT count(*) AS k_int FROM uni
         |  JOIN (SELECT h FROM sk GROUP BY h
         |        HAVING count(DISTINCT slice) = 2) b USING (h)
         |), ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS exact_union,
         |    CAST(sum(CASE WHEN ns = 2 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS exact_inter
         |  FROM (SELECT term, count(DISTINCT slice) AS ns
         |        FROM terms GROUP BY term)
         |)
         |SELECT exact_union, exact_inter,
         |  CAST((CASE WHEN n_uni < $KmvSetK THEN CAST(n_uni AS DOUBLE)
         |    ELSE round(${KmvSetK - 1}.0 * pow(2.0, 60) / kth) END)
         |    AS BIGINT) AS est_union,
         |  CAST(round(CAST(k_int AS DOUBLE) / n_uni *
         |    (CASE WHEN n_uni < $KmvSetK THEN CAST(n_uni AS DOUBLE)
         |     ELSE round(${KmvSetK - 1}.0 * pow(2.0, 60) / kth) END))
         |    AS BIGINT) AS est_inter,
         |  round(CAST(k_int AS DOUBLE) / n_uni, 4) AS jacc_est
         |FROM ex, uniagg, bothsk""".stripMargin,
    "e_kmv_distinct_md5" ->
      """WITH hashed AS (
        |  SELECT DISTINCT l_returnflag,
        |    ('0x' || substr(md5(l_partkey::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM lineitem
        |), ranked AS (
        |  SELECT l_returnflag, h,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS nd
        |  FROM hashed
        |), est AS (
        |  SELECT l_returnflag,
        |    CASE WHEN nd < 256 THEN nd
        |         ELSE CAST(round(255.0 / (h::DOUBLE / 1152921504606846976.0))
        |              AS BIGINT) END AS kmv_parts
        |  FROM ranked
        |  WHERE rn = CASE WHEN nd < 256 THEN 1 ELSE 256 END
        |), ex AS (
        |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT e.l_returnflag, ex.exact_parts, e.kmv_parts,
        |  round(abs(e.kmv_parts - ex.exact_parts)::DOUBLE / ex.exact_parts, 4)
        |    AS rel_err
        |FROM est e JOIN ex USING (l_returnflag) ORDER BY l_returnflag""".stripMargin,
    "e_agg_group" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 2) AS avg_qty,
        |COUNT(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "e_agg_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "e_agg_rollup" ->
      """SELECT COALESCE(l_returnflag, '_all_') AS rf, COALESCE(l_linestatus, '_all_') AS ls,
        |COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "e_agg_cube" ->
      """SELECT COALESCE(l_returnflag, '_all_') AS rf, COALESCE(l_linestatus, '_all_') AS ls,
        |COUNT(*) AS cnt, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,
    "e_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, value FROM events
        |), counts AS (
        |  SELECT event_type, hr, count(*) AS cnt,
        |    CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |  FROM ev GROUP BY event_type, hr
        |), bounds AS (
        |  SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM ev
        |  GROUP BY event_type
        |), spine AS (
        |  SELECT event_type,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        |  FROM bounds
        |)
        |SELECT s.event_type, s.hr, coalesce(c.cnt, 0) AS cnt,
        |  coalesce(c.sum_value, 0.0) AS sum_value
        |FROM spine s LEFT JOIN counts c USING (event_type, hr)
        |ORDER BY s.event_type, s.hr""".stripMargin,
    // DuckDB has no width_bucket — the oracle spells out Spark 4.1.2's
    // actual WidthBucket arithmetic, floor(n*(v-lo)/(hi-lo)) + 1 (one
    // multiply then one divide — NOT the textbook (v-lo)/((hi-lo)/n),
    // whose different rounding sequence can straddle an integer for
    // unlucky lo/hi/n), with overflow buckets 0 and n+1.
    "e_histogram" ->
      """SELECT CASE WHEN o_totalprice < 0.0 THEN 0
        |            WHEN o_totalprice >= 600000.0 THEN 13
        |            ELSE CAST(floor(12 * (o_totalprice - 0.0)
        |                 / (600000.0 - 0.0)) AS BIGINT) + 1 END AS bucket,
        |count(*) AS cnt FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,
    // the interleave SQL is generated from the same bit layout the
    // engine uses (ZOrder.interleaveSql) — shared-by-construction
    "e_zorder" -> {
      val z = graft.sources.ZOrder.interleaveSql("(o_custkey & 65535)",
        "(CAST(floor(o_totalprice / 10.0) AS BIGINT) & 65535)")
      s"""SELECT o_orderkey,
         |$z AS zval
         |FROM orders ORDER BY zval, o_orderkey LIMIT 100""".stripMargin
    },
    "e_unpivot" ->
      """SELECT * FROM (
        |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric,
        |    l_quantity AS value FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_extendedprice',
        |    l_extendedprice FROM lineitem WHERE l_orderkey < 100
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount',
        |    l_discount FROM lineitem WHERE l_orderkey < 100
        |) ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,
    "e_stats_agg" ->
      """SELECT l_returnflag,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  round(var_samp(l_quantity), 2) AS var_qty,
        |  round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "e_pivot" ->
      """SELECT DATE_TRUNC('day', ts) AS day,
        |COUNT(*) FILTER (event_type = 'click') AS click,
        |COUNT(*) FILTER (event_type = 'view') AS "view",
        |COUNT(*) FILTER (event_type = 'signup') AS signup,
        |COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |COUNT(*) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY DATE_TRUNC('day', ts) ORDER BY day""".stripMargin,
    "e_join_broadcast" ->
      """SELECT n.n_nationkey, n.n_name, r.r_name
        |FROM nation n INNER JOIN region r ON n.n_regionkey = r.r_regionkey
        |ORDER BY n.n_nationkey""".stripMargin,
    "e_join_outer" ->
      """SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name ORDER BY c.c_custkey""".stripMargin,
    "e_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "e_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "e_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "e_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "e_window_lag" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |LAG(o_totalprice, 1) OVER w AS prev_price,
        |LEAD(o_totalprice, 1) OVER w AS next_price,
        |CAST(NTILE(4) OVER w AS INT) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "e_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
        |    AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  round(sum(l_quantity) / count(*), 6) AS avg_qty,
        |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*), 6) AS avg_price,
        |  round(CAST(sum(CAST(l_discount AS DECIMAL(18,6)))
        |    AS DOUBLE) / count(*), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "e_tpch_q6" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "e_tpch_q8" ->
      """SELECT o_year,
        |  round(CAST(sum(CASE WHEN supp_nation = 'NATION_19' THEN v
        |      ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |    / CAST(sum(v) AS DOUBLE), 6) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS v,
        |    n2.n_name AS supp_nation
        |  FROM part, lineitem, orders, customer, supplier,
        |    nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
        |    AND o_custkey = c_custkey AND l_suppkey = s_suppkey
        |    AND c_nationkey = n1.n_nationkey
        |    AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |    AND s_nationkey = n2.n_nationkey AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |) t GROUP BY o_year ORDER BY o_year""".stripMargin,
    "e_tpch_q9" ->
      """SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
        |FROM (
        |  SELECT n_name AS nation,
        |    CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |    CAST(l_extendedprice * (1 - l_discount)
        |      - p_retailprice * l_quantity AS DECIMAL(18,6)) AS amount
        |  FROM part, supplier, lineitem, orders, nation
        |  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        |    AND p_name LIKE '%widget%'
        |) t GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,
    "e_tpch_q12" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate > o_orderdate
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "e_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS supplier_no,
        |    sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |      AS total_rev
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
        |FROM supplier JOIN rev ON s_suppkey = supplier_no
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "e_tpch_q14" ->
      """WITH j AS (
        |  SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
        |    AS rev, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        |    AND l_shipdate < TIMESTAMP '1995-04-01'
        |)
        |SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN rev ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
        |  / CAST(sum(rev) AS DOUBLE), 6) AS promo_pct,
        |CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev
        |  ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS promo_rev,
        |CAST(sum(rev) AS DOUBLE) AS total_rev
        |FROM j""".stripMargin,
    "e_tpch_q19" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*)::BIGINT AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "e_tpch_q3" ->
      """SELECT l_orderkey,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS revenue, o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "e_tpch_q10" ->
      """SELECT c_custkey, c_name,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS revenue, c_acctbal, n_name
        |FROM customer, orders, lineitem, nation
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "e_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        |CAST(SUM(CAST(volume AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |    l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer, nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |    AND c_nationkey = n2.n_nationkey
        |    AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR
        |         (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'
        |) t GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "e_tpch_q5" ->
      """SELECT n_name,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
        |  AS DOUBLE) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "e_null_ordering" ->
      """SELECT o_orderkey, nullif(o_orderpriority, '1-URGENT') AS prio_opt
        |FROM orders
        |ORDER BY prio_opt ASC NULLS FIRST, o_orderkey LIMIT 100""".stripMargin,
    "e_corr_matrix" ->
      """WITH w AS (
        |  SELECT round(corr(l_quantity, l_extendedprice), 4) AS q_ep,
        |    round(corr(l_quantity, l_discount), 4) AS q_d,
        |    round(corr(l_quantity, l_tax), 4) AS q_t,
        |    round(corr(l_extendedprice, l_discount), 4) AS ep_d,
        |    round(corr(l_extendedprice, l_tax), 4) AS ep_t,
        |    round(corr(l_discount, l_tax), 4) AS d_t
        |  FROM lineitem
        |)
        |SELECT 'l_quantity' AS x, 'l_extendedprice' AS y, q_ep AS r FROM w
        |UNION ALL SELECT 'l_quantity', 'l_discount', q_d FROM w
        |UNION ALL SELECT 'l_quantity', 'l_tax', q_t FROM w
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', ep_d FROM w
        |UNION ALL SELECT 'l_extendedprice', 'l_tax', ep_t FROM w
        |UNION ALL SELECT 'l_discount', 'l_tax', d_t FROM w
        |ORDER BY x, y""".stripMargin,
    "e_join_full" ->
      """SELECT coalesce(c_custkey, o_custkey) AS custkey,
        |CASE WHEN c_custkey IS NULL THEN 0 ELSE 1 END AS has_cust,
        |coalesce(n_orders, 0)::BIGINT AS n_orders
        |FROM (SELECT c_custkey, c_name FROM customer
        |      WHERE c_custkey % 2 = 0) c
        |FULL JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
        |           WHERE o_orderkey % 3 = 0 GROUP BY o_custkey) o
        |  ON c_custkey = o_custkey
        |ORDER BY custkey""".stripMargin,
    "e_set_ops_all" ->
      """SELECT 'except_all' AS op, l_linenumber, count(*)::BIGINT AS n
        |FROM (
        |  SELECT l_linenumber FROM lineitem WHERE l_quantity < 3.0
        |  EXCEPT ALL
        |  SELECT l_linenumber FROM lineitem WHERE l_quantity > 48.0
        |) GROUP BY l_linenumber
        |UNION ALL
        |SELECT 'intersect_all', l_linenumber, count(*)::BIGINT
        |FROM (
        |  SELECT l_linenumber FROM lineitem WHERE l_quantity < 3.0
        |  INTERSECT ALL
        |  SELECT l_linenumber FROM lineitem WHERE l_quantity > 48.0
        |) GROUP BY l_linenumber
        |ORDER BY op, l_linenumber""".stripMargin,
    "e_window_range" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |count(*) OVER (PARTITION BY o_custkey ORDER BY price_cents
        |  RANGE BETWEEN 500000 PRECEDING AND 500000 FOLLOWING)::BIGINT
        |  AS n_nearby,
        |first_value(o_orderkey) OVER (PARTITION BY o_custkey
        |  ORDER BY o_totalprice, o_orderkey) AS cheapest_key
        |FROM (SELECT *, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS price_cents FROM orders) t
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "e_profile" ->
      """WITH w AS (
        |  SELECT
        |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS doc_id_nulls,
        |    count(DISTINCT doc_id)::BIGINT AS doc_id_distinct,
        |    min(length(doc_id::VARCHAR))::BIGINT AS doc_id_minlen,
        |    max(length(doc_id::VARCHAR))::BIGINT AS doc_id_maxlen,
        |    sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT AS lang_nulls,
        |    count(DISTINCT lang)::BIGINT AS lang_distinct,
        |    min(length(lang))::BIGINT AS lang_minlen,
        |    max(length(lang))::BIGINT AS lang_maxlen,
        |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT AS source_nulls,
        |    count(DISTINCT source)::BIGINT AS source_distinct,
        |    min(length(source))::BIGINT AS source_minlen,
        |    max(length(source))::BIGINT AS source_maxlen,
        |    sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_chars_nulls,
        |    count(DISTINCT n_chars)::BIGINT AS n_chars_distinct,
        |    min(length(n_chars::VARCHAR))::BIGINT AS n_chars_minlen,
        |    max(length(n_chars::VARCHAR))::BIGINT AS n_chars_maxlen,
        |    sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS text_nulls,
        |    count(DISTINCT text)::BIGINT AS text_distinct,
        |    min(length(text))::BIGINT AS text_minlen,
        |    max(length(text))::BIGINT AS text_maxlen
        |  FROM documents
        |)
        |SELECT 'doc_id' AS column_name, doc_id_nulls AS n_nulls,
        |  doc_id_distinct AS n_distinct, doc_id_minlen AS min_len,
        |  doc_id_maxlen AS max_len FROM w
        |UNION ALL SELECT 'lang', lang_nulls, lang_distinct,
        |  lang_minlen, lang_maxlen FROM w
        |UNION ALL SELECT 'n_chars', n_chars_nulls, n_chars_distinct,
        |  n_chars_minlen, n_chars_maxlen FROM w
        |UNION ALL SELECT 'source', source_nulls, source_distinct,
        |  source_minlen, source_maxlen FROM w
        |UNION ALL SELECT 'text', text_nulls, text_distinct,
        |  text_minlen, text_maxlen FROM w
        |ORDER BY column_name""".stripMargin,
    "e_minmax_norm" ->
      """WITH stats AS (
        |  SELECT event_type, min(value) AS v_min, max(value) AS v_max
        |  FROM events GROUP BY event_type
        |)
        |SELECT event_id, e.event_type,
        |  round((value - v_min) / (v_max - v_min), 6) AS v_norm
        |FROM events e JOIN stats s ON e.event_type = s.event_type
        |ORDER BY event_id""".stripMargin,
    "e_tpch_q18" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, total_qty FROM orders
        |JOIN (
        |  SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300.0
        |) big ON o_orderkey = big.l_orderkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "e_share_of_total" ->
      """WITH per AS (
        |  SELECT c_nationkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_nationkey
        |)
        |SELECT c_nationkey, CAST(rev AS DOUBLE) AS revenue,
        |  round(CAST(rev AS DOUBLE) / CAST(sum(rev) OVER () AS DOUBLE), 6)
        |    AS share
        |FROM per ORDER BY c_nationkey""".stripMargin,
    "e_tpch_q13" ->
      """SELECT c_count, count(*)::BIGINT AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "e_group_concat" ->
      """SELECT lang, string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
        |count(DISTINCT source)::BIGINT AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "e_bitmask" ->
      """SELECT lang,
        |bit_or(1::BIGINT << CAST(doc_id % 60 AS INT)) AS mask,
        |CAST(bit_count(bit_or(1::BIGINT << CAST(doc_id % 60 AS INT))) AS INT)
        |  AS n_slots
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "e_argmax" ->
      """SELECT c_nationkey, c_acctbal AS best_acctbal,
        |c_custkey AS best_custkey FROM (
        |  SELECT c_nationkey, c_acctbal, c_custkey,
        |    row_number() OVER (PARTITION BY c_nationkey
        |      ORDER BY c_acctbal DESC, c_custkey DESC) AS rn
        |  FROM customer) t
        |WHERE rn = 1 ORDER BY c_nationkey""".stripMargin,
    "e_window_pct" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |round(percent_rank() OVER w, 6) AS pct_rank,
        |round(cume_dist() OVER w, 6) AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "e_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 25""".stripMargin,
    "e_topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |SELECT o_custkey, o_orderkey, o_totalprice,
        |ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |FROM orders) t WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey""".stripMargin,
    "e_set_union" ->
      """SELECT name FROM (
        |SELECT c_name AS name FROM customer UNION ALL SELECT s_name AS name FROM supplier
        |) t ORDER BY name""".stripMargin,
    "e_set_intersect" ->
      """SELECT nationkey FROM (
        |SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier
        |) t ORDER BY nationkey""".stripMargin,
    "e_set_except" ->
      """SELECT nationkey FROM (
        |SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier
        |) t ORDER BY nationkey""".stripMargin,
  )
}
