package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.{ConfigBoot, QueryRegistry, Router, SqlTemplates}

/** Reference-parity queries (SURVEY §2.3 `r_*`) — the full relational
  * surface the reference declares or generates, re-expressed Spark-first.
  * Citations are to /root/reference/ files.
  */
object ReferenceOps {
  type Q = (SparkSession, String) => DataFrame

  /** A3/B1 — full-relation scan (`select * from invoices ...` shape,
    * config.json:20; generated `select * from <rel>` index.js:482).
    */
  private val rScanAll: Q = (spark, dir) =>
    Tables.load(spark, dir, "region").orderBy("r_regionkey")

  /** B5 — equality filter on a bound value (`where date = ?`,
    * config.json:20). Pushed to the parquet scan by Catalyst.
    */
  private val rFilterEqDate: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .where(col("o_orderdate") === lit("1995-01-01").cast("timestamp"))
      .orderBy("o_orderkey")

  /** B5/C2 — FK-child lookup (`line_items where invoice_id = ?`,
    * config.json:21; subrelation convention index.js:575) through the
    * registry's validated path.
    */
  private val rFkLookup: Q = (spark, dir) =>
    QueryRegistry.subRecordList(spark, dir, "lineitem",
      "l_orderkey", 7L, Seq("l_linenumber"))

  /** B5 — point lookup (`anyById`, config.json:22; fetchRow
    * index.js:524-533).
    */
  private val rPointLookup: Q = (spark, dir) =>
    QueryRegistry.pointLookup(spark, dir, "customer", "c_custkey", 42L)

  /** B4/B6 — dynamic projection + dynamic filter column
    * (`getXfromYwhereZisQ`: `select $x from $y where $z = '$q'`,
    * config.json:23) via catalog-validated identifier splice.
    */
  private val rDynamicProj: Q = (spark, dir) =>
    QueryRegistry.dynamicProjection(spark, dir,
      table = "customer", column = "c_name",
      whereCol = "c_mktsegment", whereVal = "BUILDING")
      .orderBy("c_name")

  /** C1 — the reference's only explicit join (`ticketAnswers`:
    * `select t.id, a.* from ticket t inner join answer a on
    * (t.id = a.ticket_id) where t.id = ?`, config.json:36). The filter
    * pushes through the join to both scans; with the key filter applied
    * the build side is tiny, so Catalyst broadcast-hash-joins it.
    */
  private val rInnerJoin: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders").as("o")
    val l = Tables.load(spark, dir, "lineitem").as("l")
    o.join(l, col("o.o_orderkey") === col("l.l_orderkey"), "inner")
      .where(col("o.o_orderkey") === lit(7L))
      .select(col("o.o_orderkey") +: l.columns.toIndexedSeq.map(c => col(s"l.$c")): _*)
      .orderBy("l_linenumber")
  }

  /** F1-F3 — sorted offset pagination with the reference's clamp
    * semantics (perpage∈[1,1000] default 20, offset = perpage*(page-1),
    * index.js:434-482). Page 2 of customers by account balance.
    */
  private val rPageSort: Q = (spark, dir) =>
    QueryRegistry.recordList(spark, dir, "customer",
      page = 2, perpage = 20, sortBy = Seq("c_acctbal", "c_custkey"))

  /** F1-F3, keyset variant — the 100 TB-safe pagination (SURVEY §4
    * names offset pagination the scale anti-pattern): resume strictly
    * after the last (c_acctbal, c_custkey) seen. Same clamp semantics
    * as the reference's perpage (index.js:475-482); the row-value
    * predicate prunes the scan instead of sorting and discarding.
    */
  private val rPageKeyset: Q = (spark, dir) =>
    QueryRegistry.recordListAfterKeys(spark, dir, "customer",
      Seq("c_acctbal" -> 1000.0, "c_custkey" -> 0L), perpage = 20)

  /** `descTable` (`desc $table`, config.json:34) — schema-as-data.
    * The reference ships `desc` to MySQL; Catalyst's analyzed schema is
    * the native equivalent. No oracle (DuckDB type names differ).
    */
  private val rDescTable: Q = (spark, dir) => {
    import spark.implicits._
    Tables.load(spark, dir, "lineitem").schema.fields.toSeq
      .map(f => (f.name, f.dataType.simpleString, f.nullable))
      .toDF("col_name", "data_type", "nullable")
      .orderBy("col_name")
  }

  /** A5/B2 — the Salesforce plugin's SOQL projection shape
    * (`select id, accountnumber, name from account`, config.json:57):
    * same named-query model over a different backend; here the backend
    * is the parquet source and the projection prunes the scan.
    */
  private val rSoqlProj: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** A5 — the SOQL COMPILATION path (`plugins/salesforce.js:101-116`):
    * the DSv2 [[graft.sources.SoqlSource]] compiles the pushed
    * projection + range filters into the exact lowercase SOQL text
    * jsforce's `conn.query` would receive (pinned string-exact in
    * SoqlSpec, logged via [[graft.sources.SoqlWire]]); rows come from
    * the deterministic account fixture, which DuckDB reconstructs with
    * a range() generator — so the pushdown compilation is on the full
    * rows+schema+hash gate, not just unit-tested.
    */
  private val rSoqlPushdown: Q = (spark, _) =>
    spark.read.format("graft.sources.SoqlSource")
      .option("object", "account").option("rows", "200").load()
      .where(col("annualrevenue") >= 50000.0 && col("annualrevenue") < 150000.0)
      .orderBy("id")

  /** H1 — the template layer itself: a named-parameter SQL template
    * bound through Catalyst's parameterized-query API (the reference's
    * handlebars render + node-dbi bind, config.json:19-24 shape).
    */
  private val rSqlTemplate: Q = (spark, dir) =>
    SqlTemplates.named(spark, dir,
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = :status AND o_totalprice > :minp
        |ORDER BY o_orderkey""".stripMargin,
      Map("status" -> "F", "minp" -> 400000.0))

  /** Fixture catalog in the reference's exact config.json shape
    * (config.json:11-40): one `databases[]` entry whose `queries{}`
    * mixes positional `?` and named `$var` params, like `invoices` /
    * `getXfromYwhereZisQ` do. Declared as data, not code — the whole
    * point of A-family boot (index.js:106-127).
    */
  private[graft] val FixtureConfig =
    """{
      |  "databases": [
      |    {
      |      "name": "billing",
      |      "type": "pg",
      |      "queries": {
      |        "orders_big": "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderstatus = ? AND o_totalprice > $minp ORDER BY o_orderkey",
      |        "regions": "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"
      |      }
      |    }
      |  ]
      |}""".stripMargin

  /** A-family — config-driven declarative boot: the catalog above is
    * parsed and registered at "startup", then dispatched through the
    * ROUTE path with one positional arg ('F') and one `$var`
    * (minp=400000.0), exactly the reference's per-request flow
    * (makeQueryRoute handler, index.js:277-317). The result must
    * hash-match its code-registered twin `r_sql_template` — proving a
    * config-declared template and the code path are one semantics.
    */
  private val rConfigBoot: Q = (spark, dir) =>
    Router.dispatch(ConfigBoot.boot(FixtureConfig),
      "/q/billing/orders_big/F", Map("minp" -> "400000.0"))(spark, dir)
      .fold(e => throw new IllegalStateException(e), identity)

  /** A4 — config-declared external REST route executed end-to-end:
    * the reference's `externalServices` boot (makeRESTroute,
    * index.js:327-366; WorldBank example config.json:41-53) — a
    * `$var` localpath registered at startup, values bound from path
    * segments through the examiner gates, the handlebars remote
    * template rendered, and the remote URI fetched over REAL HTTP
    * (loopback fixture server; the JSON hop, schema inference, and
    * route machinery are all live). Feed values are pure arithmetic
    * of (country, year), so DuckDB reconstructs the response exactly.
    */
  private val rFfiRoute: Q = (spark, _) => {
    val srv = graft.sources.HttpFixtureServer.start()
    try {
      val ns = ConfigBoot.boot(
        s"""{
           |  "externalServices": [
           |    {
           |      "name": "WorldBank",
           |      "baseURI": "${srv.baseUrl}/countries",
           |      "routes": [
           |        {
           |          "method": "get",
           |          "localpath": "/countrydata/$$country/$$fromYear/$$toYear",
           |          "path": "/{{ country }}/indicators/NY.GDP.PCAP.CD?format=json&date={{ fromYear }}:{{ toYear }}"
           |        }
           |      ]
           |    }
           |  ]
           |}""".stripMargin)
      Router.dispatch(ns, "/ffi/WorldBank/countrydata/DE/1995/1998")(
        spark, "")
        .fold(e => throw new IllegalStateException(e), identity)
        .select(col("country"), col("year"), col("value"))
        .orderBy("year")
    } finally srv.stop()
  }

  /** A1/A2 — live heterogeneous federation: the reference's core
    * identity is pg + mysql under one namespace (index.js:230-252,
    * config.json:11-40). The `nation` dim lives in a REAL second
    * backend (embedded Derby via `spark.read.jdbc`,
    * [[graft.sources.JdbcFederation]]); the equality filter is compiled
    * into the remote WHERE clause (PushedFilters on the JDBC scan,
    * pinned by JdbcFederationSpec), so the RDBMS ships 5 rows, not 25.
    */
  private val rJdbcScan: Q = (spark, dir) =>
    graft.sources.JdbcFederation.readTable(spark, dir, "nation")
      .where(col("n_regionkey") === lit(2))
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")

  /** A1/A2 — cross-backend join: JDBC dim × parquet fact, the shape a
    * federated deployment runs all day. The dim side is explicitly
    * broadcast: the RDBMS is read ONCE (25 rows over the wire) and
    * shipped to executors, so the fact side joins with zero shuffle —
    * at 100 TB the remote database never becomes a per-task hotspot.
    */
  private val rJdbcJoin: Q = (spark, dir) => {
    val n = graft.sources.JdbcFederation.readTable(spark, dir, "nation")
    val s = Tables.load(spark, dir, "supplier")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(n("n_nationkey"), n("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        graft.Num.dsum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy("n_nationkey")
  }

  /** A1/A2 — aggregate pushed INTO the remote engine: the DSv2 JDBC
    * catalog path ([[graft.sources.JdbcFederation.readTableV2]]) with
    * pushDownAggregate on, so this GROUP BY compiles into the
    * backend's own SQL (PushedAggregates on the scan — pinned by
    * JdbcFederationSpec) and the RDBMS ships 5 summary rows, not 25
    * dim rows. AVG deliberately avoided: Spark only pushes it when the
    * remote result is final (no partial re-merge), so MIN/MAX/COUNT
    * keep the pushdown unconditional.
    */
  private val rJdbcAgg: Q = (spark, dir) =>
    graft.sources.JdbcFederation.readTableV2(spark, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        max(col("n_nationkey")).as("max_key"),
        min(col("n_nationkey")).as("min_key"))
      .orderBy("n_regionkey")

  /** A1+A2 together — THREE engines in one plan: `nation` from the
    * first JDBC backend (pgmain), `region` from the second (mysqlmain),
    * the `customer` fact from parquet. This is the reference's whole
    * reason to exist — heterogeneous backends answering one query —
    * executed as a single Catalyst plan with both remote dims broadcast
    * (each RDBMS serves its rows once; the fact never shuffles for the
    * joins).
    */
  private val rJdbcTwoBackends: Q = (spark, dir) => {
    val n = graft.sources.JdbcFederation.readTable(spark, dir, "nation")
    val r = graft.sources.JdbcFederation.readTable(spark, dir, "region")
    val c = Tables.load(spark, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_regionkey"), r("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        graft.Num.dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_regionkey")
  }

  val queries: Map[String, Q] = Map(
    "r_config_boot" -> rConfigBoot,
    "r_ffi_route" -> rFfiRoute,
    "r_sql_template" -> rSqlTemplate,
    "r_jdbc_scan" -> rJdbcScan,
    "r_jdbc_agg" -> rJdbcAgg,
    "r_jdbc_join" -> rJdbcJoin,
    // A1 LIVE: the same three federation shapes against a REAL
    // PostgreSQL 15 server over the hand-rolled v3 wire client
    // (graft.sources.PgWire) — the long-carried environment-bound
    // item, closed r16 when server binaries appeared in the sandbox
    "r_pgwire_scan" -> ((s: SparkSession, d: String) =>
      graft.sources.PgWire.pgScan(s, d)),
    "r_pgwire_agg" -> ((s: SparkSession, d: String) =>
      graft.sources.PgWire.pgAgg(s, d)),
    "r_pgwire_join" -> ((s: SparkSession, d: String) =>
      graft.sources.PgWire.pgJoin(s, d)),
    "r_jdbc_two_backends" -> rJdbcTwoBackends,
    "r_scan_all" -> rScanAll,
    "r_filter_eq_date" -> rFilterEqDate,
    "r_fk_lookup" -> rFkLookup,
    "r_point_lookup" -> rPointLookup,
    "r_dynamic_proj" -> rDynamicProj,
    "r_inner_join" -> rInnerJoin,
    "r_page_sort" -> rPageSort,
    "r_page_keyset" -> rPageKeyset,
    "r_desc_table" -> rDescTable,
    "r_soql_proj" -> rSoqlProj,
    "r_soql_pushdown" -> rSoqlPushdown,
  )

  val oracles: Map[String, String] = Map(
    // The JDBC backend is loaded from the same fixture parquet the
    // oracle reads, so DuckDB-over-parquet is the exact oracle for the
    // federated path: any drift (type mapping, filter pushdown, commit
    // visibility) shows up as a hash mismatch.
    "r_jdbc_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin,
    // 'DE' UTF-8 codes sum to 137 -> value = 13700 + year%100
    "r_ffi_route" ->
      """SELECT 'DE' AS country, CAST(y AS BIGINT) AS year,
        |CAST(13700 + y % 100 AS BIGINT) AS value
        |FROM generate_series(1995, 1998) AS t(y) ORDER BY year""".stripMargin,
    // the pgwire rows share the r_jdbc oracles verbatim: the live
    // postgres loads from the SAME fixture parquet DuckDB reads, and
    // the transport must be invisible in the answer
    "r_pgwire_scan" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |WHERE n_regionkey = 2 ORDER BY n_nationkey""".stripMargin,
    "r_pgwire_agg" ->
      """SELECT n_regionkey, count(*)::BIGINT AS n_nations,
        |max(n_nationkey) AS max_key, min(n_nationkey) AS min_key
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "r_pgwire_join" ->
      """SELECT n_nationkey, n_name, count(*)::BIGINT AS n_suppliers,
        |(sum(CAST(s_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "r_jdbc_agg" ->
      """SELECT n_regionkey, count(*)::BIGINT AS n_nations,
        |max(n_nationkey) AS max_key, min(n_nationkey) AS min_key
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "r_jdbc_join" ->
      """SELECT n_nationkey, n_name, count(*)::BIGINT AS n_suppliers,
        |(sum(CAST(s_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey, n_name ORDER BY n_nationkey""".stripMargin,
    "r_jdbc_two_backends" ->
      """SELECT r_regionkey, r_name, count(*)::BIGINT AS n_customers,
        |(sum(CAST(c_acctbal AS DECIMAL(18,2))))::DOUBLE AS sum_acctbal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_regionkey, r_name ORDER BY r_regionkey""".stripMargin,
    "r_sql_template" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    // identical SQL by design: the config-boot result must hash-match
    // the code-registered twin
    "r_config_boot" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'F' AND o_totalprice > 400000.0
        |ORDER BY o_orderkey""".stripMargin,
    "r_scan_all" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "r_filter_eq_date" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        |FROM orders WHERE o_orderdate = TIMESTAMP '1995-01-01' ORDER BY o_orderkey""".stripMargin,
    "r_fk_lookup" ->
      """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice,
        |l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
        |FROM lineitem WHERE l_orderkey = 7 ORDER BY l_linenumber""".stripMargin,
    "r_point_lookup" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE c_custkey = 42 LIMIT 1""".stripMargin,
    "r_dynamic_proj" ->
      "SELECT c_name FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_name",
    "r_inner_join" ->
      """SELECT o.o_orderkey, l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
        |l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag,
        |l.l_linestatus, l.l_shipdate
        |FROM orders o INNER JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderkey = 7 ORDER BY l.l_linenumber""".stripMargin,
    "r_page_sort" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer ORDER BY c_acctbal, c_custkey LIMIT 20 OFFSET 20""".stripMargin,
    // DuckDB's native row-value comparison IS the keyset predicate —
    // the oracle states the intent; the engine's disjunctive expansion
    // must behave identically (key columns are non-null).
    "r_page_keyset" ->
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
        |FROM customer WHERE (c_acctbal, c_custkey) > (1000.0, 0)
        |ORDER BY c_acctbal, c_custkey LIMIT 20""".stripMargin,
    "r_soql_proj" ->
      "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
    // DuckDB reconstructs the deterministic SObject fixture with a
    // range() generator and applies the same predicate the source
    // compiled into SOQL — the pushdown path is hash-checked end to end.
    "r_soql_pushdown" ->
      """SELECT '001' || lpad(CAST(i AS VARCHAR), 15, '0') AS id,
        |'ACC-' || CAST(i AS VARCHAR) AS accountnumber,
        |'Account ' || CAST(i AS VARCHAR) AS name,
        |CAST(i * 1000 AS DOUBLE) AS annualrevenue
        |FROM range(0, 200) t(i)
        |WHERE i * 1000 >= 50000 AND i * 1000 < 150000
        |ORDER BY id""".stripMargin,
    // Schema-as-data pinned as a VALUES literal: the lineitem schema is
    // part of the table contract (TESTDATA.md), so the oracle hardcodes
    // the expected rows rather than asking DuckDB to mirror Spark's
    // type names.
    "r_desc_table" ->
      """SELECT * FROM (VALUES
        |  ('l_discount', 'double', true),
        |  ('l_extendedprice', 'double', true),
        |  ('l_linenumber', 'int', true),
        |  ('l_linestatus', 'string', true),
        |  ('l_orderkey', 'bigint', true),
        |  ('l_partkey', 'bigint', true),
        |  ('l_quantity', 'double', true),
        |  ('l_returnflag', 'string', true),
        |  ('l_shipdate', 'timestamp_ntz', true),
        |  ('l_suppkey', 'bigint', true),
        |  ('l_tax', 'double', true)
        |) AS t(col_name, data_type, nullable) ORDER BY col_name""".stripMargin,
  )
}
