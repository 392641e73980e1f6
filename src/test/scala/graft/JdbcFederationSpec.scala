package graft

import org.apache.spark.sql.functions._

import graft.engine.Namespaces
import graft.operators.ReferenceOps
import graft.sources.JdbcFederation

/** The federated JDBC backend (embedded Derby standing in for the
  * reference's second RDBMS — index.js:230-252) must behave like any
  * other source: same rows as the fixture parquet, filters compiled
  * into the remote query, dim side broadcast into cross-backend joins.
  */
class JdbcFederationSpec extends SparkSpec {

  test("federated dims round-trip the fixture parquet exactly") {
    for (t <- Seq("nation", "region")) {
      val viaJdbc = JdbcFederation.readTable(spark, sf, t)
      val viaParquet = Tables.load(spark, sf, t)
      assert(viaJdbc.columns.toSeq == viaParquet.columns.toSeq)
      assert(viaJdbc.count() == viaParquet.count())
      assert(viaJdbc.exceptAll(viaParquet).isEmpty &&
        viaParquet.exceptAll(viaJdbc).isEmpty, s"$t differs across backends")
    }
  }

  test("equality filter is pushed into the JDBC scan, not applied in Spark") {
    val df = JdbcFederation.readTable(spark, sf, "nation")
      .where(col("n_regionkey") === lit(2))
      .select("n_nationkey", "n_name")
    val plan = df.queryExecution.executedPlan.toString
    // RowDataSourceScanExec advertises what the remote engine received;
    // the filter must appear there — the RDBMS ships 5 rows, not 25.
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(n_regionkey,2)"),
      s"filter did not reach the JDBC source:\n$plan")
    // column pruning reaches the remote SELECT list too
    assert(plan.contains("ReadSchema:") && !plan.contains("n_comment"))
    assert(df.count() == 5)
  }

  test("cross-backend join broadcasts the JDBC dim (no shuffle of the fact)") {
    val joined = ReferenceOps.queries("r_jdbc_join")(spark, sf)
    val r = graft.engine.PlanAudit.audit(joined)
    assert(r.broadcasts == 1, s"expected the 25-row JDBC dim broadcast: ${r.render}")
    assert(joined.count() > 0)
  }

  test("nation and region live in DIFFERENT backend databases") {
    val uNation = graft.sources.JdbcFederation.ensureLoaded(spark, sf, "nation")
    val uRegion = graft.sources.JdbcFederation.ensureLoaded(spark, sf, "region")
    assert(uNation != uRegion,
      "the two dims must come from two distinct JDBC catalogs")
    // each backend only knows its own tables — reading region from the
    // nation backend must fail at the remote engine
    val cross = intercept[Exception] {
      spark.read.format("jdbc").option("url", uNation)
        .option("dbtable", "\"region\"").load().collect()
    }
    assert(cross.getMessage != null)
  }

  test("three engines in one plan: two JDBC backends + parquet fact") {
    val df = ReferenceOps.queries("r_jdbc_two_backends")(spark, sf)
    val r = graft.engine.PlanAudit.audit(df)
    assert(r.broadcasts == 2,
      s"both remote dims must broadcast (RDBMS read once each): ${r.render}")
    // cross-check against the same query computed all-parquet
    val n = Tables.load(spark, sf, "nation")
    val c = Tables.load(spark, sf, "customer")
    val reg = Tables.load(spark, sf, "region")
    val expect = c.join(n, c("c_nationkey") === n("n_nationkey"))
      .join(reg, n("n_regionkey") === reg("r_regionkey"))
      .groupBy(reg("r_regionkey"), reg("r_name"))
      .agg(count(lit(1)).as("n_customers"),
        graft.Num.dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_regionkey")
    assert(df.collect().toSeq == expect.collect().toSeq,
      "federated result must equal the all-parquet computation")
  }

  test("range-parallel JDBC read splits the remote table across partitions") {
    // the big-table scale path from the README: partitionColumn bounds
    // issue one ranged remote query per partition. The 25-row dim
    // doesn't need it — this pins that the mechanics WORK against the
    // embedded backend so the option set is known-good when the URL
    // points at a real RDBMS with a 10^9-row table.
    val u = graft.sources.JdbcFederation.ensureLoaded(spark, sf)
    val df = spark.read.format("jdbc")
      .option("url", u)
      .option("dbtable", "\"nation\"")
      .option("partitionColumn", "n_nationkey")
      .option("lowerBound", "0").option("upperBound", "25")
      .option("numPartitions", "4")
      .load()
    assert(df.rdd.getNumPartitions == 4, "expected 4 ranged JDBC partitions")
    val viaParquet = Tables.load(spark, sf, "nation")
    assert(df.count() == 25 &&
      df.exceptAll(viaParquet).isEmpty && viaParquet.exceptAll(df).isEmpty,
      "ranged partitions must cover the table exactly once")
  }

  test("the second backend mounts as a namespace beside the parquet one") {
    // the reference federates heterogeneous backends under one route
    // space (/q/<db>/<query>, index.js:318-324); mounting the JDBC
    // catalog beside the parquet one exercises the same contract
    val ns = Namespaces.of("pgmain", Map(
      "regions" -> ReferenceOps.queries("r_scan_all")))
    ns.register("derbydim",
      graft.engine.NamedQuery("nations",
        (s, d) => JdbcFederation.readTable(s, d, "nation"), None))
    assert(ns.databases == Set("pgmain", "derbydim"))
    val viaRoute = graft.engine.Router
      .dispatch(ns, "/q/derbydim/nations")(spark, sf)
    assert(viaRoute.toOption.get.count() == 25)
  }

  test("the two backends resolve to two DISTINCT JdbcDialects in one plan") {
    import org.apache.spark.sql.jdbc.JdbcDialects
    JdbcFederation.ensureLoaded(spark, sf, "region") // registers the dialect
    val pgDialect = JdbcDialects.get(JdbcFederation.backendUrl(sf, "nation"))
    val myDialect = JdbcDialects.get(JdbcFederation.backendUrl(sf, "region"))
    // the mysqlmain URL selects the custom dialect (Spark folds it with
    // the engine's base dialect into an AggregatedDialect, custom
    // first); the pgmain URL must NOT see the custom mapping
    val bigint = java.sql.Types.BIGINT
    val mb = () => new org.apache.spark.sql.types.MetadataBuilder()
    assert(myDialect.getCatalystType(bigint, "BIGINT", 8, mb())
      .contains(org.apache.spark.sql.types.IntegerType),
      s"mysqlmain dialect must carry the custom BIGINT mapping: $myDialect")
    assert(myDialect != pgDialect,
      "pgmain and mysqlmain must not share a dialect")
    assert(!pgDialect.getCatalystType(bigint, "BIGINT", 8, mb())
      .contains(org.apache.spark.sql.types.IntegerType),
      "the custom mapping must not leak into the pgmain dialect")
    // the dialect's type mapping does real work: the backend declares
    // r_regionkey BIGINT, the dialect narrows it to the fixture's int32
    val viaJdbc = JdbcFederation.readTable(spark, sf, "region")
    assert(viaJdbc.schema("r_regionkey").dataType ==
      org.apache.spark.sql.types.IntegerType,
      s"dialect must map the backend BIGINT key to int: ${viaJdbc.schema}")
    // and pushdown still compiles into the re-mapped column
    val one = viaJdbc.where(col("r_regionkey") === 2).collect()
    assert(one.length == 1 && one.head.getInt(0) == 2)
  }

  test("K3: a killed backend reconnects exactly once with identical results") {
    // reference parity index.js:96-126 — connection terminated =>
    // reconnect; the kill drops the in-memory db WITHOUT telling the
    // loader cache, so the next read hits a dead connection mid-path
    val before = JdbcFederation.readTable(spark, sf, "nation")
      .orderBy("n_nationkey").collect().toSeq
    val n0 = JdbcFederation.reconnectCount.get()
    JdbcFederation.killBackend(sf, "nation")
    val after = JdbcFederation.readTable(spark, sf, "nation")
      .orderBy("n_nationkey").collect().toSeq
    assert(JdbcFederation.reconnectCount.get() == n0 + 1,
      "one kill must cost exactly one reconnect")
    assert(after == before, "post-reconnect rows must be identical")
  }

  test("grouped aggregate pushes into the remote engine (DSv2 catalog)") {
    val df = JdbcFederation.readTableV2(spark, sf, "nation")
      .groupBy(org.apache.spark.sql.functions.col("n_regionkey"))
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_nations"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("n_nationkey")).as("max_key"))
    val p = df.queryExecution.executedPlan.toString
    // the scan node itself advertises the compiled remote aggregate —
    // the backend ships |groups| summary rows, not the dim
    assert(p.contains("PushedAggregates"),
      s"expected a pushed aggregate on the JDBC scan:\n$p")
    assert(p.contains("MAX") && p.contains("COUNT"),
      s"expected MAX/COUNT compiled into the remote SQL:\n$p")
    assert(p.contains("PushedGroupByExpressions") ||
      p.contains("n_regionkey"),
      s"expected the group key pushed with the aggregate:\n$p")
    // and the answer equals the parquet truth
    val viaJdbc = df.orderBy("n_regionkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    val truth = Tables.load(spark, sf, "nation")
      .groupBy("n_regionkey")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n_nations"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("n_nationkey")).as("max_key"))
      .orderBy("n_regionkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSeq
    assert(viaJdbc == truth)
  }

  test("K3: the DSv2 catalog path reconnects after a backend kill too") {
    val before = JdbcFederation.readTableV2(spark, sf, "nation")
      .orderBy("n_nationkey").collect().toSeq
    val n0 = JdbcFederation.reconnectCount.get()
    JdbcFederation.killBackend(sf, "nation")
    val after = JdbcFederation.readTableV2(spark, sf, "nation")
      .orderBy("n_nationkey").collect().toSeq
    assert(JdbcFederation.reconnectCount.get() == n0 + 1,
      "one kill must cost exactly one reconnect on the V2 lane")
    assert(after == before, "post-reconnect V2 rows must be identical")
  }

  test("K3: non-connection errors propagate without any reconnect") {
    val n0 = JdbcFederation.reconnectCount.get()
    intercept[IllegalArgumentException] {
      JdbcFederation.readTable(spark, sf, "lineitem") // not a federated dim
    }
    assert(JdbcFederation.reconnectCount.get() == n0,
      "a non-connection error must not trigger the reconnect path")
  }
}
