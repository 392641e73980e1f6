package graft

import graft.engine.{QueryRegistry, Validate}

class RegistrySpec extends SparkSpec {

  test("identifier validation mirrors the reference examiner semantics") {
    assert(Validate.value("abc_1.2 x").isRight)
    assert(Validate.value("2fd61f6c-1d4f-4a0e-9b0a-123456789abc").isRight)
    assert(Validate.value("a--b").isLeft)          // SQL comment ban
    assert(Validate.value("").isLeft)              // required
    assert(Validate.value("x;drop").isLeft)        // out of domain
    assert(Validate.table("customer").isRight)
    assert(Validate.table("pg_shadow").isLeft)
  }

  test("dynamicProjection rejects bad identifiers, resolves good ones") {
    val df = QueryRegistry.dynamicProjection(spark, sf,
      "customer", "c_name", "c_mktsegment", "BUILDING")
    assert(df.columns.toSeq == Seq("c_name"))
    assert(df.count() > 0)
    intercept[IllegalArgumentException] {
      QueryRegistry.dynamicProjection(spark, sf, "customer", "nope", "c_mktsegment", "B")
    }
    intercept[IllegalArgumentException] {
      QueryRegistry.dynamicProjection(spark, sf, "orders; drop", "o_orderkey", "o_orderstatus", "O")
    }
  }

  test("recordList clamps perpage to [1,1000] and floors page at 1") {
    assert(QueryRegistry.recordList(spark, sf, "customer", 1, 5000, Seq("c_custkey")).count() == 150)
    assert(QueryRegistry.recordList(spark, sf, "customer", 1, -2, Seq("c_custkey")).count() == 1)
    val p0 = QueryRegistry.recordList(spark, sf, "customer", 0, 5, Seq("c_custkey"))
      .collect().map(_.getLong(0)).toSeq
    val p1 = QueryRegistry.recordList(spark, sf, "customer", 1, 5, Seq("c_custkey"))
      .collect().map(_.getLong(0)).toSeq
    assert(p0 == p1)
  }

  test("pages partition the ordered relation (concatenation = full sort)") {
    val all = QueryRegistry.recordList(spark, sf, "nation", 1, 1000, Seq("n_nationkey"))
      .collect().map(_.getInt(0)).toSeq
    val paged = (1 to 5).flatMap(p =>
      QueryRegistry.recordList(spark, sf, "nation", p, 5, Seq("n_nationkey"))
        .collect().map(_.getInt(0)))
    assert(paged == all && all == (0 until 25))
  }

  test("keyset pagination continues exactly after the last key") {
    val page = QueryRegistry.recordListAfter(spark, sf, "customer", "c_custkey", 10L, 5)
      .collect().map(_.getLong(0)).toSeq
    assert(page == Seq(11L, 12L, 13L, 14L, 15L))
  }

  test("composite keyset pages chain via the cursor and tile the sort") {
    val keys = Seq("c_acctbal", "c_custkey")
    // walk three pages from the beginning via cursors
    var after: Seq[(String, Any)] = Seq("c_acctbal" -> -100000.0, "c_custkey" -> 0L)
    val walked = (1 to 3).flatMap { _ =>
      val page = QueryRegistry.recordListAfterKeys(spark, sf, "customer", after, 7)
      after = QueryRegistry.nextPageCursor(page, keys).get
      page.select("c_custkey").collect().map(_.getLong(0))
    }
    // the walk must equal the first 21 rows of the global sort
    val expected = Tables.load(spark, sf, "customer")
      .orderBy("c_acctbal", "c_custkey")
      .select("c_custkey").limit(21).collect().map(_.getLong(0)).toSeq
    assert(walked.toSeq == expected)
    // empty page → no cursor → pagination terminates
    val empty = QueryRegistry.recordListAfterKeys(spark, sf, "customer",
      Seq("c_acctbal" -> 1e12, "c_custkey" -> 0L), 7)
    assert(QueryRegistry.nextPageCursor(empty, keys).isEmpty)
  }

  test("describe exposes analyzed schemas for every query") {
    val d = QueryRegistry.describe(spark, sf,
      Map("one" -> ((s, dir) => Tables.load(s, dir, "region"))))
    val row = d.head()
    assert(row.getString(0) == "one" && row.getInt(1) == 2)
    assert(row.getString(2).contains("r_regionkey:int"))
  }

  test("legacy alias namespace: bare name is last-writer-wins across dbs") {
    import graft.engine.{NamedQuery, Namespaces}
    val ns = new Namespaces
    val regions = NamedQuery("lookup", (s, d) => Tables.load(s, d, "region"), None)
    val nations = NamedQuery("lookup", (s, d) => Tables.load(s, d, "nation"), None)
    ns.register("pgdb", regions)
    ns.register("mydb", nations)
    // namespaced lookups stay unambiguous (/q/<db>/<qname>)
    assert(ns.lookup("pgdb", "lookup").get.build(spark, sf).count() == 5)
    assert(ns.lookup("mydb", "lookup").get.build(spark, sf).count() == 25)
    // bare-name lookup (/query/<qname>) resolves to the LAST registration
    assert(ns.lookupLegacy("lookup").get.build(spark, sf).count() == 25)
    // re-registering flips the alias back — last writer wins, always
    ns.register("pgdb", regions)
    assert(ns.lookupLegacy("lookup").get.build(spark, sf).count() == 5)
    assert(ns.lookup("mydb", "lookup").get.build(spark, sf).count() == 25)
    assert(ns.databases == Set("pgdb", "mydb") && ns.legacyNames == Set("lookup"))
  }

  test("the full catalog mounts as a namespace with legacy aliases") {
    import graft.engine.Namespaces
    val ns = Namespaces.of("spark", SparkEntry.queries, SparkEntry.oracleSql)
    assert(ns.names("spark") == SparkEntry.queries.keySet)
    assert(ns.legacyNames == SparkEntry.queries.keySet)
    assert(ns.lookup("spark", "r_scan_all").get.oracle.isDefined)
    assert(ns.lookupLegacy("nope").isEmpty)
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("the catalog oracle VALUES literal matches the analyzed schemas") {
    // r_catalog's oracle is a hand-regenerated VALUES block; drift
    // (adding a query without its row, or changing a schema) must fail
    // HERE, not at driver verify time
    val sql = SparkEntry.oracleSql("r_catalog")
    val rowRe = """\('([^']+)', (\d+), '([^']*)'\)""".r
    val expected = rowRe.findAllMatchIn(sql)
      .map(m => (m.group(1), m.group(2).toInt, m.group(3))).toSeq.sortBy(_._1)
    val actual = SparkEntry.queries("r_catalog")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sortBy(_._1)
    val onlyOracle = expected.map(_._1).toSet -- actual.map(_._1).toSet
    val onlyActual = actual.map(_._1).toSet -- expected.map(_._1).toSet
    assert(onlyOracle.isEmpty && onlyActual.isEmpty,
      s"catalog oracle drift — missing rows for: $onlyActual, stale rows: $onlyOracle")
    expected.zip(actual).foreach { case (e, a) =>
      assert(e == a, s"catalog row mismatch for ${e._1}: oracle=$e analyzed=$a")
    }
  }

  test("router dispatches both route shapes with the reference envelope") {
    import graft.engine.{Namespaces, Router}
    val ns = Namespaces.of("spark", SparkEntry.queries)
    // namespaced and legacy paths execute the same query
    val viaNs = Router.dispatch(ns, "/q/spark/r_scan_all")(spark, sf)
    val viaLegacy = Router.dispatch(ns, "/query/r_scan_all")(spark, sf)
    assert(viaNs.toOption.get.count() == 5)
    assert(viaLegacy.toOption.get.count() == 5)
    // error strings: unknown db byte-matches the reference; unknown
    // query and malformed route use the documented envelope messages
    assert(Router.dispatch(ns, "/q/nodb/r_scan_all")(spark, sf) ==
      Left("Database not found."))
    assert(Router.dispatch(ns, "/q/spark/nope")(spark, sf) ==
      Left("Query \"nope\" not found."))
    assert(Router.dispatch(ns, "/query/nope")(spark, sf) ==
      Left("Query \"nope\" not found."))
    assert(Router.dispatch(ns, "/what/ever/else/x")(spark, sf) ==
      Left("Route not found."))
  }
}
