package graft

import graft.engine.{ConfigBoot, Namespaces, Router}
import graft.operators.ReferenceOps

/** Declarative boot (reference index.js:106-127): a config.json-shaped
  * catalog registers into Namespaces at startup; dispatch binds `?`
  * positionals from the route and `$var`s from request params, with
  * the examiner's exact fail strings (examiner.js:162-196).
  */
class ConfigBootSpec extends SparkSpec {

  private val cat = ConfigBoot.parse(ReferenceOps.FixtureConfig)

  test("parse extracts databases and their query templates") {
    assert(cat.databases.map(_.name) == Seq("billing"))
    assert(cat.databases.head.dbType == "pg")
    assert(cat.databases.head.queries.map(_.name).sorted ==
      Seq("orders_big", "regions"))
  }

  test("boot registers every declared query at both route shapes") {
    val ns = ConfigBoot.boot(ReferenceOps.FixtureConfig)
    assert(ns.databases == Set("billing"))
    assert(ns.names("billing") == Set("orders_big", "regions"))
    // parameterless template runs at the namespaced AND legacy path
    val viaNs = Router.dispatch(ns, "/q/billing/regions")(spark, sf)
    val viaLegacy = Router.dispatch(ns, "/query/regions")(spark, sf)
    assert(viaNs.toOption.get.count() == 5)
    assert(viaLegacy.toOption.get.count() == 5)
  }

  test("config-declared template matches its code-registered twin") {
    val ns = ConfigBoot.boot(ReferenceOps.FixtureConfig)
    val conf = Router.dispatch(ns, "/q/billing/orders_big/F",
      Map("minp" -> "400000.0"))(spark, sf).toOption.get.collect()
    val code = ReferenceOps.queries("r_sql_template")(spark, sf).collect()
    assert(conf.toSeq == code.toSeq)
  }

  test("positional underflow uses the reference's Missing parameter shape") {
    val ns = ConfigBoot.boot(ReferenceOps.FixtureConfig)
    assert(Router.dispatch(ns, "/q/billing/orders_big",
      Map("minp" -> "400000.0"))(spark, sf) == Left("Missing parameter: p1"))
  }

  test("$var validation byte-matches the examiner fail strings") {
    val ns = ConfigBoot.boot(ReferenceOps.FixtureConfig)
    // missing var — examiner.js:173 (note the embedded newline)
    assert(Router.dispatch(ns, "/q/billing/orders_big/F")(spark, sf) ==
      Left("Parameter \"minp\" is required!\n"))
    // SQL comment ban — examiner.js:178
    assert(Router.dispatch(ns, "/q/billing/orders_big/F",
      Map("minp" -> "1--2"))(spark, sf) ==
      Left("SQL comments are forbidden as inputs."))
    // alphanumeric/UUID gate — examiner.js:183
    assert(Router.dispatch(ns, "/q/billing/orders_big/F",
      Map("minp" -> "1;drop"))(spark, sf) ==
      Left("Query parameters must be alphanumeric."))
    // UUIDs pass the gate (examiner.js:74-76) even where the value is
    // then semantically wrong for the column — validation is syntactic
    assert(ConfigBoot.validateQueryVars(Seq("v"),
      Map("v" -> "2fd61f6c-1d4f-4a0e-9b0a-123456789abc")).isRight)
  }

  test("multiple failing vars accumulate joined by newline") {
    val r = ConfigBoot.validateQueryVars(Seq("a", "b"),
      Map("a" -> "x--y", "b" -> ";"))
    assert(r == Left(
      "SQL comments are forbidden as inputs.\n" +
        "Query parameters must be alphanumeric."))
  }

  test("args on a non-template query fall through to route-not-found") {
    val ns = Namespaces.of("spark", SparkEntry.queries)
    assert(Router.dispatch(ns, "/q/spark/r_scan_all/extra")(spark, sf) ==
      Left("Route not found."))
  }

  test("extra positional segments 404 like the Express exact-match route") {
    val ns = ConfigBoot.boot(ReferenceOps.FixtureConfig)
    // orders_big has arity 1: two positionals never match the route
    assert(Router.dispatch(ns, "/q/billing/orders_big/F/zzz",
      Map("minp" -> "400000.0"))(spark, sf) == Left("Route not found."))
    // parameterless template with any positional: same 404
    assert(Router.dispatch(ns, "/q/billing/regions/x")(spark, sf) ==
      Left("Route not found."))
  }

  test("validateQueryVars properties mirror the examiner gates") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], i: Int): A =
      g.pureApply(Gen.Parameters.default, Seed(i.toLong))
    val okChars = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('_', '.', ' ', '-'))).map(_.mkString)
    (0 until 60).foreach { i =>
      val v = sample(okChars, i)
      val r = ConfigBoot.validateQueryVars(Seq("x"), Map("x" -> v))
      if (v.contains("--"))
        assert(r == Left("SQL comments are forbidden as inputs."))
      else assert(r == Right(Map("x" -> v)))
    }
    // out-of-domain characters always fail the alphanumeric gate
    val bad = Gen.oneOf(';', '\'', '"', '%', '(', ')', '=', '$')
    (0 until 60).foreach { i =>
      val v = sample(okChars, i).filterNot(_ == '-') + sample(bad, 999 + i)
      assert(ConfigBoot.validateQueryVars(Seq("x"), Map("x" -> v)) ==
        Left("Query parameters must be alphanumeric."))
    }
    // rendered templates never contain an unvalidated $var: for any
    // validated assignment, rendering is exact substitution
    (0 until 40).foreach { i =>
      val v = sample(okChars, i)
      if (!v.contains("--")) {
        val ns = ConfigBoot.boot(
          s"""{"databases":[{"name":"d","type":"pg","queries":
             |{"q":"SELECT '$$a' AS echoed"}}]}""".stripMargin)
        val out = Router.dispatch(ns, "/q/d/q", Map("a" -> v))(spark, sf)
        assert(out.isRight, s"render failed for ${v.take(40)}: $out")
        assert(out.toOption.get.head().getString(0) == v)
      }
    }
  }

  test("config-declared FFI route: match, validate, render, fetch") {
    val srv = graft.sources.HttpFixtureServer.start()
    try {
      val ns = ConfigBoot.boot(
        s"""{"externalServices":[{"name":"WorldBank",
           |"baseURI":"${srv.baseUrl}/countries",
           |"routes":[{"method":"get",
           |"localpath":"/countrydata/$$country/$$fromYear/$$toYear",
           |"path":"/{{ country }}/indicators/NY.GDP.PCAP.CD?format=json&date={{ fromYear }}:{{ toYear }}"}]}]}"""
          .stripMargin.replace("\n", ""))
      assert(ns.ffiServices == Set("WorldBank"))
      val ok = Router.dispatch(ns,
        "/ffi/WorldBank/countrydata/FR/1990/1992")(spark, "")
      val rows = ok.toOption.get.select("country", "year", "value")
        .orderBy("year").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // 'FR' codes 70+82=152 -> 15200 + y%100
      assert(rows == Seq(("FR", 1990L, 15290L), ("FR", 1991L, 15291L),
        ("FR", 1992L, 15292L)))
      // the remote URI actually carried the rendered template
      assert(srv.requests.exists(r =>
        r.contains("/countries/FR/indicators/NY.GDP.PCAP.CD") &&
          r.contains("date=1990:1992")), srv.requests.toString)
      // examiner gates apply to path-segment vars
      assert(Router.dispatch(ns,
        "/ffi/WorldBank/countrydata/F;R/1990/1992")(spark, "") ==
        Left("Query parameters must be alphanumeric."))
      // unknown service / unmatched localpath
      assert(Router.dispatch(ns, "/ffi/Nope/x")(spark, "") ==
        Left("Route not found."))
      assert(Router.dispatch(ns, "/ffi/WorldBank/other/a/b/c")(spark, "") ==
        Left("Route not found."))
      assert(Router.dispatch(ns,
        "/ffi/WorldBank/countrydata/FR/1990")(spark, "") ==
        Left("Route not found."))
    } finally srv.stop()
  }

  test("last-writer-wins bare-name aliasing across config databases") {
    val two =
      """{"databases": [
        |  {"name": "d1", "type": "pg", "queries":
        |    {"q": "SELECT 1 AS one"}},
        |  {"name": "d2", "type": "mysql", "queries":
        |    {"q": "SELECT 2 AS one"}}
        |]}""".stripMargin
    val ns = ConfigBoot.boot(two)
    assert(Router.dispatch(ns, "/q/d1/q")(spark, sf)
      .toOption.get.head().getInt(0) == 1)
    assert(Router.dispatch(ns, "/query/q")(spark, sf)
      .toOption.get.head().getInt(0) == 2)
  }

  test("identifier positions are catalog-validated; value positions " +
      "keep examiner parity") {
    val tpl = "select $x from $y where $z = '$q'"
    def run(vals: (String, String)*) =
      ConfigBoot.run(spark, sf, tpl, Seq.empty, vals.toMap)
    // catalog-legal identifiers render through the splice
    val ok = run("x" -> "c_name", "y" -> "customer",
      "z" -> "c_mktsegment", "q" -> "BUILDING")
    assert(ok.columns.toSeq == Seq("c_name"))
    assert(ok.count() > 0)
    // an alnum-PASSING multi-token splice in a column position (the
    // examiner's domain includes space — examiner.js:36) is rejected
    // by the stronger identifier standard
    val e1 = intercept[IllegalArgumentException] {
      run("x" -> "1 or 1", "y" -> "customer",
        "z" -> "c_mktsegment", "q" -> "BUILDING")
    }
    assert(e1.getMessage.contains("Invalid identifier"))
    // same for a multi-token TABLE splice: caught by the catalog
    val e2 = intercept[IllegalArgumentException] {
      run("x" -> "c_name", "y" -> "customer extra",
        "z" -> "c_mktsegment", "q" -> "BUILDING")
    }
    assert(e2.getMessage.contains("Unknown table"))
    // a single-token but unknown column is caught against the live
    // schema of the (validated) $y relation
    val e3 = intercept[IllegalArgumentException] {
      run("x" -> "c_name", "y" -> "customer",
        "z" -> "no_such_col", "q" -> "BUILDING")
    }
    assert(e3.getMessage.contains("Unknown column"))
    // VALUE positions keep exact reference parity: the quoted literal
    // renders even multi-token (and simply matches nothing) ...
    val v = run("x" -> "c_name", "y" -> "customer",
      "z" -> "c_mktsegment", "q" -> "1 or 1")
    assert(v.count() == 0)
    // ... and the fixture template's numeric value-position $minp
    // (right operand, dotted decimal) is untouched by the hardening
    val minp = ConfigBoot.run(spark, sf,
      "SELECT o_orderkey FROM orders WHERE o_totalprice > $minp",
      Seq.empty, Map("minp" -> "400000.0"))
    assert(minp.count() > 0)
  }

  test("identifierVars classifies table/column/value positions") {
    val (t1, c1) = ConfigBoot.identifierVars(
      "select $x from $y where $z = '$q' order by $o")
    assert(t1 == Set("y"))
    assert(c1 == Set("x", "z", "o"))
    // right operands and quoted literals are VALUES, not identifiers
    val (t2, c2) = ConfigBoot.identifierVars(
      "SELECT a FROM orders WHERE o_totalprice > $minp AND o_name = '$n'")
    assert(t2.isEmpty && c2.isEmpty)
    // JOIN position is a table identifier
    val (t3, _) = ConfigBoot.identifierVars(
      "SELECT a FROM orders JOIN $other ON x = y")
    assert(t3 == Set("other"))
  }

  test("identifierVars covers nested and union select-list segments") {
    // every select-list segment is scanned, not just the first: a $var
    // in a union arm or a subquery's list is an identifier position
    val (_, cu) = ConfigBoot.identifierVars(
      "SELECT a FROM orders UNION SELECT $u FROM customer")
    assert(cu == Set("u"))
    val (_, cn) = ConfigBoot.identifierVars(
      "SELECT a FROM (SELECT $inner FROM orders) z")
    assert(cn == Set("inner"))
    // documented VALUE positions stay values: quoted literal in a
    // union arm, unquoted right operand, function argument
    val (_, cv) = ConfigBoot.identifierVars(
      "SELECT a FROM orders UNION SELECT '$q' FROM customer " +
        "WHERE x = $rhs AND f($arg) > 0")
    assert(cv.isEmpty)
  }
}
