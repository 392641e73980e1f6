package graft

import graft.engine.SqlTemplates
import graft.sources.ExternalJson

class TemplateAndSourceSpec extends SparkSpec {

  test("named template binds values through parameterized SQL") {
    val df = SqlTemplates.named(spark, sf,
      "SELECT c_custkey FROM customer WHERE c_mktsegment = :seg ORDER BY c_custkey",
      Map("seg" -> "BUILDING"))
    assert(df.count() > 0)
  }

  test("named template with a hostile value binds safely (no injection)") {
    val df = SqlTemplates.named(spark, sf,
      "SELECT c_custkey FROM customer WHERE c_mktsegment = :seg",
      Map("seg" -> "x' OR '1'='1"))
    assert(df.count() == 0, "bound value must be data, not SQL")
  }

  test("missing named parameter fails with the reference's message") {
    val e = intercept[IllegalArgumentException] {
      SqlTemplates.named(spark, sf,
        "SELECT 1 FROM customer WHERE c_mktsegment = :seg", Map.empty)
    }
    assert(e.getMessage == """Parameter "seg" is required!""")
  }

  test("positional template binds in order; missing arg names its position") {
    val df = SqlTemplates.positional(spark, sf,
      "SELECT o_orderkey FROM orders WHERE o_orderstatus = ? AND o_totalprice > ?",
      Seq("F", 400000.0))
    assert(df.count() > 0)
    val e = intercept[IllegalArgumentException] {
      SqlTemplates.positional(spark, sf,
        "SELECT 1 FROM orders WHERE o_orderstatus = ? AND o_totalprice > ?",
        Seq("F"))
    }
    assert(e.getMessage == "Missing parameter: p2")
  }

  test("tryQuery wraps failures as the error envelope") {
    assert(SqlTemplates.tryQuery(
      SqlTemplates.named(spark, sf, "SELECT 1 WHERE :x", Map.empty)).isLeft)
    assert(SqlTemplates.tryQuery(
      Tables.load(spark, sf, "region")).isRight)
  }

  test("external JSON materializes as a joinable DataFrame") {
    val df = ExternalJson.fromJsonLines(spark,
      Seq("""{"r_regionkey": 0, "remote_name": "AFRICA-EXT"}""",
        """{"r_regionkey": 1, "remote_name": "AMERICA-EXT"}"""))
    val joined = Tables.load(spark, sf, "region")
      .join(df, "r_regionkey")
    assert(joined.count() == 2)
    assert(joined.columns.contains("remote_name"))
  }

  test("nested external JSON keeps structure") {
    val df = ExternalJson.fromJson(spark,
      """{"country": {"id": "US", "value": "United States"}, "pop": [1, 2, 3]}""")
    val r = df.selectExpr("country.id", "size(pop) AS n").head()
    assert(r.getString(0) == "US" && r.getInt(1) == 3)
  }
}
