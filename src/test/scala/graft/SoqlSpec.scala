package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, In, IsNotNull, StringStartsWith}

import graft.sources.{Soql, SoqlWire}

/** Pins the SOQL COMPILATION contract (reference A5,
  * `/root/reference/plugins/salesforce.js:101-116`): the text the
  * connector would hand to `conn.query` is asserted STRING-EXACT
  * against the reference's configured templates
  * (`/root/reference/config.json:54-61`) and against hand-written
  * expectations for the pushdown clauses the reference's template
  * layer cannot even express.
  */
class SoqlSpec extends SparkSpec {
  import spark.implicits._

  private def soql(rows: Int = 200) = spark.read
    .format("graft.sources.SoqlSource")
    .option("object", "account").option("rows", rows.toString).load()

  test("compiles the reference's configured account query byte-exact") {
    // config.json: "accounts": "select id, accountnumber, name from account"
    assert(Soql.compile("account", Seq("id", "accountnumber", "name"), Nil, None)
      == "select id, accountnumber, name from account")
    // config.json: "fromwhat": "select id from $what" with what bound
    assert(Soql.compile("contact", Seq("id"), Nil, None)
      == "select id from contact")
  }

  test("column pruning reaches the compiled SOQL select list") {
    SoqlWire.clear()
    val names = soql().select("id", "name").collect()
    assert(names.length == 200)
    assert(SoqlWire.queries.contains("select id, name from account"),
      s"wire: ${SoqlWire.queries}")
  }

  test("range + prefix filters compile into the SOQL where clause") {
    SoqlWire.clear()
    val q = soql()
      .where(col("annualrevenue") >= 50000.0 &&
        col("name").startsWith("Account 7"))
      .select("id", "name")
    val got = q.collect()
    // prefix "Account 7" matches i=7 and i=70..79; revenue >= 50000
    // drops i=7, leaving the ten ids 70..79
    assert(got.length == 10, s"got ${got.length}")
    val wire = SoqlWire.queries.filter(_.contains("where"))
    assert(wire.exists(w =>
      w.contains("annualrevenue >= 50000.0") &&
        w.contains("name like 'Account 7%'")), s"wire: $wire")
  }

  test("string literals escape quotes the SOQL way") {
    assert(Soql.lit("O'Brien % Co") == "'O\\'Brien % Co'")
    assert(Soql.compileFilter(EqualTo("name", "O'Brien"))
      .contains("name = 'O\\'Brien'"))
    assert(Soql.compileFilter(In("name", Array("a", "b")))
      .contains("name in ('a', 'b')"))
    assert(Soql.compileFilter(IsNotNull("id")).contains("id != null"))
    assert(Soql.compileFilter(StringStartsWith("name", "Acc"))
      .contains("name like 'Acc%'"))
    assert(Soql.compileFilter(GreaterThanOrEqual("annualrevenue", 1.5))
      .contains("annualrevenue >= 1.5"))
  }

  test("limit pushes into SOQL and prunes queryMore batches") {
    SoqlWire.clear()
    val q = soql(rows = 1200).select("id").limit(5)
    assert(q.count() == 5)
    assert(SoqlWire.queries.exists(_.endsWith("limit 5")),
      s"wire: ${SoqlWire.queries}")
    // 1200 rows = 3 batches of 500; limit 5 plans only the first
    assert(soql(rows = 1200).limit(5).rdd.getNumPartitions == 1)
    assert(soql(rows = 1200).select("id").rdd.getNumPartitions == 3)
  }

  test("limit under a pushed filter must not prune batches unsoundly") {
    // the predicate matches only ids >= 600 (batch 1); a row-count
    // batch prefix for limit 5 would plan batch 0 only and return
    // nothing — the planner must keep paging when filters are pushed
    val got = soql(rows = 1200)
      .where(col("annualrevenue") >= 600000.0)
      .select("id").limit(5).collect()
    assert(got.length == 5, s"got ${got.length} rows")
  }

  test("the compiled SOQL appears in the physical plan description") {
    val q = soql().where(col("annualrevenue") < 3000.0).select("id")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("soql_pushdown[select id from account where " +
      "annualrevenue < 3000.0]"), plan)
  }

  test("unpushable predicates stay in Spark as post-filters") {
    // length(name) has no SOQL form here: the scan must not claim it
    val q = soql().where(length(col("name")) === lit(9)).select("id", "name")
    assert(q.collect().forall(_.getString(1).length == 9))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"expected a Spark-side Filter:\n$plan")
  }

  test("r_soql_pushdown gate query matches the fixture arithmetic") {
    val rows = SparkEntry.queries("r_soql_pushdown")(spark, sf)
      .select("id", "annualrevenue").as[(String, Double)].collect()
    assert(rows.length == 100)
    assert(rows.head._1 == f"001${50L}%015d" && rows.head._2 == 50000.0)
    assert(rows.last._2 == 149000.0)
  }
}
