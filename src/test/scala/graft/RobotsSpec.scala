package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.DomainOps

/** RFC 9309 robots semantics: agent-group scoping, empty-pattern
  * no-op, longest-match with Allow winning ties, and the default-allow
  * fallback for rule-less domains.
  */
class RobotsSpec extends SparkSpec {

  private val robotsTxt =
    """User-agent: googlebot
      |Disallow: /
      |
      |User-agent: *
      |Disallow: /private/
      |Disallow: /doc/
      |Allow: /doc/open
      |Disallow:
      |""".stripMargin

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  test("parser scopes to the * group and drops the empty pattern") {
    val robots = df(Seq(Row(0L, robotsTxt)), StructType(Seq(
      StructField("h", LongType), StructField("robots_txt", StringType))))
    val rules = DomainOps.parseRobots(robots)
      .select(col("allow"), col("path")).collect()
      .map(r => (r.getBoolean(0), r.getString(1))).toSet
    // googlebot's Disallow: / must NOT appear; the empty Disallow drops
    assert(rules == Set(
      (false, "/private/"), (false, "/doc/"), (true, "/doc/open")))
  }

  test("field names match case-insensitively (RFC 9309 §2.1): " +
      "lowercase/ALL-CAPS/mixed-case lines all parse and scope") {
    val mixed =
      """USER-AGENT: googlebot
        |disallow: /
        |
        |user-agent: *
        |DISALLOW: /private/
        |disallow: /doc/
        |ALLOW: /doc/open
        |Disallow:
        |""".stripMargin
    val robots = df(Seq(Row(0L, mixed)), StructType(Seq(
      StructField("h", LongType), StructField("robots_txt", StringType))))
    val rules = DomainOps.parseRobots(robots)
      .select(col("allow"), col("path")).collect()
      .map(r => (r.getBoolean(0), r.getString(1))).toSet
    // a case-sensitive parser drops every rule here (fails OPEN) and
    // mis-scopes googlebot's block into the * group
    assert(rules == Set(
      (false, "/private/"), (false, "/doc/"), (true, "/doc/open")))
  }

  test("longest match wins and Allow beats Disallow on ties") {
    val robots = df(Seq(Row(0L, robotsTxt)), StructType(Seq(
      StructField("h", LongType), StructField("robots_txt", StringType))))
    val rules = DomainOps.parseRobots(robots)
    val frontier = df(Seq(
      Row(1L, 0L, "/doc/open7"),   // Allow /doc/open (9) > Disallow /doc/ (5)
      Row(2L, 0L, "/doc/d7"),      // Disallow /doc/
      Row(3L, 0L, "/private/x"),   // Disallow /private/
      Row(4L, 0L, "/public/x"),    // no match → allowed
      Row(5L, 9L, "/doc/d7")),     // domain with NO rules → allowed
      StructType(Seq(StructField("doc_id", LongType),
        StructField("h", LongType), StructField("path", StringType))))
    val out = DomainOps.robotsFilter(frontier, rules)
      .select(col("doc_id"), col("allowed")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out == Map(1L -> true, 2L -> false, 3L -> false,
      4L -> true, 5L -> true))
  }

  test("fixture gate: blocked share matches the domain/path arithmetic") {
    val out = SparkEntry.queries("e_robots_filter")(spark, sf)
    // blocked ⟺ /private/ path, or /doc/d path on an h % 3 = 0 domain
    val expectBlocked = out.where(
      col("path").startsWith("/private/") ||
        (col("path").startsWith("/doc/d") &&
          pmod(col("doc_id"), lit(20L)) % 3 === 0))
    assert(out.where(!col("allowed")).count() == expectBlocked.count())
    assert(out.where(!col("allowed") &&
      col("path").startsWith("/doc/open")).isEmpty)
  }
}
