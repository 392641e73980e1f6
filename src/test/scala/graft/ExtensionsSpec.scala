package graft

import org.apache.spark.sql.functions._
import graft.functions.{RollingHash, TextShingles}
import graft.plans.GraftExtensions

/** The SparkSessionExtensions entry point: injected functions must
  * resolve in plain SQL and agree exactly with their Column-API forms
  * (which the DuckDB oracles already pin).
  */
class ExtensionsSpec extends SparkSpec {

  private def inject(): Unit = GraftExtensions.install(spark)

  test("withExtensions path injects into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // reuses the shared SparkContext; extensions apply to the new
      // session only — exactly what spark.sql.extensions would do
      val s2 = SparkSession.builder().master("local[4]")
        .withExtensions(new GraftExtensions()).getOrCreate()
      val h = s2.sql("SELECT md5_hash60('abc') h").head().getLong(0)
      val want = s2.range(1)
        .select(TextShingles.md5Hash60(lit("abc"))).head().getLong(0)
      assert(h == want)
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prev.foreach(SparkSession.setDefaultSession)
    }
  }

  test("injected SQL functions match the Column-API implementations") {
    inject()
    val r = spark.sql(
      "SELECT md5_hash60('abc') h, rolling_hash('abc') rh, graft_shard('abc', 64) s"
    ).head()
    val viaColumns = spark.range(1)
      .select(TextShingles.md5Hash60(lit("abc")).as("h")).head().getLong(0)
    assert(r.getLong(0) == viaColumns)
    assert(r.getLong(1) == RollingHash.reference("abc"))
    assert(r.getLong(2) == viaColumns % 64)
  }

  test("blocklist_hits resolves in SQL and matches the Column form") {
    inject()
    val r = spark.sql(
      "SELECT blocklist_hits('the the key value store', " +
        "array('the the', 'key value', 'low')) ids").head()
    assert(r.getSeq[Int](0) == Seq(0, 1))
    // non-literal phrase array must be rejected at plan time
    val e = intercept[Exception] {
      Tables.load(spark, sf, "documents").createOrReplaceTempView("docs_bl")
      spark.sql("SELECT blocklist_hits(text, array(text)) FROM docs_bl")
        .head()
    }
    assert(e.getMessage.contains("foldable"))
  }

  test("injected functions run over a table scan with codegen intact") {
    inject()
    Tables.load(spark, sf, "documents").createOrReplaceTempView("docs_ext")
    val df = spark.sql(
      """SELECT doc_id, md5_hash60(text) h, graft_shard(text, 16) shard
        |FROM docs_ext""".stripMargin)
    // native Catalyst nodes: the whole projection stays in one
    // WholeStageCodegen span (a UDF here would split it)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"), s"expected codegen'd projection in:\n$p")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) == ((r.getLong(1) % 16) + 16) % 16)
    }
    // cross-check one row against the Column-API hash
    val want = Tables.load(spark, sf, "documents")
      .select(TextShingles.md5Hash60(col("text"))).head().getLong(0)
    assert(rows.head.getLong(1) == want)
  }
}
