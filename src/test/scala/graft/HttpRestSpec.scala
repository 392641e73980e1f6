package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sources.HttpFixtureServer

/** The LIVE half of the external-service federation story (reference A4,
  * /root/reference/index.js:327-366): [[graft.sources.RestLikeSource]]
  * in `baseUrl` mode issues REAL executor-side HTTP GETs against a
  * loopback [[HttpFixtureServer]], and the server's request log lets us
  * assert what actually crossed the wire — pushed filters as query
  * params, page pruning as absent requests, complete aggregate pushdown
  * as a single metadata call with ZERO data pages.
  */
class HttpRestSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private var server: HttpFixtureServer = _

  override def beforeAll(): Unit = {
    server = HttpFixtureServer.start()
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop()
  }

  private def live: DataFrame = spark.read
    .format("graft.sources.RestLikeSource")
    .option("pages", "4").option("pageSize", "250")
    .option("baseUrl", server.baseUrl).load()

  private def synthetic: DataFrame = spark.read
    .format("graft.sources.RestLikeSource")
    .option("pages", "4").option("pageSize", "250").load()

  private def dataPages(reqs: Seq[String]): Seq[String] =
    reqs.filter(_.startsWith("/items?"))

  test("live HTTP scan matches the synthetic generator exactly") {
    val a = live.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    val b = synthetic.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long].toString)
    assert(a.length == 1000)
    // element-wise, including the double score: the JSON hop must be
    // bit-exact (Double.toString shortest round-trip repr)
    assert(a.toSeq == b.toSeq)
  }

  test("pushed id filters travel as query-string params") {
    val before = server.requests.size
    val got = live.where(col("id") > 750L && col("id") < 760L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got == (751L to 759L))
    val wire = dataPages(server.requests.drop(before))
    // only page 3 (ids 750-999) survives pruning → exactly one fetch,
    // carrying the interval as min/max params
    assert(wire.size == 1, s"expected one data-page fetch, saw: $wire")
    assert(wire.head.contains("page=3"), wire.head)
    assert(wire.head.contains("min=751") && wire.head.contains("max=759"),
      s"pushed filters must reach the service as params: ${wire.head}")
  }

  test("point lookup fetches one page with min=max") {
    val before = server.requests.size
    val r = live.where(col("id") === 500L).head()
    assert(r.getString(1) == "item_500")
    val wire = dataPages(server.requests.drop(before))
    assert(wire.size == 1 && wire.head.contains("min=500") &&
      wire.head.contains("max=500"), s"wire: $wire")
  }

  test("complete aggregate pushdown issues one metadata call, zero data pages") {
    val before = server.requests.size
    val r = live.where(col("id") > 100L)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
      .head()
    assert(r.getLong(0) == 899L && r.getLong(1) == 101L && r.getLong(2) == 999L)
    val reqs = server.requests.drop(before)
    assert(dataPages(reqs).isEmpty,
      s"aggregate must not page data over HTTP: $reqs")
    val meta = reqs.filter(_.startsWith("/items/count?"))
    assert(meta.size == 1 && meta.head.contains("min=101"), s"meta: $meta")
  }

  test("64 page partitions fetch in parallel through the 4-thread server") {
    // many concurrent executor-side GETs against a small server pool:
    // requests queue rather than fail, every page arrives exactly once
    val before = server.requests.size
    val wide = spark.read
      .format("graft.sources.RestLikeSource")
      .option("pages", "64").option("pageSize", "50")
      .option("baseUrl", server.baseUrl).load()
    // a bare count() would collapse to the pushed metadata call (zero
    // data pages — by design); collect ids to force real page fetches
    val ids = wide.select("id").as[Long].collect()
    assert(ids.length == 3200 && ids.toSet.size == 3200)
    val wire = dataPages(server.requests.drop(before))
    // assert page COVERAGE (distinct set == 0..63), not an exact
    // request count: a Spark task retry or speculative duplicate would
    // legitimately re-fetch a page and must not fail the suite — the
    // result correctness above already proves no page was double-counted
    val pages = wire.map(u =>
      "page=(\\d+)".r.findFirstMatchIn(u).get.group(1).toInt)
    assert(pages.toSet == (0 until 64).toSet,
      s"every page must be fetched at least once: ${pages.sorted}")
  }

  test("ExternalJson.fetch materializes a remote JSON page") {
    val df = graft.sources.ExternalJson.fetch(spark,
      s"${server.baseUrl}/items?page=0&pageSize=3")
    assert(df.count() == 3)
    assert(df.columns.sorted.toSeq == Seq("id", "name", "score"))
    assert(df.where(col("id") === 2L).head().getAs[String]("name") == "item_2")
  }

  test("HTTP errors surface the remote's error envelope, not a bare IOException") {
    val e = intercept[IllegalStateException] {
      graft.sources.RestHttp.get(s"${server.baseUrl}/items?min=5")
    }
    assert(e.getMessage.contains("HTTP 400"), e.getMessage)
    assert(e.getMessage.contains("page and pageSize are required"),
      s"the remote's reason must reach the caller: ${e.getMessage}")
  }

  test("live relation joins with parquet tables") {
    val local = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name"))
    assert(live.join(local, "id").count() == 150)
  }
}
