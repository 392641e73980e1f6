package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.{DomainOps, GraphOps}

/** Link extraction + directed PageRank: href resolution semantics,
  * canonicalization of extracted links, and the directed walk's
  * handling of zero-indegree nodes and rank-mass accounting.
  */
class LinkGraphSpec extends SparkSpec {

  private def pagesDf(rows: Seq[(Long, String, String)]) = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("base_url", StringType),
      StructField("html", StringType)))
    spark.createDataFrame(spark.sparkContext.parallelize(
      rows.map { case (i, b, h) => Row(i, b, h) }), schema)
  }

  test("href resolution: root-relative joins the origin, absolute passes, other relative drops") {
    val html = """<p><a href="/x/y?b=2&a=1#f">r</a>""" +
      """<a class="z" href="HTTPS://WWW.Other.COM:443/p/">abs</a>""" +
      """<a href="rel/path">rel</a></p>"""
    val out = DomainOps.linkExtract(
      pagesDf(Seq((1L, "https://Site0.example.org/page/1", html))))
      .select(col("link_url")).collect().map(_.getString(0)).toSeq
    assert(out == Seq(
      // origin lowercased; params sorted; fragment dropped
      "https://site0.example.org/x/y?a=1&b=2",
      // absolute href canonicalized: scheme/host lowered, www + default
      // port + trailing slash dropped
      "https://other.com/p"))
  }

  test("fixture pages: nav links extracted but filtered by the in-corpus scope") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    val edges = SparkEntry.queries("e_link_extract")(spark, sf)
    // out-degree law: 1 + doc_id % 4
    val bad = edges.groupBy("src_doc").agg(count(lit(1)).as("d"))
      .where(col("d") =!= (pmod(col("src_doc"), lit(4L)) + 1))
    assert(bad.isEmpty)
    assert(edges.where(col("dst_doc") >= n || col("dst_doc") < 0).isEmpty)
    // no self-links by construction (13·j ≢ 0 mod n for j ≤ 4, n ≥ 500)
    assert(edges.where(col("src_doc") === col("dst_doc")).isEmpty)
  }

  test("directed PageRank: zero-indegree node settles at base rank; mass accounted") {
    val schema = StructType(Seq(
      StructField("src", LongType), StructField("dst", LongType)))
    // 1 → 2, 2 → 3, 3 → 2: node 1 has indegree 0 (but outdegree 1)
    val edges = spark.createDataFrame(spark.sparkContext.parallelize(
      Seq(Row(1L, 2L), Row(2L, 3L), Row(3L, 2L))), schema)
    val pr = GraphOps.pageRankDirected(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val base = (1.0 - GraphOps.PrDamping) / 3
    assert(math.abs(pr(1L) - base) < 1e-9,
      s"source-only node must hold the base rank, got ${pr(1L)}")
    assert(pr(2L) > pr(1L) && pr(3L) > pr(1L))
  }

  test("directed PageRank is partitioning-invariant on the link graph") {
    val edges = DomainOps.linkEdgesWithUrl(spark, sf)
      .select(col("src_doc").as("src"), col("dst_doc").as("dst"))
    val a = GraphOps.pageRankDirected(edges).collect().toSeq
    val b = GraphOps.pageRankDirected(edges.repartition(11)).collect().toSeq
    assert(a == b)
  }
}
