package graft

import graft.operators.GraphOps

/** Triangle census: hand-verifiable graphs first, then the degree-
  * ordered orientation checked against an independent brute-force
  * closure on the fixture co-purchase graph.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private def stats(edges: Seq[(Long, Long)]) =
    GraphOps.triangleStats(edges.toDF("u", "v")).collect().head

  test("K4 has 4 triangles, 12 wedges") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val r = stats(k4)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((4L, 6L, 12L, 4L)))
  }

  test("a path has wedges but no triangles; a star has none of either kind closed") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val p = stats(path)
    assert((p.getLong(2), p.getLong(3)) === ((2L, 0L)))
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val s = stats(star)
    assert((s.getLong(2), s.getLong(3)) === ((6L, 0L)))
  }

  test("skewed hub: orientation still counts each triangle once") {
    // hub 1 connected to 2..8, plus rim edges (2,3) and (5,6): exactly
    // two triangles through the hub, none elsewhere
    val hub = (2L to 8L).map(x => (1L, x)) ++ Seq((2L, 3L), (5L, 6L))
    val r = stats(hub)
    assert(r.getLong(3) === 2L)
  }

  test("mega-baskets are dropped before pair generation") {
    // order 1: 40 sampled parts (over MaxBasket) -> contributes NOTHING;
    // order 2: parts {4, 8, 12} -> exactly 3 edges
    val li = ((1 to 40).map(i => (1L, i * 4L)) ++
      Seq((2L, 4L), (2L, 8L), (2L, 12L)))
      .toDF("l_orderkey", "l_partkey")
    val es = GraphOps.coPurchaseEdges(li).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(es === Set((4L, 8L), (4L, 12L), (8L, 12L)))
  }

  test("degree-ordered count equals brute-force closure on the fixture graph") {
    val edges = GraphOps.coPurchaseEdges(Tables.load(spark, sf, "lineitem"))
    val es = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = es.toSet
    // count (not a for-yield over the successor SET, which would dedup
    // the per-edge matches down to one)
    val succ = es.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val brute = es.iterator.map { case (u, v) =>
      succ.getOrElse(v, Set.empty[Long]).count(w => adj.contains((u, w)))
    }.sum.toLong
    val r = GraphOps.triangleStats(edges).collect().head
    assert(r.getLong(3) === brute)
    // edge invariants the oracle depends on: u < v, no duplicates
    assert(es.forall { case (u, v) => u < v })
    assert(es.length === es.distinct.length)
  }
}
