package graft

import graft.operators.GraphOps
import org.apache.spark.sql.functions._

/** pageRank against closed-form graphs: a k-regular graph's PageRank
  * is exactly uniform at every iteration (each node receives k
  * contributions of r/k), a star concentrates rank at the hub, and
  * the decimal-accumulated sums make the result independent of input
  * partitioning.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def edges(rows: (Long, Long)*) = rows.toDF("u", "v")

  test("ring graph: uniform rank is the fixed point, exactly") {
    // 4-cycle: 2-regular, so r/deg contributions keep ranks at 1/4
    // through every iteration — and 0.25 is exactly representable, so
    // the equality is bitwise, not approximate
    val r = GraphOps.pageRank(edges(0L -> 1L, 1L -> 2L, 2L -> 3L, 0L -> 3L))
      .collect()
    assert(r.length === 4)
    r.foreach(row => assert(row.getDouble(1) === 0.25))
  }

  test("star graph: the hub outranks every leaf and mass is conserved") {
    val r = GraphOps.pageRank(
      edges(0L -> 1L, 0L -> 2L, 0L -> 3L, 0L -> 4L))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    val hub = r(0L)
    (1L to 4L).foreach(leaf => assert(hub > r(leaf)))
    // synchronous PageRank without dangling nodes conserves total mass
    // up to the per-iteration 12-dp rounding
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // leaves are symmetric — identical rank, exactly
    assert((1L to 4L).map(r).distinct.size === 1)
  }

  test("result is independent of input partitioning") {
    val docs = Tables.load(spark, sf, "lineitem")
    val e = GraphOps.coPurchaseEdges(docs)
    val a = GraphOps.pageRank(e).collect().toSeq
    val b = GraphOps.pageRank(e.repartition(7, col("u"))).collect().toSeq
    assert(a === b)
  }

  private def dedges(rows: (Long, Long)*) = rows.toDF("src", "dst")

  test("dangling redistribution: uncrawled targets rank, mass conserves, " +
      "and the 2-node closed form matches by hand") {
    // 0 → 1, node 1 dangling. n=2, d=0.85, base=0.075.
    // r0 = (.5, .5); r1(0) = .075 + .85·(0 + .5/2) = 0.28750,
    // r1(1) = .075 + .85·(.5/1 + .5/2) = 0.71250
    // r2: D = r1(1) = .7125 → r2(0) = .075 + .85·(.35625) = 0.3778125,
    // r2(1) = .075 + .85·(.2875 + .35625) = 0.6221875
    // r3: D = .6221875 → r3(0) = .075 + .85·(.31109375) = 0.339429688
    // (12-dp), r3(1) = .075 + .85·(.3778125 + .31109375) = 0.660570313
    val r = GraphOps.pageRankDangling(dedges(0L -> 1L))
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    assert(r.keySet == Set(0L, 1L), "the uncrawled target must be ranked")
    assert(math.abs(r(0L) - 0.339429688) < 1e-9, s"r(0) = ${r(0L)}")
    assert(math.abs(r(1L) - 0.660570313) < 1e-9, s"r(1) = ${r(1L)}")
    // dangling redistribution conserves total mass (up to 12-dp rounds)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("a graph with no dangling nodes: pageRankDangling equals " +
      "pageRankDirected on the shared node set") {
    // 3-cycle: every node has out-edges, D = 0 every iteration
    val e = dedges(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val a = GraphOps.pageRankDangling(e).collect().toSeq
    val b = GraphOps.pageRankDirected(e).collect().toSeq
    assert(a === b)
  }

  test("dangling gate row: genuine dangling nodes exist in the fixture " +
      "and the result is partitioning-invariant") {
    val e = graft.operators.DomainOps.linkEdgesWithUrl(spark, sf)
      .where(pmod(col("src_doc"), lit(3L)) =!= 0)
      .select(col("src_doc").as("src"), col("dst_doc").as("dst"))
    val srcs = e.select("src").distinct()
    val dangling = e.select(col("dst").as("src")).distinct()
      .exceptAll(srcs).count()
    assert(dangling > 0, "fixture must contain uncrawled link targets")
    val a = GraphOps.pageRankDangling(e).collect().toSeq
    val b = GraphOps.pageRankDangling(e.repartition(7, col("src")))
      .collect().toSeq
    assert(a === b)
  }
}
