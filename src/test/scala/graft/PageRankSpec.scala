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
}
