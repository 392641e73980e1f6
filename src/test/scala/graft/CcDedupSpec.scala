package graft

import graft.operators.DedupOps

class CcDedupSpec extends SparkSpec {
  import spark.implicits._

  test("star component keeps only the minimum (greedy would keep two)") {
    // edges (1,3),(2,3): component {1,2,3}; greedy removes only 3
    val pairs = Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = DedupOps.ccSurvivorIds(pairs).as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L))
  }

  test("chain component converges to its minimum across rounds") {
    val pairs = Seq((4L, 5L), (5L, 6L), (6L, 7L), (7L, 8L)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedMinLabels(pairs)
      .as[(Long, Long)].collect().toMap
    assert((4L to 8L).forall(labels(_) == 4L))
  }

  test("disjoint components keep one survivor each") {
    val pairs = Seq((1L, 2L), (10L, 11L), (11L, 12L)).toDF("id_a", "id_b")
    val kept = DedupOps.ccSurvivorIds(pairs).as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 10L))
  }

  test("empty pair set yields no labels (callers keep everything)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupOps.ccSurvivorIds(pairs).count() == 0)
  }
}
