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

  test("cluster-canonical minhash dedup keeps a subset of the " +
      "pair-greedy survivors on the fixture") {
    // greedy drops the larger id of each verified pair; canonical
    // keeps only component minima. A component minimum is never the
    // larger id of any pair, so canonical ⊆ greedy — and the star
    // divergence (test above) is where the containment is strict.
    val cc = SparkEntry.queries("e_dedup_minhash_cc")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val greedy = SparkEntry.queries("e_dedup_minhash_md5")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(cc.nonEmpty && cc.subsetOf(greedy))
  }

  test("empty pair set yields no labels (callers keep everything)") {
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupOps.ccSurvivorIds(pairs).count() == 0)
  }

  test("200-node chain converges within the round cap (pointer jumping)") {
    // diameter 199 — one-hop neighbor-min propagation would need 199
    // rounds; path compression must close it within the 20-round cap
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = DedupOps.connectedMinLabels(pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.size == 200 && labels.values.forall(_ == 0L))
  }

  test("one Spark action per propagation round (count rides the checkpoint)") {
    // single edge {1,2}: round 1 relabels 2→1, round 2 confirms fixpoint
    // — exactly 2 rounds. Job-running actions: 1 init checkpoint + ONE
    // eager checkpoint per round (the accumulator tally rides it) + the
    // final collect = 4. The old formulation ran a separate
    // join-of-two-checkpoints count per round (6 for the same run).
    // Count DISTINCT sql execution ids that start jobs: raw job counts
    // are useless (AQE runs each shuffle stage as its own job).
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val id = js.properties.getProperty("spark.sql.execution.id")
        execs.add(if (id == null) s"rdd-job-${js.jobId}" else id)
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
      DedupOps.connectedMinLabels(pairs).collect()
      // the listener bus is asynchronous — poll until the count settles
      var last = -1; var cur = execs.size
      val deadline = System.nanoTime + 5_000_000_000L
      while (cur != last && System.nanoTime < deadline) {
        last = cur; Thread.sleep(300)
        cur = execs.size
      }
      assert(cur > 0 && cur <= 4,
        s"expected ≤4 job-running actions for a 2-round CC run " +
          s"(init + one checkpoint/round + collect), saw $cur")
    } finally sc.removeSparkListener(listener)
  }

  test("registered e_dedup_cc labels the sf documents graph") {
    val out = DedupOps.queries("e_dedup_cc")(spark, sf)
      .as[(Long, Long)].collect()
    assert(out.nonEmpty)
    // every label is a member of its own component and is the minimum
    val byLabel = out.groupBy(_._2)
    byLabel.foreach { case (label, members) =>
      assert(members.map(_._1).min == label)
    }
  }
}
