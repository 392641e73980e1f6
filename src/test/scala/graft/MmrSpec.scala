package graft

import org.apache.spark.sql.functions._
import graft.operators.RetrievalOps

/** MMR diversified reranking: the diversity penalty actually changes
  * the selection when near-duplicates crowd the top, rank 1 is always
  * the pure-relevance winner, and the greedy loop is partitioning-
  * invariant.
  */
class MmrSpec extends SparkSpec {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def embDf(rows: Seq[(Long, Seq[Double])]) = {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(DoubleType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, v) => Row(id, v) }),
      schema)
  }

  test("near-duplicate of the top hit is deferred by the diversity penalty") {
    // query 1 at e1; docs 10 = 11 exactly (sim 1.0, rel 0.9 each,
    // id tie-break makes 10 the pure-relevance winner), 12 nearly as
    // relevant (0.88) with its residual in a dimension 10 lacks
    // (sim(12,10) = 0.792): score(11) = .7·.9 − .3·1.0 = 0.33 <
    // score(12) = .7·.88 − .3·.792 = 0.378 — the duplicate defers.
    val rows = Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      10L -> Seq(0.9, 0.43589, 0.0, 0.0),
      11L -> Seq(0.9, 0.43589, 0.0, 0.0),
      12L -> Seq(0.88, 0.0, 0.47497, 0.0),
      13L -> Seq(0.5, 0.0, 0.0, 0.86603))
    val out = RetrievalOps.mmrRerank(embDf(rows), queryIds = Seq(1L),
      n = 4, k = 3).collect()
    val picked = out.map(r => (r.getInt(1), r.getLong(2))).toSeq
    // pure relevance order is 10, 11, 12 — MMR plays 10, 12, 11
    assert(picked == Seq((1, 10L), (2, 12L), (3, 11L)),
      s"near-dup not deferred: $picked")
  }

  test("rank 1 equals the pure-relevance top hit on the fixture") {
    val emb = Tables.load(spark, sf, "embeddings")
    val mmr = SparkEntry.queries("e_retrieval_mmr")(spark, sf)
      .where(col("mmr_rank") === 1)
      .select(col("query_id"), col("doc_id"))
    val top1 = graft.operators.SimilarityOps
      .knnJoin(emb, k = 1, queryIds = Some(RetrievalOps.MmrQueryIds))
      .select(col("q_id").as("query_id"), col("vec_id").as("doc_id"))
    assert(mmr.exceptAll(top1).isEmpty && top1.exceptAll(mmr).isEmpty)
  }

  test("hard negatives: near-dups of the positive are skipped, rank order kept") {
    // 10 = positive (rel 0.9...); 11 identical to 10 (sim_to_pos 1.0 >
    // 0.9 ceiling → skipped); 12 and 13 become negatives in rank order
    val rows = Seq(
      1L -> Seq(1.0, 0.0, 0.0, 0.0),
      10L -> Seq(0.9, 0.43589, 0.0, 0.0),
      11L -> Seq(0.9, 0.43589, 0.0, 0.0),
      12L -> Seq(0.88, 0.0, 0.47497, 0.0),
      13L -> Seq(0.5, 0.0, 0.0, 0.86603))
    val out = RetrievalOps.hardNegatives(embDf(rows), queryIds = Seq(1L),
      n = 4, k = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(out == Seq((10L, 12L, 1), (10L, 13L, 2)),
      s"expected 11 skipped as a false negative: $out")
  }

  test("selection is partitioning-invariant") {
    val emb = Tables.load(spark, sf, "embeddings")
    val a = RetrievalOps.mmrRerank(emb).collect().toSeq
    val b = RetrievalOps.mmrRerank(emb.repartition(17)).collect().toSeq
    assert(a == b)
  }

  test("the IVF lanes ride the persisted pruned index: partition-pruned " +
      "scan + broadcast queries, no full-corpus exact scan") {
    for (name <- Seq("e_retrieval_mmr_ivf", "e_hard_negatives_ivf")) {
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      // the candidate generation must be probeIvfMany's shape: the
      // cell-partitioned index scan pruned to the touched cells...
      assert(df.queryExecution.sparkPlan.toString.contains("PartitionFilters")
        || plan.contains("PartitionFilters"),
        s"$name: expected a partition-pruned index scan in:\n${plan.take(2000)}")
      // ...with the bounded query side broadcast, never a
      // BroadcastNestedLoopJoin over the whole corpus
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"$name: brute-force nested-loop scan leaked into the IVF lane")
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("IVF lane rank-1 equals the probe's top hit per query") {
    val ivf = SparkEntry.queries("e_retrieval_mmr_ivf")(spark, sf)
      .where(col("mmr_rank") === 1)
      .select(col("query_id"), col("doc_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val index = graft.operators.SimilarityOps.loadIvfIndex(spark,
      graft.operators.SimilarityOps.persistedIndexPath(spark, sf))
    val emb = Tables.load(spark, sf, "embeddings")
    val top1 = graft.operators.SimilarityOps.probeIvfMany(index,
        emb.where(col("vec_id").isin(RetrievalOps.MmrQueryIds: _*))
          .select(col("vec_id").as("q_id"), col("embedding").as("q_vec")),
        nprobe = 4, k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ivf == top1, s"mmr rank-1 $ivf vs probe top-1 $top1")
  }
}
