package graft

import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** Incremental dedup must equal the full recompute when increments
  * arrive in id order, drop an already-ingested day entirely on replay,
  * and keep the historical index side shuffle-free (bucketed layout).
  */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = Tables.load(spark, sf, "documents")

  test("day1+day2 incremental equals the full exact-dedup recompute") {
    // id-ordered split: every text's global min doc_id lands in the
    // earliest day containing it, so incremental keep-first == full
    // recompute keep-min-id
    spark.sql("DROP TABLE IF EXISTS inc_eq_idx")
    val mid = 25L
    val s1 = DedupOps.dedupIncremental(docs.where(col("doc_id") < mid), "inc_eq_idx")
    val s2 = DedupOps.dedupIncremental(docs.where(col("doc_id") >= mid), "inc_eq_idx")
    val incremental = s1.unionByName(s2).select("doc_id").orderBy("doc_id")
    val full = DedupOps.exactDedup(docs).select("doc_id").orderBy("doc_id")
    assert(incremental.collect().toSeq == full.collect().toSeq)
    spark.sql("DROP TABLE IF EXISTS inc_eq_idx")
  }

  test("replaying an ingested day against the index yields zero survivors") {
    spark.sql("DROP TABLE IF EXISTS inc_replay_idx")
    val day = docs.where(col("doc_id") < 25L)
    val first = DedupOps.dedupIncremental(day, "inc_replay_idx")
    assert(first.count() > 0)
    val replay = DedupOps.dedupIncremental(day, "inc_replay_idx")
    assert(replay.count() == 0, "every fingerprint is already in the index")
    spark.sql("DROP TABLE IF EXISTS inc_replay_idx")
  }

  test("the anti join reads the bucketed index without shuffling it") {
    spark.sql("DROP TABLE IF EXISTS inc_plan_idx")
    DedupOps.dedupIncremental(docs.where(col("doc_id") < 25L), "inc_plan_idx")
    // force the join path (not broadcast) to see the index-side layout,
    // as a 100 TB-history index would never broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val increment = docs.where(col("doc_id") >= 25L)
        .withColumn("fp", xxhash64(col("text")))
      val anti = increment.join(spark.table("inc_plan_idx"), Seq("fp"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      // exactly one hash exchange: the increment side; the bucketed
      // index is read in bucket order with no exchange above its scan
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1,
        s"expected only the increment to shuffle, saw $exchanges:\n$plan")
      anti.write.format("noop").mode("overwrite").save()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS inc_plan_idx")
    }
  }

  test("minhash incremental: a re-sent corpus is dropped IN FULL by " +
      "the persisted LSH index, and the index holds survivors only") {
    val bandsTbl = "inc_lsh_spec_bands"
    val featsTbl = "inc_lsh_spec_feats"
    spark.sql(s"DROP TABLE IF EXISTS $bandsTbl")
    spark.sql(s"DROP TABLE IF EXISTS $featsTbl")
    val s1 = DedupOps.minhashIncrementalDedup(docs, bandsTbl, featsTbl)
    val n1 = s1.count()
    assert(n1 > 0 && n1 <= docs.count())
    // the index stores exactly the survivors (features once per doc,
    // 4 band rows per doc)
    assert(spark.table(featsTbl).count() == n1)
    assert(spark.table(bandsTbl).count() == 4 * n1)
    // day 2 re-sends the WHOLE corpus under shifted ids. Every re-sent
    // doc x either (a) duplicates a day-1 survivor — identical bands,
    // J = 1 — or (b) duplicates a day-1 DROPPED doc, which shared a
    // band and J >= 0.8 with the surviving twin that removed it; x
    // inherits both. Either way the index catches it: zero survivors.
    val resent = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val s2 = DedupOps.minhashIncrementalDedup(resent, bandsTbl, featsTbl)
    assert(s2.count() == 0, "a re-sent near-duplicate slipped the index")
    assert(spark.table(featsTbl).count() == n1, "index grew on a no-op day")
    spark.sql(s"DROP TABLE IF EXISTS $bandsTbl")
    spark.sql(s"DROP TABLE IF EXISTS $featsTbl")
  }
}
