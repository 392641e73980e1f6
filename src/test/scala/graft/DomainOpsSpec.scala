package graft

import org.apache.spark.sql.functions.col

import graft.operators.DomainOps

/** Domain-level curation: the cap must be a bounded aggregation (no
  * per-domain sort/window anywhere in the plan), and the report's
  * classes must be internally consistent.
  */
class DomainOpsSpec extends SparkSpec {
  import spark.implicits._

  test("domain cap keeps exactly cap docs per domain in priority " +
      "order, through a bounded aggregate — no window, no global sort") {
    val docs = Tables.load(spark, sf, "documents")
    val capped = DomainOps.domainCap(docs, cap = 10)
    val rows = capped.orderBy("source", "keep_rank")
      .as[(String, Long, Long, Int)].collect().toSeq
    val byDomain = rows.groupBy(_._1)
    assert(byDomain.nonEmpty)
    byDomain.foreach { case (src, kept) =>
      assert(kept.size <= 10, s"$src over cap")
      assert(kept.map(_._4).sorted == (1 to kept.size), s"$src ranks")
      val prio = kept.sortBy(_._4).map(r => (-r._3, r._2))
      assert(prio == prio.sorted,
        s"$src not in (n_chars DESC, doc_id ASC) priority order")
    }
    // every kept doc beats every dropped doc of its domain
    val dropped = docs.join(capped.select("doc_id"), Seq("doc_id"),
        "left_anti")
      .select(col("source"), col("n_chars"), col("doc_id"))
      .as[(String, Long, Long)].collect().toSeq.groupBy(_._1)
    byDomain.foreach { case (src, kept) =>
      val ord = Ordering.Tuple2[Long, Long]
      val worstKept = kept.map(r => (r._3, -r._2)).min(ord)
      dropped.getOrElse(src, Seq.empty).foreach { case (_, nc, id) =>
        assert(ord.lteq((nc, -id), worstKept),
          s"dropped doc $id of $src outranks a kept doc")
      }
    }
    // scale shape: the bounded TopK aggregator, not a window — a hot
    // domain never sorts in full and only cap rows per domain shuffle
    val plan = capped.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"cap degenerated to a window:\n$plan")
  }

  test("domain report: blocked domains keep nothing, unblocked keep " +
      "survivors, and dup counts bound by domain size") {
    val rep = DomainOps.domainReport(Tables.load(spark, sf, "documents"))
      .orderBy("source")
      .as[(String, Long, Long, Double, Boolean, Long)].collect().toSeq
    assert(rep.nonEmpty)
    rep.foreach { case (src, nDocs, nDup, rate, blocked, nKept) =>
      assert(nDup >= 0 && nDup <= nDocs, s"$src dup count out of range")
      assert(math.abs(rate - nDup.toDouble / nDocs) < 1e-6)
      assert(blocked == DomainOps.Blocklist.contains(src))
      if (blocked) assert(nKept == 0L, s"$src blocked but keeps docs")
      else assert(nKept == nDocs - nDup, s"$src keep budget wrong")
    }
    assert(rep.count(_._5) == DomainOps.Blocklist.size,
      "every blocklisted domain must appear blocked")
  }
}
