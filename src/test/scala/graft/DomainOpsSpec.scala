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

  test("URL canonicalization: raw twins collapse to one canonical URL " +
      "with the noisy even form never winning a new key") {
    val docs = Tables.load(spark, sf, "documents")
    val staged = docs.select(col("doc_id"),
      DomainOps.synthUrl(col("doc_id")).as("raw"),
      DomainOps.urlCanonicalize(DomainOps.synthUrl(col("doc_id")))
        .as("canon"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    // every raw URL is distinct as a string …
    assert(staged.map(_._2).distinct.size == staged.size)
    // … but twins share ONE canonical form, and it is the tidy one
    staged.grouped(2).foreach {
      case Seq((even, rawE, canonE), (odd, rawO, canonO)) =>
        assert(even % 2 == 0 && odd == even + 1)
        assert(rawE != rawO)
        assert(canonE == canonO, s"pair ($even,$odd) did not collapse")
        assert(canonE.startsWith("https://site") &&
          !canonE.contains("www.") && !canonE.contains(":443") &&
          !canonE.contains("#") && canonE.contains("?a="),
          s"canonical form wrong: $canonE")
      case Seq((d, _, canon)) => // odd tail doc: its own key
        assert(canon.nonEmpty && d % 2 == 0)
    }
  }

  test("the canonicalizer handles hand-crafted URLs it did not " +
      "synthesize") {
    val cases = Seq(
      ("HTTP://WWW.A.COM:80/x/", "http://a.com/x"),
      ("https://b.org/p?b=2&a=1", "https://b.org/p?a=1&b=2"),
      ("https://c.net/q#frag", "https://c.net/q"),
      ("http://d.io", "http://d.io"),
      // a NON-default port is identity and must survive canonicalization
      ("https://www.e.co:8443/y", "https://e.co:8443/y"))
    import spark.implicits._
    val got = cases.map(_._1).toDF("u")
      .select(DomainOps.urlCanonicalize(col("u"))).as[String]
      .collect().toSeq
    assert(got == cases.map(_._2), s"canonicalization diverged: $got")
  }
}
