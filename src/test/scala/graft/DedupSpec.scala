package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions.col

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("exactDedup keeps the min doc_id per identical text") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val kept = DedupOps.exactDedup(d).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("exactDedup is idempotent") {
    val d = docs(1L -> "a b c", 2L -> "a b c", 3L -> "x y z")
    val once = DedupOps.exactDedup(d)
    val twice = DedupOps.exactDedup(once)
    assert(once.count() == twice.count())
  }

  test("keep-longest dedup groups truncation variants, keeps the longest") {
    val full = ("lorem ipsum dolor sit amet consectetur " * 8).trim
    val d = Seq(
      (1L, full.take(150)),                  // truncated copy (same 100-prefix)
      (2L, full),                            // full original — must survive
      (3L, "completely different text here") // unrelated — must survive
    ).map { case (id, t) => (id, "en", "web", t.length.toLong, t) }
      .toDF("doc_id", "lang", "source", "n_chars", "text")
    val kept = DedupOps.exactDedupKeepLongest(d)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L),
      "the truncated copy must be dropped in favor of the longer original")
  }

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away today"

  test("minhashDedup removes a near-identical doc, keeps distinct ones") {
    val nearDup = base + " extra"
    val distinct = "completely different words about spark query engines and scale"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> distinct, 4L -> base)
    val kept = DedupOps.minhashDedup(d, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.contains(3L), "distinct doc must survive")
    assert(kept.contains(1L), "smallest id of the dup group must survive")
    assert(!kept.contains(4L), "exact dup (jaccard 1.0) must be removed")
    assert(!kept.contains(2L), "near dup above threshold must be removed")
  }

  test("minhashMd5Dedup mirrors the xxhash variant's removal behavior") {
    val nearDup = base + " extra"
    val distinct = "completely different words about spark query engines and scale"
    val d = docs(1L -> base, 2L -> nearDup, 3L -> distinct, 4L -> base)
    val kept = DedupOps.minhashMd5Dedup(d, threshold = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L),
      "md5-hash variant must keep the group minimum and the distinct doc")
  }

  test("decontaminate removes docs containing an eval example") {
    // doc 0 (0 % 97 == 0) is the eval example; doc 5 embeds its text
    // verbatim as a prefix (containment 1.0); doc 7 shares only 3 of
    // its 12 shingles (0.25 < τ)
    val d = docs(
      0L -> base,
      5L -> (base + " plus surrounding training prose around the eval text"),
      6L -> "completely different words about spark query engines and scale",
      7L -> base.split(" ").take(5).mkString(" "))
    val kept = DedupOps.decontaminate(d, evalModulus = 97L, tau = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(!kept.contains(0L), "the eval member itself is contaminated")
    assert(!kept.contains(5L), "doc embedding the eval text must be removed")
    assert(kept.contains(6L), "unrelated doc survives")
    assert(kept.contains(7L), "partial overlap below tau survives")
  }

  test("md5-token simhash removes identical docs and caps at 60 bits") {
    val d = docs(1L -> base, 2L -> base, 3L -> "something else entirely here")
    val kept = DedupOps.simhashDedup(d,
        hashOne = tok => graft.functions.TextShingles.md5Hash60(tok))
      .select("doc_id", "simhash").as[(Long, Long)].collect().sortBy(_._1)
    assert(kept.map(_._1).toSeq == Seq(1L, 3L))
    // bits 60..63 can never be set with 60-bit token hashes
    assert(kept.forall { case (_, sh) => (sh >>> 60) == 0L })
  }

  test("simhash is deterministic and near-dups have small hamming distance") {
    val d = docs(1L -> base, 2L -> (base + " extra"), 3L -> "qq ww ee rr tt")
      .withColumn("simhash", DedupOps.simhash(col("text")))
    val m = d.select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val ham12 = java.lang.Long.bitCount(m(1L) ^ m(2L))
    val ham13 = java.lang.Long.bitCount(m(1L) ^ m(3L))
    assert(ham12 < ham13, s"near-dup hamming $ham12 should be < distinct $ham13")
    // determinism across evaluations
    val again = docs(1L -> base).withColumn("simhash", DedupOps.simhash(col("text")))
      .select("simhash").as[Long].head()
    assert(again == m(1L))
  }

  test("simhashDedup removes identical-text docs") {
    val d = docs(1L -> base, 2L -> base, 3L -> "qq ww ee rr tt aa ss dd ff gg")
    val kept = DedupOps.simhashDedup(d).select("doc_id").as[Long].collect().sorted
    assert(kept.contains(1L) && kept.contains(3L) && !kept.contains(2L))
  }

  test("ngramDedup removes char-level near dups") {
    val d = docs(1L -> base, 2L -> (base + "!"), 3L -> "zzzz yyyy xxxx wwww vvvv")
    val kept = DedupOps.ngramDedup(d, threshold = 0.8)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.contains(1L) && kept.contains(3L) && !kept.contains(2L))
  }

  test("embeddingDedup removes a duplicated vector, keeps orthogonal ones") {
    val v1 = Array.tabulate(8)(i => math.sin(i + 1).toFloat)
    val v2 = v1.map(x => x * 1.0001f)                    // cosine ≈ 1
    val v3 = Array.tabulate(8)(i => math.cos(3 * i + 2).toFloat)
    val d = Seq((1L, v1, 0), (2L, v2, 0), (3L, v3, 1))
      .toDF("vec_id", "embedding", "label")
    val kept = DedupOps.embeddingDedup(d, dim = 8)
      .select("vec_id").as[Long].collect().sorted
    assert(kept.contains(1L) && kept.contains(3L) && !kept.contains(2L))
  }

  test("fixture near-dups are caught at sf0.001 only when real") {
    val full = Tables.load(spark, sf, "documents")
    val kept = DedupOps.minhashDedup(full)
    assert(kept.count() <= full.count())
  }

  test("splitLeakfree: clusters never straddle splits, totals cover " +
      "the corpus, and the naive-hash leak count is real") {
    // r12: the split keys on the REAL duplicate graph — the
    // LSH-verified component labels (singletons label themselves),
    // not the synthetic chain closure
    val labels = DedupOps.lshCcLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val out = SparkEntry.queries("e_split_leakfree")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // driver replay of the md5 bucket
    def bucket(x: Long): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hx = md.digest(x.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hx, 16) % 10).toInt
    }
    def split(b: Int) = if (b < 8) "train" else if (b == 8) "val" else "test"
    val byCluster = labels.groupBy(_._2)
    val wantDocs = byCluster.toSeq
      .groupBy { case (lbl, _) => split(bucket(lbl)) }
      .view.mapValues(cs => (cs.map(_._2.length.toLong).sum, cs.size.toLong))
    wantDocs.foreach { case (s, (nd, nc)) =>
      assert(out(s)._1 == nd && out(s)._2 == nc, s"split $s totals")
    }
    assert(out.values.map(_._1).sum == labels.length.toLong)
    // leak count: clusters whose members' per-doc buckets span splits
    val wantLeaky = byCluster.toSeq.map { case (lbl, ms) =>
      (split(bucket(lbl)),
        if (ms.map(m => split(bucket(m._1))).distinct.size > 1) 1L else 0L)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
    wantLeaky.foreach { case (s, n) =>
      assert(out(s)._3 == n, s"split $s naive-leak count")
    }
    // the property the operator exists for: the naive assignment DOES
    // leak on the fixture (otherwise the report proves nothing)
    assert(out.values.map(_._3).sum > 0L, "no naive leakage — inert test")
  }

  test("evalShingleSets fails loudly past the driver-collect ceiling") {
    val full = Tables.load(spark, sf, "documents")
    // a misconfigured modulus that selects the whole corpus must raise
    // BEFORE collecting, not OOM the driver
    val e = intercept[IllegalArgumentException] {
      DedupOps.evalShingleSets(full, evalModulus = 1L, maxDocs = 10L)
    }
    assert(e.getMessage.contains("driver-collect ceiling"))
    // the production modulus stays comfortably under the default cap
    assert(DedupOps.evalShingleSets(full).nonEmpty)
  }
}
