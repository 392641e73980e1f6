package graft

import graft.functions.{RollingHash, TextOps}
import org.apache.spark.sql.functions._

class TextAndHashSpec extends SparkSpec {
  import spark.implicits._

  test("rolling_hash expression matches the reference implementation") {
    val samples = Seq("", "a", "hello world", "naïve — ünïcode ✓",
      "the quick brown fox")
    val got = samples.toDF("s")
      .select(RollingHash.rollingHash(spark, col("s"))).as[Long].collect().toSeq
    assert(got == samples.map(RollingHash.reference))
  }

  test("rolling_hash propagates null and registers as SQL function") {
    RollingHash.register(spark)
    val r = spark.sql("SELECT rolling_hash(CAST(NULL AS STRING)) n, rolling_hash('abc') v")
      .head()
    assert(r.isNullAt(0))
    assert(r.getLong(1) == RollingHash.reference("abc"))
  }

  test("count-min sketch never underestimates and is near-exact at 4x512") {
    val rows = SparkEntry.queries("e_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS must overestimate: ${r.getString(0)} $est < $exact")
      // 4x512 counters over a sf0.001 vocabulary: collisions add at
      // most a small additive error (eps ~ e/512 of total mass)
      assert(est - exact <= 50, s"CMS error too large for ${r.getString(0)}")
    }
  }

  test("letter_counts matches the reference byte scan, unicode-safe") {
    import graft.functions.LetterCounts
    val samples = Seq("", "Hello World", "naïve — ünïcode ✓ ABC abc",
      "zzzZZZ", "1234 !@#$")
    val got = samples.toDF("s")
      .select(LetterCounts.letterCounts(spark, col("s")))
      .as[Seq[Long]].collect().toSeq
    assert(got == samples.map(LetterCounts.reference))
    // ï and ü are multi-byte: none of their bytes may count as a-z;
    // 'n','a','v','e' etc. still do
    val naive = LetterCounts.reference("naïve")
    assert(naive.sum == 4 && naive('n' - 'a') == 1 && naive('v' - 'a') == 1)
    LetterCounts.register(spark)
    assert(spark.sql("SELECT letter_counts(CAST(NULL AS STRING))")
      .head().isNullAt(0))
  }

  test("lm score is a probability mean; diversity is a proper Gini") {
    val docs = Tables.load(spark, sf, "documents")
    val lm = SparkEntry.queries("e_lm_score")(spark, sf)
    val nMulti = docs
      .where(size(split(lower(col("text")), "\\s+")) >= 2).count()
    assert(lm.count() == nMulti, "one row per doc with >= 2 tokens")
    assert(lm.where(col("lm_score") <= 0 || col("lm_score") > 1).count() == 0,
      "mean conditional probability must lie in (0, 1]")
    val gini = SparkEntry.queries("e_char_diversity")(spark, sf)
    assert(gini.count() == docs.count())
    assert(gini.where(col("gini") < 0 || col("gini") >= 1).count() == 0,
      "Gini impurity over 26 classes lies in [0, 25/26]")
    // natural-language fixture text is letter-diverse
    assert(gini.where(col("gini") > 0.5).count() > 0)
  }

  test("language id picks the list with most stopword hits") {
    val d = Seq(
      (1L, "der hund und die katze ist nicht da"),
      (2L, "the cat and the dog is in that house"),
      (3L, "el perro y la casa es un lugar en que"),
      (4L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    val preds = TextOps.langIdOver(d)
      .select("doc_id", "pred_lang").as[(Long, String)].collect().toMap
    assert(preds(1L) == "de")
    assert(preds(2L) == "en")
    assert(preds(3L) == "es")
    assert(preds(4L) == "unknown")
  }

  test("token/quality metrics agree with hand computation") {
    val text = "the cat and a dog"
    val d = Seq((1L, text, text.length.toLong)).toDF("doc_id", "text", "n_chars")
    val ws = d.select(size(split(lower(col("text")), " "))).as[Int].head()
    assert(ws == 5)
    // stopword ratio with list containing the/a/and = 3/5
    val t = graft.functions.TextShingles.tokens(col("text"))
    val ratio = d.select(
      size(filter(t, x => x.isin("the", "a", "and"))).cast("double") / size(t))
      .as[Double].head()
    assert(math.abs(ratio - 0.6) < 1e-12)
  }

  test("simhash/shingle helpers handle short docs without nulls") {
    val d = Seq((1L, "ab")).toDF("doc_id", "text")
    val g = d.select(graft.functions.TextShingles.wordShingles(col("text"), 3))
      .head().getSeq[String](0)
    assert(g.isEmpty)
    val cg = d.select(graft.functions.TextShingles.charGrams(col("text"), 3))
      .head().getSeq[String](0)
    assert(cg.isEmpty)
  }

  test("langConfusion diagonal dominates and totals equal the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val cm = graft.functions.TextOps.langConfusionOver(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(cm.map(_._3).sum === docs.count())
    // the heuristic should agree with the label more often than any
    // single off-diagonal cell, per labeled language present
    for (l <- cm.map(_._1).distinct if cm.exists(c => c._1 == l && c._2 == l)) {
      val diag = cm.collectFirst { case (`l`, `l`, n) => n }.get
      val offMax = cm.collect { case (`l`, p, n) if p != l => n }
      assert(offMax.forall(_ <= diag), s"lang $l: $diag vs ${offMax.toList}")
    }
  }
}
