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
}
