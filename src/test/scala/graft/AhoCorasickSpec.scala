package graft

import org.apache.spark.sql.functions._
import graft.functions.{AhoCorasickAutomaton, AhoMatches, TextOps}

/** The Aho–Corasick blocklist primitive: automaton unit behavior
  * (boundaries, overlaps, dedup, substring non-matches), Expression
  * eval ≡ codegen, and the e_badwords gate query against a naive
  * per-phrase reference on the real fixture.
  */
class AhoCorasickSpec extends SparkSpec {

  private def ac(ps: String*) = new AhoCorasickAutomaton(ps.toArray)

  test("word-boundary semantics: substring of a token never matches") {
    val a = ac("low", "slow")
    assert(a.matchedIds("the slow merge").toSeq == Seq(1))
    assert(a.matchedIds("low water mark").toSeq == Seq(0))
    assert(a.matchedIds("lowlands below").toSeq == Seq.empty)
  }

  test("text edges count as boundaries (virtual padding)") {
    val a = ac("alpha", "omega")
    assert(a.matchedIds("alpha").toSeq == Seq(0))
    assert(a.matchedIds("alpha and omega").toSeq == Seq(0, 1))
    assert(a.matchedIds("omega").toSeq == Seq(1))
    assert(a.matchedIds("").toSeq == Seq.empty)
  }

  test("any whitespace is a boundary: newline/tab/CR delimit like " +
      "spaces, in the text AND inside multi-word phrases") {
    val a = ac("low", "bad word")
    assert(a.matchedIds("low\nwater").toSeq == Seq(0))
    assert(a.matchedIds("mark\tlow\tmark").toSeq == Seq(0))
    assert(a.matchedIds("low\r\nnext").toSeq == Seq(0))
    // phrase-internal separator matches any whitespace run of one char
    assert(a.matchedIds("a bad\tword here").toSeq == Seq(1))
    // punctuation is NOT a boundary (documented contract)
    assert(a.matchedIds("low. and (low)").toSeq == Seq.empty)
  }

  test("the boundary set is exactly RE2 \\s — Unicode whitespace " +
      "outside [\\t\\n\\f\\r ] does NOT delimit (oracle agreement)") {
    val a = ac("low")
    // every member of the RE2 class delimits
    for (c <- Seq('\t', '\n', '\f', '\r', ' '))
      assert(a.matchedIds(s"x${c}low${c}x").toSeq == Seq(0),
        s"U+${c.toInt.toHexString} should be a boundary")
    // Character.isWhitespace members OUTSIDE the RE2 class must not:
    // the DuckDB oracle normalizes with regexp_replace '\s' and would
    // disagree on these inputs (the r14 advice divergence)
    for (c <- Seq('\u000B', '\u001C', '\u001D', '\u001E', '\u001F',
        '\u2028', '\u2029', '\u1680', '\u3000')) {
      assert(Character.isWhitespace(c), s"fixture assumption: U+${c.toInt.toHexString}")
      assert(a.matchedIds(s"x${c}low${c}x").toSeq == Seq.empty,
        s"U+${c.toInt.toHexString} must NOT be a boundary")
    }
  }

  test("a NULL phrase element is rejected with a clear error, not an NPE") {
    import org.apache.spark.sql.catalyst.expressions.{CreateArray, Literal}
    import org.apache.spark.sql.types.StringType
    import org.apache.spark.unsafe.types.UTF8String
    val e = intercept[IllegalArgumentException] {
      AhoMatches.fromExprs(Seq(
        Literal(UTF8String.fromString("some text"), StringType),
        CreateArray(Seq(
          Literal(UTF8String.fromString("a"), StringType),
          Literal(null, StringType)))))
    }
    assert(e.getMessage.contains("must not contain NULL"),
      s"expected the clear NULL-element message, got: ${e.getMessage}")
  }

  test("back-to-back phrases sharing a separator space both report") {
    val a = ac("bad word", "word pair")
    // "bad word pair": ' bad word ' and ' word pair ' overlap at the
    // shared space — a consuming matcher would miss the second.
    assert(a.matchedIds("bad word pair").toSeq == Seq(0, 1))
  }

  test("one phrase a suffix of another: both found, ids distinct") {
    val a = ac("table scan", "big table scan", "scan")
    assert(a.matchedIds("a big table scan here").toSeq == Seq(0, 1, 2))
    assert(a.matchedIds("scan scan scan").toSeq == Seq(2))
  }

  test("Expression: interpreted eval equals codegen'd result") {
    import spark.implicits._
    val phrases = Seq("the the", "key value", "low")
    val df = Seq(
      (1L, "the the key value store"),
      (2L, "slow is not low"),
      (3L, "nothing here"),
      (4L, null.asInstanceOf[String])).toDF("id", "t")
    val got = df.select(col("id"),
      AhoMatches.blocklistHits(spark, col("t"), phrases).as("ids"))
      .orderBy("id").collect()
    assert(got(0).getSeq[Int](1) == Seq(0, 1))
    // 'low' IS a standalone final token here — a boundary match; only
    // the 'low'-inside-'slow' occurrence is suppressed
    assert(got(1).getSeq[Int](1) == Seq(2))
    assert(got(2).getSeq[Int](1) == Seq.empty)
    assert(got(3).isNullAt(1))
    // force the interpreted path through a non-codegen context: eval
    // directly on the expression
    val expr = graft.functions.AhoMatches(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(
          "the the key value store")), phrases)
    assert(expr.eval(null).asInstanceOf[
      org.apache.spark.sql.catalyst.util.ArrayData]
      .toIntArray().toSeq == Seq(0, 1))
  }

  test("the blocklist projection stays inside whole-stage codegen") {
    val df = Tables.load(spark, sf, "documents").select(col("doc_id"),
      AhoMatches.blocklistHits(spark, lower(col("text")),
        TextOps.BadPhrases).as("ids"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1) Project"),
      s"expected the scan+blocklist projection codegen'd in:\n$p")
  }

  test("e_badwords matches the naive per-phrase reference on the fixture") {
    val docs = Tables.load(spark, sf, "documents")
    // naive reference: boundary-padded contains per phrase
    val padded = concat(lit(" "), lower(col("text")), lit(" "))
    val naiveHits = TextOps.BadPhrases.zipWithIndex.map { case (p, i) =>
      when(contains(padded, lit(s" $p ")), lit(p))
    }
    val naive = docs.select(col("doc_id"),
      array_compact(array(naiveHits: _*)).as("ps"))
      .where(size(col("ps")) > 0)
      .select(col("doc_id"), size(col("ps")).cast("long").as("n_hits"),
        array_min(col("ps")).as("first_phrase"))
    val got = SparkEntry.queries("e_badwords")(spark, sf)
    assert(got.count() > 0, "fixture should contain blocklist hits")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    // the substring trap: 'low' alone never matches ('slow' is the token)
    assert(got.where(col("first_phrase") === "low").isEmpty)
  }
}
