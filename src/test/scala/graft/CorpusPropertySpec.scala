package graft

import graft.functions.CharGrams
import graft.operators.{CorpusOps, SetJoinOps}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties for the round-9 corpus operators. Two shapes
  * matter at 100 TB and are invisible to example tests:
  *  - PARTITION INVARIANCE: shuffling the input across a different
  *    partition count must not change any result (catches accidental
  *    dependence on row order, partition-local state, or non-
  *    commutative folds);
  *  - ENCODING EXACTNESS: CharGrams' byte-offset slicing must agree
  *    with SQL substr for arbitrary unicode, not just the fixtures.
  * Fixed seeds (no scalatest-scalacheck bridge in the offline cache).
  */
class CorpusPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar)
    .map(_.take(5).mkString)
  private val textGen = Gen.listOf(wordGen).map(_.take(30).mkString(" "))
  private val corpusGen = Gen.listOf(textGen).map(_.take(25))
    .map(ts => ts.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def docsDf(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("dedupSpans is partition-invariant") {
    forAll(corpusGen) { rows =>
      if (rows.nonEmpty) {
        val d = docsDf(rows)
        val a = CorpusOps.dedupSpans(d, k = 6).collect().toSeq
        val b = CorpusOps.dedupSpans(d.repartition(7), k = 6).collect().toSeq
        assert(a === b)
      }
    }
  }

  test("bpePairs is partition-invariant and counts are positive") {
    forAll(corpusGen) { rows =>
      if (rows.nonEmpty) {
        val d = rows.toDF("doc_id", "text")
        val a = CorpusOps.bpePairs(d).collect().toSeq
        val b = CorpusOps.bpePairs(d.repartition(5)).collect().toSeq
        assert(a === b)
        assert(a.forall(_.getLong(1) > 0))
      }
    }
  }

  test("tokenBudgetSelect is partition-invariant") {
    val docGen = Gen.listOf(Gen.choose(1L, 25L)).map(_.take(80))
      .map(ls => ls.zipWithIndex.map { case (n, i) =>
        (i.toLong, if (i % 2 == 0) "en" else "de", n) })
    forAll(docGen) { rows =>
      if (rows.nonEmpty) {
        val d = rows.toDF("doc_id", "lang", "n_chars")
        val a = CorpusOps.tokenBudgetSelect(d, budget = 300L).collect().toSeq
        val b = CorpusOps.tokenBudgetSelect(d.repartition(9), budget = 300L)
          .collect().toSeq
        assert(a === b)
      }
    }
  }

  test("jaccardJoin is partition-invariant") {
    val setGen = Gen.listOfN(20,
      Gen.listOf(Gen.choose(0L, 30L)).map(_.take(10).distinct))
      .map(_.zipWithIndex.collect {
        case (s, i) if s.nonEmpty => (i.toLong, s) })
    forAll(setGen, n = 8) { rows =>
      if (rows.nonEmpty) {
        val d = rows.toDF("doc_id", "feat")
        val a = SetJoinOps.jaccardJoin(d).collect().toSeq
        val b = SetJoinOps.jaccardJoin(d.repartition(6)).collect().toSeq
        assert(a === b)
      }
    }
  }

  test("CharGrams equals substr on arbitrary unicode for k in 1..4") {
    val uniChar = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ü', 'ß', 'ñ'),
      2 -> Gen.oneOf('日', '本', '語', '✓'),
      1 -> Gen.const(' '))
    val strGen = Gen.listOf(uniChar).map(_.take(40).mkString)
    forAll(Gen.listOfN(20, strGen), n = 6) { strs =>
      for (k <- 1 to 4) {
        val df = strs.toDF("s").select(
          CharGrams.charGrams(spark, col("s"), k).as("fast"),
          when(length(col("s")) >= k,
            transform(sequence(lit(1), length(col("s")) - (k - 1)),
              i => col("s").substr(i, lit(k))))
            .otherwise(array().cast("array<string>")).as("slow"))
        assert(df.where(not(col("fast") === col("slow"))).count() === 0,
          s"k=$k")
      }
    }
  }
}
