package graft

import graft.operators.FuzzyJoinOps
import org.apache.spark.sql.functions._

/** The fuzzy join's candidate machinery (q-gram count filter + short
  * lane) must be invisible: every suite compares against an
  * independent brute-force all-pairs levenshtein.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val m = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 0 to a.length) m(i)(0) = i
    for (j <- 0 to b.length) m(0)(j) = j
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) = math.min(
        math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
        m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    m(a.length)(b.length)
  }

  private def brute(titles: Seq[(Long, String)], d: Int): Set[(Long, Long, Int)] =
    (for {
      (ia, ta) <- titles; (ib, tb) <- titles if ia < ib
      dd = lev(ta, tb) if dd <= d
    } yield (ia, ib, dd)).toSet

  test("fuzzy join equals brute force, incl. short strings sharing no q-grams") {
    // 1/2: dist-2 pair of 2-char strings with ZERO shared 3-grams —
    // only the short lane can find it (the count bound is vacuous).
    // 8: empty string (no grams at all). 9/10: short/long lane
    // boundary (len 8 vs len 10, dist 2).
    val titles = Seq(
      1L -> "ab", 2L -> "ba", 3L -> "xy",
      4L -> "hello world title", 5L -> "hello world titles",
      6L -> "hullo world title", 7L -> "completely different",
      8L -> "", 9L -> "abcdefgh", 10L -> "abcdefghij")
    val got = FuzzyJoinOps.fuzzyJoin(titles.toDF("id", "title"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(titles, 2))
    // the hard case is actually present in the expected set
    assert(brute(titles, 2).contains((1L, 2L, 2)))
  }

  test("gate query matches brute force over the fixture titles") {
    val titles = Tables.load(spark, sf, "documents")
      .select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
      .as[(Long, String)].collect().toSeq
    val got = FuzzyJoinOps.queries("e_fuzzy_join")(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(titles, 2))
    assert(got.nonEmpty) // the fixture's near-dup texts must surface
  }

  test("seeded fuzz: PassJoin equals brute force on random mixed-length strings") {
    // small alphabet + lengths straddling the lane boundary (0..14)
    // makes matches dense and exercises every geometry branch:
    // degenerate segments, |Δlen| ∈ {0,1,2}, probe-window clamping
    val rnd = new scala.util.Random(20260814L)
    val titles = (1L to 80L).map { i =>
      i -> Seq.fill(rnd.nextInt(15))("abc" (rnd.nextInt(3))).mkString
    }
    val got = FuzzyJoinOps.fuzzyJoin(titles.toDF("id", "title"))
      .as[(Long, Long, Int)].collect().toSet
    val exp = brute(titles, 2)
    assert(got == exp,
      s"missing=${(exp -- got).take(5)} spurious=${(got -- exp).take(5)}")
    assert(exp.nonEmpty)
  }

  test("candidate lanes partition the pair space (no duplicate pairs)") {
    val titles = (1L to 40L).map(i => i -> ("t" * (i % 12).toInt))
    val out = FuzzyJoinOps.fuzzyJoin(titles.toDF("id", "title"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(out.distinct.size == out.size)
  }
}
