package graft

import graft.engine.{QueryRegistry, SqlTemplates, Validate}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck properties (SURVEY §5.3): validator domain, pagination
  * invariants, dedup idempotence. Generators are sampled with fixed
  * seeds (no scalatest-scalacheck bridge in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (0 until 40).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private val validChars =
    Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('_', '.', ' ', '-'))

  test("validator accepts the alphanumeric domain") {
    forAll(Gen.nonEmptyListOf(validChars).map(_.mkString)) { s =>
      // valid chars are accepted unless they form a `--` comment
      assert(Validate.value(s).isRight == !s.contains("--"))
    }
  }

  test("validator rejects anything containing out-of-domain characters") {
    val invalid = Gen.oneOf(';', '\'', '"', '%', '(', ')', '=', '\n')
    forAll(Gen.nonEmptyListOf(validChars).map(_.mkString), invalid) { (s, c) =>
      assert(Validate.value(s + c).isLeft)
    }
  }

  test("pages partition the ordered relation for any page size") {
    forAll(Gen.choose(1, 40)) { perpage =>
      val pages = Iterator.from(1)
        .map(p => QueryRegistry.recordList(spark, sf, "nation", p, perpage,
          Seq("n_nationkey")).collect().map(_.getInt(0)).toSeq)
        .takeWhile(_.nonEmpty).toSeq
      assert(pages.flatten == (0 until 25))
      assert(pages.init.forall(_.size == perpage))
    }
  }

  test("exact dedup is idempotent for arbitrary duplicate patterns") {
    forAll(Gen.listOfN(12, Gen.choose(0, 4))) { picks =>
      val texts = picks.zipWithIndex.map { case (t, i) => (i.toLong, s"text $t") }
      val df = texts.toDF("doc_id", "text")
      val once = graft.operators.DedupOps.exactDedup(df)
      val twice = graft.operators.DedupOps.exactDedup(once)
      val a = once.select("doc_id").as[Long].collect().sorted.toSeq
      val b = twice.select("doc_id").as[Long].collect().sorted.toSeq
      assert(a == b)
      assert(a.size == picks.distinct.size)
    }
  }

  test("positional arity and named-var extraction match the reference rules") {
    assert(SqlTemplates.positionalArity("select * from t where a=? and b=?") == 2)
    assert(SqlTemplates.namedVars("select :x from t where a = :y and b = :x")
      == Seq("x", "y"))
  }

  test("keyset pages tile the global sort for any page size") {
    val full = graft.Tables.load(spark, sf, "customer")
      .orderBy("c_acctbal", "c_custkey")
      .select("c_custkey").as[Long].collect().toSeq
    forAll(Gen.choose(17, 60), n = 3) { pp =>
      var after: Seq[(String, Any)] =
        Seq("c_acctbal" -> -1e9, "c_custkey" -> -1L)
      val walked = scala.collection.mutable.ArrayBuffer.empty[Long]
      var done = false
      while (!done) {
        val page = graft.engine.QueryRegistry
          .recordListAfterKeys(spark, sf, "customer", after, pp)
        val rows = page.select("c_custkey").as[Long].collect()
        walked ++= rows
        graft.engine.QueryRegistry
          .nextPageCursor(page, Seq("c_acctbal", "c_custkey")) match {
          case Some(c) if rows.nonEmpty => after = c
          case _ => done = true
        }
      }
      assert(walked.toSeq == full,
        s"perpage=$pp keyset walk diverged from the global sort")
    }
  }
}
