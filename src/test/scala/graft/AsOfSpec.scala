package graft

import java.sql.Timestamp
import graft.operators.AsOfOps

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  private val trades = Seq(
    (1L, t(10), "T1"), (1L, t(30), "T2"), (2L, t(5), "T3"))
    .toDF("acct", "ts", "trade")
  private val quotes = Seq(
    (1L, t(0), 100.0), (1L, t(20), 110.0), (2L, t(6), 50.0))
    .toDF("acct", "qts", "px")

  test("as-of join picks the latest right row at or before the left ts") {
    val out = AsOfOps.asofJoin(trades, quotes, "acct", "ts", "qts")
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("T1").contains(100.0)) // 10:10 → quote at 10:00
    assert(out("T2").contains(110.0)) // 10:30 → quote at 10:20
    assert(out("T3").isEmpty)         // 10:05 → no quote yet (10:06 is later)
  }

  test("a right row exactly at the left ts matches (inclusive semantics)") {
    val q2 = Seq((1L, t(10), 99.0)).toDF("acct", "qts", "px")
    val out = AsOfOps.asofJoin(trades, q2, "acct", "ts", "qts")
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("T1").contains(99.0))
  }

  test("tolerance voids stale matches") {
    val out = AsOfOps.asofJoin(trades, quotes, "acct", "ts", "qts",
        tolerance = Some(5 * 60))
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("T1").isEmpty)          // quote 10 min old > 5 min tolerance
    assert(out("T2").isEmpty)          // 10 min old as well
  }

  test("left rows without any right key partner survive with nulls") {
    val out = AsOfOps.asofJoin(
      Seq((9L, t(10), "T9")).toDF("acct", "ts", "trade"),
      quotes, "acct", "ts", "qts")
      .select("trade", "px").as[(String, Option[Double])].collect().toMap
    assert(out("T9").isEmpty)
  }
}
