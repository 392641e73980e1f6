package graft

import java.sql.Timestamp
import graft.operators.AsOfOps
import org.apache.spark.sql.functions.{col, count}

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

  test("bucketed range join matches exactly the rows inside the window") {
    // window 300 s; left row at 10:10:00 looks back to (10:05:00, 10:10:00]
    // exclusive of itself — rows straddle BUCKET boundaries on purpose:
    // 10:05:01 is in the previous bucket, reachable only via replication
    val lefts = Seq((1L, t(10), 100L)).toDF("k", "lts", "lid")
    def s(min: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")
    val rights = Seq(
      (1L, s(5, 1)),   // 299 s before → in window, previous bucket
      (1L, s(9, 59)),  // 1 s before → in window, same bucket
      (1L, s(10, 0)),  // exactly at left ts → excluded (strict <)
      (1L, s(4, 59)),  // 301 s before → outside
      (2L, s(9, 59)))  // wrong key
      .toDF("k", "rts")
    val out = AsOfOps.rangeJoinBucketed(lefts, rights, "k", "lts", "rts", 300L)
      .groupBy("lid").agg(count(col("_rus")).as("n")).collect()
    assert(out.head.getLong(1) == 2L,
      s"expected the 299s and 1s rows only, got ${out.head.getLong(1)}")
  }

  test("range join plan is an equi-join on (key, bucket), not a nested loop") {
    val p = SparkEntry.queries("e_range_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"bucketing must keep the range join equi-shaped:\n$p")
  }
}
