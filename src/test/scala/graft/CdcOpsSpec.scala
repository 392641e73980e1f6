package graft

import graft.operators.CdcOps
import org.apache.spark.sql.functions._

/** MERGE and snapshot-diff semantics on a hand-built snapshot — each
  * change-op lane (update/delete/insert/untouched) asserted row by row,
  * then the diff classification closed over the same change batch.
  */
class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  private val snapshot = Seq(
    (10L, "O", 100.0), // %10 == 0 -> update
    (11L, "O", 110.0), // %10 == 1 -> update
    (12L, "F", 120.0), // %10 == 2 -> delete
    (13L, "F", 130.0), // %10 == 3 -> insert twin at +offset
    (14L, "P", 140.0), // untouched
    (19L, "P", 190.0)) // untouched
    .toDF("o_orderkey", "o_orderstatus", "o_totalprice")

  test("mergeUpsert applies each change-op lane exactly") {
    val r = CdcOps.mergeUpsert(snapshot, CdcOps.changeBatch(snapshot))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
      .toList
    assert(r === List(
      (10L, "O", 1100.0, "updated"),
      (11L, "O", 1110.0, "updated"),
      // 12 deleted
      (13L, "F", 130.0, "kept"), // the insert-source row itself survives
      (14L, "P", 140.0, "kept"),
      (19L, "P", 190.0, "kept"),
      (10000000013L, "I", 1130.0, "inserted")))
  }

  test("mergeUpsert output keys are unique") {
    val out = CdcOps.mergeUpsert(snapshot, CdcOps.changeBatch(snapshot))
    assert(out.count() === out.select("o_orderkey").distinct().count())
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val after = CdcOps.mergeUpsert(snapshot, CdcOps.changeBatch(snapshot))
    val r = CdcOps.snapshotDiff(snapshot, after).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(r === List(
      ("added", 1L, 10000000013L),
      ("changed", 2L, 21L),
      ("removed", 1L, 12L),
      ("unchanged", 3L, 13L + 14L + 19L)))
  }

  test("diffByKey classifies nullable value columns by row presence, " +
      "not value nullability") {
    val before = Seq[(Long, Option[Double])](
      (1L, None),          // NULL -> 9.0  : changed (not "added")
      (2L, Some(2.0)),     // 2.0  -> NULL : changed (not "removed")
      (3L, None),          // NULL -> NULL : unchanged (null-safe eq)
      (4L, Some(4.0)))     // row absent after: removed
      .toDF("k", "v")
    val after = Seq[(Long, Option[Double])](
      (1L, Some(9.0)), (2L, None), (3L, None),
      (5L, None))          // new row with NULL value: added
      .toDF("k", "v")
    val r = CdcOps.diffByKey(before, after, "k", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(r === List(
      ("added", 1L, 5L),
      ("changed", 2L, 3L),
      ("removed", 1L, 4L),
      ("unchanged", 1L, 3L)))
  }

  test("diff of a snapshot with itself is all-unchanged") {
    val r = CdcOps.snapshotDiff(snapshot, snapshot).collect()
    assert(r.length === 1)
    assert(r.head.getString(0) === "unchanged")
    assert(r.head.getLong(1) === 6L)
  }

  test("merge plan broadcasts the change batch — snapshot side stays map-only") {
    val orders = Tables.load(spark, sf, "orders")
    val plan = CdcOps.mergeUpsert(orders, CdcOps.changeBatch(orders))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    // the only exchange before the final presentation sort should be
    // the broadcast itself — no hash repartition of the snapshot
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }
}
