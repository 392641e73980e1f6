package graft

import graft.engine.PlanAudit
import graft.operators.LayoutOps
import org.apache.spark.sql.functions._

/** Storage-layout operators: bucketed co-located joins and
  * partition-pruned scans (LayoutOps). The plan COUNTS are pinned on
  * the driver gate via e_plan_audit; these tests pin the facts counts
  * can't express — which join algorithm ran, and which files the
  * pruned scan actually read.
  */
class LayoutSpec extends SparkSpec {

  test("bucketed join runs as SortMergeJoin with no join-side exchange") {
    val df = LayoutOps.queries("e_bucketed_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"merge hint must hold:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"), plan)
    // the only exchanges are the post-join groupBy and the result sort —
    // a non-co-located SMJ would add one hashpartitioning per side
    val exchanges = "Exchange (hash|range)partitioning".r
      .findAllIn(plan).size
    assert(exchanges == 2, s"expected agg+sort exchanges only, got:\n$plan")
    assert(plan.contains("SelectedBucketsCount: 16 out of 16"),
      s"both scans must be bucket-aware:\n$plan")
  }

  test("partition-pruned scan reads only the matching date directory") {
    val part = LayoutOps.partitionedEventsDir(spark, sf)
    val files = spark.read.parquet(part)
      .where(col("d") === lit(java.sql.Date.valueOf("2024-01-15")))
      .select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("d=2024-01-15")),
      s"scan escaped the pruned directory: ${files.mkString(", ")}")
    val r = PlanAudit.audit(LayoutOps.queries("e_partition_prune")(spark, sf))
    assert(r.partitionPrunedScans == 1, r.render)
  }

  test("bucketed join equals the plain parquet join") {
    val viaLayout = LayoutOps.queries("e_bucketed_join")(spark, sf)
    val li = Tables.load(spark, sf, "lineitem")
    val ord = Tables.load(spark, sf, "orders")
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,6)"))
          .cast("double").as("sum_price"))
      .orderBy("o_orderpriority")
    assert(viaLayout.collect().toSeq == plain.collect().toSeq)
  }
}
