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

  test("compaction shrinks the file count and preserves every row") {
    val (frag, comp, planned) = LayoutOps.compactedDocsDirs(spark, sf)
    def partFiles(dir: String) = new java.io.File(dir).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.toString)
    val before = partFiles(frag)
    val after = partFiles(comp)
    assert(before.length == 48, s"fixture must be fragmented: ${before.length}")
    assert(after.length == planned,
      s"writer produced ${after.length} files, planned $planned")
    assert(after.length < before.length)
    val origRows = Tables.load(spark, sf, "documents").count()
    assert(spark.read.parquet(comp).count() == origRows)
  }

  test("range compaction keeps per-file key ranges disjoint") {
    val (_, comp, _) = LayoutOps.compactedDocsDirs(spark, sf)
    val files = new java.io.File(comp).listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).map(_.toString)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("doc_id").as("lo"), max("doc_id").as("hi")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi <= lo2,
          s"file key ranges overlap ($hi > $lo2) — zone maps would be useless")
      case _ => ()
    }
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
