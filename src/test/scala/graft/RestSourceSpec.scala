package graft

import org.apache.spark.sql.functions._

class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  private def rest = spark.read
    .format("graft.sources.RestLikeSource")
    .option("pages", "4").option("pageSize", "250").load()

  test("reads all pages in parallel partitions") {
    assert(rest.count() == 1000)
    assert(rest.rdd.getNumPartitions == 4)
    val r = rest.where(col("id") === 500L).head()
    assert(r.getString(1) == "item_500")
  }

  test("id filters push down and prune whole pages") {
    val q = rest.where(col("id") > 750L)
    assert(q.count() == 249)
    // only the last page (ids 750-999) should be planned
    assert(q.rdd.getNumPartitions == 1)
    val point = rest.where(col("id") === 10L)
    assert(point.rdd.getNumPartitions == 1)
    assert(point.count() == 1)
  }

  private def scanPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
        b.inputPartitions.size
    }.get

  test("limit pushdown prunes trailing pages") {
    // 300 rows need pages 0-1 (250 rows each); pages 2-3 never planned
    val q = rest.limit(300)
    assert(scanPartitions(q) == 2, "LIMIT 300 over 250-row pages plans 2")
    assert(q.count() == 300)
    // combined with a pushed filter: id > 250 leaves 249 matches in
    // page 1, enough to cover LIMIT 100 — exactly one page planned
    val fq = rest.where(col("id") > 250L).limit(100)
    assert(scanPartitions(fq) == 1,
      "filter + limit must prune to the single covering page")
    assert(fq.count() == 100)
  }

  test("column pruning reaches the reader") {
    val names = rest.select("name").where(col("id") < 3L)
      .as[String].collect().sorted.toSeq
    assert(names == Seq("item_0", "item_1", "item_2"))
  }

  test("global count/min/max push down completely — no page fetched") {
    val agg = rest.agg(count(lit(1)).as("n"),
      min("id").as("lo"), max("id").as("hi"))
    val p = agg.queryExecution.executedPlan
    assert(!p.toString.contains("HashAggregate"),
      s"completely-pushed aggregate must not re-aggregate in Spark:\n$p")
    assert(scanPartitions(agg) == 1, "aggregate answer is one metadata row")
    val r = agg.head()
    assert(r.getLong(0) == 1000L && r.getLong(1) == 0L && r.getLong(2) == 999L)
  }

  test("pushed filters constrain the pushed aggregate") {
    val r = rest.where(col("id") > 750L)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi")).head()
    assert(r.getLong(0) == 249L && r.getLong(1) == 751L && r.getLong(2) == 999L)
    // empty interval: count 0, null min/max
    val e = rest.where(col("id") > 5000L)
      .agg(count(lit(1)).as("n"), min("id").as("lo")).head()
    assert(e.getLong(0) == 0L && e.isNullAt(1))
  }

  test("boundary filters saturate instead of overflowing the id interval") {
    import org.apache.spark.sql.sources.{GreaterThan, LessThan}
    import graft.sources.RestLikeSource.intervalOf
    // id > Long.MaxValue is unsatisfiable: v+1 must not wrap to
    // Long.MinValue and widen the interval back to everything
    val (a1, b1) = intervalOf(Array(GreaterThan("id", Long.MaxValue)), 0L, 999L)
    assert(b1 < a1, s"impossible predicate must yield an empty interval: [$a1,$b1]")
    val (a2, b2) = intervalOf(Array(LessThan("id", Long.MinValue)), 0L, 999L)
    assert(b2 < a2, s"impossible predicate must yield an empty interval: [$a2,$b2]")
    // and the complete-aggregate path (no local re-filter) answers 0
    val r = rest.where(col("id") > Long.MaxValue)
      .agg(count(lit(1)).as("n"), min("id").as("lo")).head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("grouped or non-id aggregates stay in Spark") {
    val g = rest.groupBy(col("id") % 2).agg(count(lit(1)))
    assert(g.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "grouped aggregate must not be claimed by the source")
    assert(g.count() == 2)
    val s = rest.agg(sum("score"))
    assert(s.queryExecution.executedPlan.toString.contains("HashAggregate"),
      "SUM(score) is not translatable and must aggregate in Spark")
    assert(math.abs(s.head().getDouble(0) - rest.select("score").as[Double]
      .collect().sum) < 1e-9)
  }

  test("remote relation joins with local tables") {
    val local = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name"))
    val joined = rest.join(local, "id")
    assert(joined.count() == 150)
    assert(joined.columns.toSet.contains("c_name"))
  }
}
