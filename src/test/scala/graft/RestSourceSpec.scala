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

  test("column pruning reaches the reader") {
    val names = rest.select("name").where(col("id") < 3L)
      .as[String].collect().sorted.toSeq
    assert(names == Seq("item_0", "item_1", "item_2"))
  }

  test("remote relation joins with local tables") {
    val local = Tables.load(spark, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name"))
    val joined = rest.join(local, "id")
    assert(joined.count() == 150)
    assert(joined.columns.toSet.contains("c_name"))
  }
}
