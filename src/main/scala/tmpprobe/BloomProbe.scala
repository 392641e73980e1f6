package tmpprobe

import org.apache.spark.sql.SparkSession

object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    val df = graft.SparkEntry.queries("e_join_bloom")(spark, "/root/testdata/sf0.01")
    val opt = df.queryExecution.optimizedPlan.toString
    println("=== contains might_contain: " + opt.contains("might_contain"))
    println("=== contains bloom: " + opt.toLowerCase.contains("bloom"))
    println(opt.split("\n").filter(l => l.toLowerCase.contains("bloom") || l.contains("might_contain")).take(5).mkString("\n"))
    spark.stop()
  }
}
