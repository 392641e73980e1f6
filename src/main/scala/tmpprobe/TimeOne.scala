package tmpprobe

import org.apache.spark.sql.SparkSession

/** Dev-loop per-query timing probe (noop sink, warmup + min-of-2). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def runFull(name: String): Unit =
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    runFull("r_inner_join")
    for (name <- names.split(",")) {
      runFull(name)
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); runFull(name); (System.nanoTime() - t0) / 1e9
      }
      println(f"[time] $name%-20s ${ts.min}%6.2f s")
    }
    spark.stop()
  }
}
