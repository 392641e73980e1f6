package tmpprobe

import org.apache.spark.sql.SparkSession

/** Dev-loop single-query probe: runs one SparkEntry query at a given
  * sf dir, writes the parquet + oracle_sql.json the way Verify does,
  * for tools/check.py. DELETE before round end.
  */
object ProbeOne {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    for (name <- names.split(",")) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.mode("overwrite").parquet(s"$outDir/$name")
    }
    val json = graft.SparkEntry.oracleSql
      .map { case (k, v) =>
        "\"" + k + "\": " + com.fasterxml.jackson.databind.json.JsonMapper
          .builder().build().writeValueAsString(v)
      }.mkString("{", ",\n", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.getBytes("UTF-8"))
    spark.stop()
  }
}
