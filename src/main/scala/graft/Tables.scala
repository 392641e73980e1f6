package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Fixture-table loader. The reference federates named backends under one
  * namespace (/root/reference/index.js:52,112 `dbs{}` keyed by db.name);
  * here the namespace is a directory of parquet tables and the "backend"
  * is Spark's parquet source (vectorized scan, predicate pushdown,
  * column pruning — all free from Catalyst).
  */
object Tables {
  /** All tables the driver generates (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    require(names.contains(name), s"unknown table: $name")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects; sessions
    // set spark.sql.legacy.parquet.nanosAsLong=true, so it arrives as
    // nanos-since-epoch LONG. Truncate to micros (identical to DuckDB's
    // ns→us cast for positive epochs) and restore TimestampType.
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else df
  }

  /** Register every fixture table as a temp view so `spark.sql` queries
    * (parameterized SQL — the Spark-native form of the reference's
    * handlebars templates) can name them directly.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
