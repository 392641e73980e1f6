package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize the fixture's `ts` column to TimestampType regardless of
    * how the generator annotated it — the driver has shipped it as
    * TIMESTAMP(NANOS) (arriving as nanos-since-epoch LONG under
    * spark.sql.legacy.parquet.nanosAsLong=true) and as untagged
    * TIMESTAMP(MICROS) (arriving as TIMESTAMP_NTZ under Spark 4's NTZ
    * inference). Values are UTC wall times and sessions run in UTC, so
    * both conversions are instant-preserving and agree with DuckDB's
    * read of the same file. Works on batch and streaming frames alike.
    */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType =>
      // nanos → micros truncation, identical to DuckDB's ns→us cast for
      // positive epochs
      df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    case TimestampNTZType =>
      // naive-UTC → session-UTC instant; cast in a UTC session is exact
      df.withColumn("ts", col("ts").cast(TimestampType))
    case _ => df
  }

  /** Register every fixture table as a temp view so `spark.sql` queries
    * (parameterized SQL — the Spark-native form of the reference's
    * handlebars templates) can name them directly.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
