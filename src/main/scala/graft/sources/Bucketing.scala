package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed co-located joins — the pre-shuffle strategy for repeated
  * large⋈large joins at 100 TB: write both sides bucketed by the join
  * key once, and every subsequent join on that key reads co-located
  * buckets with NO Exchange on either side (sort-merge over matching
  * bucket files). This is the batch analog of co-partitioned state.
  */
object Bucketing {

  /** Persist a DataFrame as a bucketed table in the session catalog. */
  def saveBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. When both sides are
    * bucketed into the same count, the physical plan shows
    * SortMergeJoin with no ShuffleExchange upstream.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
