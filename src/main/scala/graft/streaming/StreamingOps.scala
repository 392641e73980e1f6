package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.StreamingQuery
import graft.Tables

/** Streaming surface (SURVEY §2.3 e_stream_session). The reference has
  * no stream processing (SURVEY §2.1-I); this is extension surface built
  * on Structured Streaming: event-time windows, watermarks, session
  * windows. The same transform functions apply to batch DataFrames
  * (Spark's unified model), which is how the batch oracle checks the
  * streaming logic.
  */
object StreamingOps {
  type Q = (SparkSession, String) => DataFrame

  /** Session-window aggregation — works on both batch and streaming
    * inputs. 30-minute gap; one shuffle on (user_id) with session merge.
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(DecimalType(18, 6))), 2)
          .cast("double").as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** Tumbling/sliding event-time aggregation with a watermark — the
    * streaming form drops events later than 10 minutes.
    */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col("event_type"), col("cnt"))

  /** Batch form of the session query — oracle-checkable: the gap-based
    * session assignment is expressed in SQL with LAG + running sum.
    */
  private val streamSession: Q = (spark, dir) =>
    sessionize(Tables.load(spark, dir, "events"))
      .orderBy("user_id", "session_start")

  /** Stream-stream interval join: each click joined to the same user's
    * views from the preceding 10 minutes. Watermarks on BOTH sides
    * bound the join state (Spark evicts buffered rows older than
    * watermark + interval) — without them a stream-stream join's state
    * grows without bound.
    */
  def clickViewJoin(clicks: DataFrame, views: DataFrame): DataFrame = {
    val c = clicks.withWatermark("ts", "10 minutes")
    val v = views
      .withColumnRenamed("user_id", "v_user_id")
      .withColumnRenamed("ts", "v_ts")
      .withWatermark("v_ts", "10 minutes")
    c.join(v, expr(
      """user_id = v_user_id AND
        |v_ts BETWEEN ts - INTERVAL 10 MINUTES AND ts""".stripMargin))
  }

  /** File-source streaming replay of the events table through the same
    * sessionize transform, memory-sink'd. Demonstrates the readStream →
    * transform → writeStream path; used by tests, not the batch driver.
    */
  def runSessionStream(spark: SparkSession, dir: String): StreamingQuery = {
    // FileStreamSource needs a directory; stage the single-file fixture
    // into a replay dir (in production the source IS a directory that
    // keeps receiving files).
    val replayDir = java.nio.file.Files.createTempDirectory("graft_replay")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      replayDir.resolve("events.parquet"))
    // raw parquet schema (pre ts-conversion): stream sees what's on disk
    val batchSchema = spark.read.parquet(s"$dir/events.parquet").schema
    val stream = spark.readStream
      .schema(batchSchema)
      .format("parquet")
      .load(replayDir.toString)
    val resolved =
      if (stream.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      else stream
    sessionize(resolved.withWatermark("ts", "10 minutes"))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("graft_sessions")
      .start()
  }

  val queries: Map[String, Q] = Map(
    "e_stream_session" -> streamSession,
  )

  /** Session windows in plain SQL: a session break is a gap ≥ 30 min
    * from the previous event of the same user (Spark's session_window
    * end is exclusive, so `>=`); session id = running sum of breaks.
    */
  val oracles: Map[String, String] = Map(
    "e_stream_session" ->
      """SELECT user_id, MIN(ts) AS session_start,
        |COUNT(*) AS n_events,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM (
        |    SELECT user_id, ts, value,
        |      CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |        >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |    FROM events) g
        |) s
        |GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
