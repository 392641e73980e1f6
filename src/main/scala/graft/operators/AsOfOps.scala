package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** As-of (point-in-time) join — for each left row, the latest right row
  * with the same key and right.ts <= left.ts. The reference has nothing
  * like it; time-series/feature-store pipelines need it constantly.
  *
  * Composed from built-ins per the custom-operator preference order
  * (SURVEY §4: compose > custom Expression > custom plan): tag both
  * sides, union, and take the last non-null right-payload struct over a
  * (key) window ordered by (ts, side). That is ONE shuffle on the key
  * plus one sort — the same cost as a sort-merge join — and survives
  * any scale; a 100 TB as-of join has no cheaper lower bound. No custom
  * Catalyst node needed.
  */
object AsOfOps {
  type Q = (SparkSession, String) => DataFrame

  /** Left as-of join. Right columns (minus key/ts) are appended to the
    * left schema, null when no right row precedes the left row. Caller
    * guarantees left/right column names are disjoint apart from `key`.
    * `tolerance` (seconds, optional) voids matches older than
    * left.ts - tolerance.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String,
      tolerance: Option[Long] = None): DataFrame = {
    val rPay = right.columns.toSeq.filterNot(c => c == key || c == rightTs)
    val lPay = left.columns.toSeq.filterNot(_ == key)

    val rSide = right.select(
      col(key), col(rightTs).cast("timestamp").as("_ts"), lit(0).as("_is_left"),
      struct(col(rightTs).cast("timestamp").as("_rts") +: rPay.map(col): _*).as("_r"))
    val rType = rSide.schema("_r").dataType
    val rAligned = lPay.foldLeft(rSide)((df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType)))

    val lAligned = left.select(
      (col(key) +: col(leftTs).cast("timestamp").as("_ts") +:
        lit(1).as("_is_left") +: lit(null).cast(rType).as("_r") +:
        lPay.map(col)): _*)

    // right rows sort before left rows at equal timestamps, so a right
    // row AT the left timestamp matches (>= semantics, like ASOF JOIN)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col("_r"), ignoreNulls = true).over(w)
    val matched = tolerance match {
      case Some(sec) => when(
        matchedRaw.getField("_rts") >=
          (col("_ts") - expr(s"INTERVAL $sec SECONDS")), matchedRaw)
      case None => matchedRaw
    }

    lAligned.unionByName(rAligned.select(lAligned.columns.map(col): _*))
      .withColumn("_m", matched)
      .where(col("_is_left") === 1)
      .select((col(key) +: lPay.map(col)) ++
        rPay.map(c => col("_m").getField(c).as(c)) :+
        col("_m").getField("_rts").as("matched_ts"): _*)
  }

  /** Each click joined to the user's most recent prior view —
    * oracle-checked against DuckDB's native ASOF LEFT JOIN.
    */
  private val asofQuery: Q = (spark, dir) => {
    val events = Tables.load(spark, dir, "events")
    val clicks = events.where(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val views = events.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("value").as("view_value"))
    asofJoin(clicks, views, "user_id", "ts", "view_ts")
      .withColumnRenamed("matched_ts", "view_ts")
      .orderBy("event_id")
  }

  val queries: Map[String, Q] = Map(
    "e_asof_join" -> asofQuery,
  )

  val oracles: Map[String, String] = Map(
    "e_asof_join" ->
      """SELECT l.user_id, l.ts, l.event_id, r.view_value, r.vts AS view_ts
        |FROM (SELECT user_id, ts, event_id FROM events WHERE event_type = 'click') l
        |ASOF LEFT JOIN (SELECT user_id AS ru, ts AS vts, value AS view_value
        |                FROM events WHERE event_type = 'view') r
        |ON l.user_id = r.ru AND l.ts >= r.vts
        |ORDER BY l.event_id""".stripMargin,
  )
}
