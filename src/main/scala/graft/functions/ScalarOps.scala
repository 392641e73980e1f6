package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Scalar-function coverage (SURVEY §2.3 `e_str/date/math/json/array
  * _funcs`, `e_tumbling_batch`). The reference evaluates no scalar SQL
  * functions itself (it only parses around them — examiner.js:88-109);
  * these exercise the engine-side function surface over the fixture
  * columns built for them (events.props JSON, embeddings.embedding).
  *
  * All of these are Catalyst built-in expressions → whole-stage codegen;
  * no UDFs anywhere in the hot path.
  *
  * Type discipline: function return types are normalized to BIGINT/DOUBLE
  * on BOTH sides (Spark year() is INT, DuckDB's is BIGINT; Spark floor()
  * is BIGINT, DuckDB's is DOUBLE) so the driver's hash compare sees
  * identical types. Rounding on doubles goes through DECIMAL casts
  * (half-up on exact decimal digits in both engines) — never raw
  * double rounding, whose half-way cases depend on binary representation.
  */
object ScalarOps {
  type Q = (SparkSession, String) => DataFrame

  private val strFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "part").select(
      col("p_partkey"),
      upper(col("p_name")).as("upper_name"),
      substring(col("p_name"), 1, 8).as("name_prefix"),
      concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
      length(col("p_name")).cast("long").as("name_len"))
      .orderBy("p_partkey")

  private val dateFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders").select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("yr"),
      month(col("o_orderdate")).cast("long").as("mo"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
        .cast("long").as("days_since"))
      .orderBy("o_orderkey")

  private val mathFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_linenumber"),
      round(col("l_extendedprice").cast(DecimalType(18, 2)), 1)
        .cast("double").as("price_r"),
      abs(col("l_discount") - lit(0.05)).as("disc_dev"),
      floor(col("l_quantity")).cast("long").as("qty_floor"),
      (col("l_partkey") % 10).cast("long").as("pk_mod"))
      .orderBy("l_orderkey", "l_linenumber")

  /** JSON extraction over events.props ({"k": N} text). get_json_object
    * is a codegen'd path expression; no parse-to-struct round trip.
    */
  private val jsonFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "events").select(
      col("event_id"),
      col("event_type"),
      get_json_object(col("props"), "$.k").as("k_str"),
      get_json_object(col("props"), "$.k").cast("long").as("k_num"))
      .orderBy("event_id")

  /** Regex function family: extract / count / replace. Patterns stay
    * in the char-class + group subset where Java regex (Spark) and RE2
    * (DuckDB) agree; DuckDB's regexp_replace needs the 'g' flag to
    * match Spark's replace-all semantics.
    */
  private val regexFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "part").select(
      col("p_partkey"),
      regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
      regexp_count(col("p_name"), lit("[aeiou]")).cast("bigint").as("n_vowels"),
      length(regexp_replace(col("p_name"), "[aeiou]", ""))
        .cast("bigint").as("len_novowels"))
      .orderBy("p_partkey")

  /** Higher-order array functions over ARRAY<FLOAT> embeddings:
    * size + elementwise fold. aggregate() compiles to Catalyst
    * expressions (no UDF). Floats widen exactly to double and fold
    * left-to-right in both engines, so the sum is deterministic.
    */
  private val arrayFuncs: Q = (spark, dir) =>
    Tables.load(spark, dir, "embeddings").select(
      col("vec_id"),
      size(col("embedding")).cast("long").as("dim"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double")), 2).as("vec_sum"))
      .orderBy("vec_id")

  /** Tumbling time windows in batch form: Spark's window() operator
    * (struct of start/end) vs the oracle's date_trunc — same bucketing
    * for hour-aligned tumbling windows. Sum of arbitrary doubles goes
    * through a 6-dp decimal quantization so partial aggregation order
    * can't flip the rounded result.
    */
  private val tumblingBatch: Q = (spark, dir) =>
    // one transform for batch and stream: e_stream_tumbling_replay runs
    // this same aggregation as a streaming query against the same oracle
    graft.streaming.StreamingOps
      .tumblingCounts(Tables.load(spark, dir, "events"))
      .orderBy("hour_start", "event_type")

  /** Sliding time windows in batch form: window(ts, 2h, 1h) assigns
    * each event to the TWO hour-aligned windows covering it (tumbling
    * and session forms live elsewhere; this completes the family). The
    * oracle expands each event into both window starts. Same decimal
    * quantization as [[tumblingBatch]].
    */
  private val slidingBatch: Q = (spark, dir) =>
    // one transform for batch and stream: e_stream_sliding_replay runs
    // this same aggregation as a streaming query against the same oracle
    graft.streaming.StreamingOps
      .slidingCounts(Tables.load(spark, dir, "events"), "2 hours", "1 hour")
      .orderBy("win_start", "event_type")

  val queries: Map[String, Q] = Map(
    "e_sliding_batch" -> slidingBatch,
    "e_str_funcs" -> strFuncs,
    "e_date_funcs" -> dateFuncs,
    "e_math_funcs" -> mathFuncs,
    "e_json_funcs" -> jsonFuncs,
    "e_array_funcs" -> arrayFuncs,
    "e_regex_funcs" -> regexFuncs,
    "e_tumbling_batch" -> tumblingBatch,
  )

  val oracles: Map[String, String] = Map(
    "e_str_funcs" ->
      """SELECT p_partkey, UPPER(p_name) AS upper_name, SUBSTRING(p_name, 1, 8) AS name_prefix,
        |CONCAT(p_brand, '#', p_type) AS brand_type, CAST(LENGTH(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "e_date_funcs" ->
      """SELECT o_orderkey, CAST(YEAR(o_orderdate) AS BIGINT) AS yr,
        |CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
        |DATE_TRUNC('month', o_orderdate) AS month_start,
        |CAST(DATEDIFF('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "e_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r,
        |ABS(l_discount - 0.05) AS disc_dev,
        |CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
        |CAST(l_partkey % 10 AS BIGINT) AS pk_mod
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "e_json_funcs" ->
      """SELECT event_id, event_type,
        |json_extract_string(props, '$.k') AS k_str,
        |CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
        |FROM events ORDER BY event_id""".stripMargin,
    "e_array_funcs" ->
      """SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
        |ROUND(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)), 'sum'), 2) AS vec_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "e_regex_funcs" ->
      """SELECT p_partkey,
        |regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
        |CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS BIGINT) AS len_novowels
        |FROM part ORDER BY p_partkey""".stripMargin,
    "e_tumbling_batch" ->
      """SELECT DATE_TRUNC('hour', ts) AS hour_start, event_type, COUNT(*) AS cnt,
        |CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM events GROUP BY DATE_TRUNC('hour', ts), event_type
        |ORDER BY hour_start, event_type""".stripMargin,
    "e_sliding_batch" ->
      """WITH ev AS (
        |  SELECT event_type, value, DATE_TRUNC('hour', ts) AS h FROM events
        |), expanded AS (
        |  SELECT event_type, value,
        |    unnest([h - INTERVAL 1 HOUR, h]) AS win_start
        |  FROM ev
        |)
        |SELECT win_start, event_type, COUNT(*) AS cnt,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        |FROM expanded GROUP BY win_start, event_type
        |ORDER BY win_start, event_type""".stripMargin,
  )
}
