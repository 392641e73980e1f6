package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-service federation (reference A4: `config.externalServices`,
  * /root/reference/index.js:327-366). The reference pipes remote JSON
  * through opaquely — no schema, not joinable. The Spark-native upgrade
  * materializes fetched JSON into a DataFrame (schema inferred by the
  * JSON source), making remote data a first-class relation.
  *
  * The fetch itself is driver-side (this container has no egress; any
  * HTTP client slots into `fromJson`). For repeated large feeds the
  * scale path is a DataSource V2 TableProvider with
  * SupportsPushDownFilters mapping predicates to query-string
  * parameters — flagged in SURVEY §4; not needed for fixture parity.
  */
object ExternalJson {

  /** Materialize a JSON document (object or array of objects, possibly
    * multi-line) into a DataFrame.
    */
  def fromJson(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    spark.read.json(Seq(json).toDS())
  }

  /** Materialize one JSON document per element. */
  def fromJsonLines(spark: SparkSession, lines: Seq[String]): DataFrame = {
    import spark.implicits._
    spark.read.json(lines.toDS())
  }
}
