package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** External-service federation (reference A4: `config.externalServices`,
  * /root/reference/index.js:327-366). The reference pipes remote JSON
  * through opaquely — no schema, not joinable. The Spark-native upgrade
  * materializes fetched JSON into a DataFrame (schema inferred by the
  * JSON source), making remote data a first-class relation.
  *
  * [[fetch]] is the one-shot driver-side form (small feeds: one GET →
  * one DataFrame). For repeated large feeds the scale path is
  * [[RestLikeSource]]'s `baseUrl` mode — a DataSource V2 table whose
  * executors page the endpoint in parallel with pushed filters as
  * query params. Both are exercised against [[HttpFixtureServer]] on
  * loopback (the build sandbox has no public egress, but the HTTP
  * path itself is real).
  */
object ExternalJson {

  /** GET a URL and materialize the JSON response as a DataFrame — the
    * driver-side fetch recipe from SURVEY §1.4. Use for small one-shot
    * feeds; anything paged or repeated belongs on [[RestLikeSource]].
    */
  def fetch(spark: SparkSession, url: String): DataFrame =
    fromJson(spark, RestHttp.get(url))

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
