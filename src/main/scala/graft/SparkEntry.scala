package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.QueryRegistry
import graft.functions.{ScalarOps, TextOps}
import graft.multimodal.MultimodalOps
import graft.operators.{AsOfOps, DedupOps, ReferenceOps, RelationalOps, SimilarityOps, SkewOps}
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §2.3/§7.
  *
  * Every implemented operator is a named query here; those with a
  * DuckDB-expressible equivalent also appear in [[oracleSql]] and are
  * hash-checked by the driver at sf0.01 (SURVEY §5).
  */
object SparkEntry {

  /** Flagship query on sf0.001 — the end-to-end training-data pipeline
    * (exact dedup → quality gate → per-language stats, one Catalyst
    * plan); driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    TextOps.queries("e_pipeline_e2e")(spark, "/root/testdata/sf0.001")

  private def baseQueries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceOps.queries ++ RelationalOps.queries ++ ScalarOps.queries ++
      DedupOps.queries ++ SimilarityOps.queries ++ TextOps.queries ++
      MultimodalOps.queries ++ StreamingOps.queries ++ SkewOps.queries ++ AsOfOps.queries

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ Map("r_catalog" -> ((s: SparkSession, d: String) =>
      QueryRegistry.describe(s, d, baseQueries)))

  /** DuckDB-equivalent SQL per oracle-checked query. Column names and
    * aliases match the Spark side exactly (driver sorts columns by name
    * before hashing).
    */
  def oracleSql: Map[String, String] =
    ReferenceOps.oracles ++ RelationalOps.oracles ++ ScalarOps.oracles ++
      DedupOps.oracles ++ SimilarityOps.oracles ++ TextOps.oracles ++
      MultimodalOps.oracles ++ StreamingOps.oracles ++ SkewOps.oracles ++ AsOfOps.oracles
}
