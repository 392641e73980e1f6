package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Domain-level corpus curation — the per-source moves web-scale
  * training-data pipelines apply before any document-level work
  * (C4's blocklist pass, RefinedWeb/Dolma per-domain caps and
  * duplication audits), keyed on the fixture's `source` column.
  *
  * Scale shapes:
  *  - the CAP never sorts a domain's documents globally: the bounded
  *    [[graft.functions.TopK]] aggregator carries at most `cap` rows
  *    per domain through partial aggregation, so a hot domain with
  *    10⁹ docs still ships `cap` rows to its reducer (the
  *    e_topk_per_key mechanism — its window twin is proven identical
  *    by the shared oracle there);
  *  - the REPORT rides the proven md5-minhash near-dup machinery
  *    (one flag semi-join) plus one |domains|-bounded rollup.
  */
object DomainOps {
  type Q = (SparkSession, String) => DataFrame

  /** Cap on documents kept per domain (the gate parameter). */
  val DomainCap = 10

  /** Blocked domains — a C4-style manual blocklist. The fixture's
    * source vocabulary is fixed (src0..src19 at every SF), so the
    * list is a stable constant on the gate.
    */
  val Blocklist = Seq("src3", "src7", "src13")

  /** Per-domain document cap: keep the `cap` highest-priority docs of
    * each domain, priority = (n_chars DESC, doc_id ASC) — the
    * keep-longest discipline at domain granularity. Bounded typed
    * aggregation, not a window: no domain is ever fully sorted and
    * only `cap` rows per domain cross the shuffle.
    */
  def domainCap(docs: DataFrame, cap: Int = DomainCap): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import graft.functions.{Scored, TopK}
    docs.select(col("source"), col("doc_id"), col("n_chars"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, id, nc) => Scored(nc.toDouble, id) }
      .agg(TopK.aggregator(cap).toColumn.name("top"))
      .flatMap { case (src, top) =>
        top.zipWithIndex.map { case (s, i) =>
          (src, s.id, s.score.toLong, i + 1) } }
      .toDF("source", "doc_id", "n_chars", "keep_rank")
  }

  /** Per-domain curation report: document count, near-duplicate count
    * (docs the proven md5-minhash LSH dedup would drop — the
    * e_dedup_minhash_md5 machinery, so the whole report replays in
    * the oracle), duplication rate, blocklist verdict, and the
    * resulting keep budget (0 for blocked domains, survivors
    * otherwise). |domains| rows out at any corpus size.
    */
  def domainReport(docs: DataFrame): DataFrame = {
    val surv = DedupOps.minhashMd5Dedup(docs)
      .select(col("doc_id"), lit(1).as("kept"))
    val blocked = col("source").isin(Blocklist: _*)
    docs.join(surv, Seq("doc_id"), "left_outer")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept").isNull, 1L).otherwise(0L)).as("n_dup"))
      .select(col("source"), col("n_docs"), col("n_dup"),
        round(col("n_dup").cast("double") / col("n_docs"), 6)
          .as("dup_rate"),
        blocked.as("blocked"),
        when(blocked, 0L).otherwise(col("n_docs") - col("n_dup"))
          .as("n_kept"))
  }

  private val domainCapQ: Q = (spark, dir) =>
    domainCap(Tables.load(spark, dir, "documents"))
      .orderBy("source", "keep_rank")

  private val domainReportQ: Q = (spark, dir) =>
    domainReport(Tables.load(spark, dir, "documents"))
      .orderBy("source")

  val queries: Map[String, Q] = Map(
    "e_domain_cap" -> domainCapQ,
    "e_domain_report" -> domainReportQ,
  )

  val oracles: Map[String, String] = Map(
    // the window formulation IS the cap's semantics (row_number over
    // the same total priority order); the engine's bounded aggregator
    // must reproduce it exactly
    "e_domain_cap" ->
      s"""SELECT source, doc_id, n_chars, CAST(rn AS INT) AS keep_rank
         |FROM (
         |  SELECT source, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM documents
         |) t WHERE rn <= $DomainCap
         |ORDER BY source, keep_rank""".stripMargin,
    // dup flags replayed through the full verified-pair chain the
    // minhash-md5 dedup oracle proves; one rollup + the blocklist CASE
    "e_domain_report" -> {
      val inList = Blocklist.map(s => s"'$s'").mkString(", ")
      s"""WITH ${DedupOps.minhashMd5DupsCtes},
         |rep AS (
         |  SELECT d.source, count(*)::BIGINT AS n_docs,
         |    sum(CASE WHEN dups.doc_id IS NULL THEN 0 ELSE 1 END)::BIGINT
         |      AS n_dup
         |  FROM documents d LEFT JOIN dups USING (doc_id)
         |  GROUP BY d.source
         |)
         |SELECT source, n_docs, n_dup,
         |  round(n_dup::DOUBLE / n_docs, 6) AS dup_rate,
         |  source IN ($inList) AS blocked,
         |  CASE WHEN source IN ($inList) THEN 0
         |       ELSE n_docs - n_dup END AS n_kept
         |FROM rep ORDER BY source""".stripMargin
    },
  )
}
