package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy (edit-distance) join — the approximate string-matching join a
  * training-data pipeline runs to link near-identical titles, URLs, or
  * entity names that exact keys miss (the reference's joins are all
  * equi-joins on declared SQL; this is the similarity upgrade of C1).
  *
  * Matching rule: levenshtein(a, b) ≤ d. The naive plan is an all-pairs
  * cross join — quadratic, dead at any scale — so candidates are
  * generated with the SOUND q-gram count filter (Gravano et al., VLDB
  * 2001): ed(a, b) ≤ d implies the multisets of character q-grams share
  * at least max(|a|,|b|) − q + 1 − d·q grams. Candidate pairs come from
  * an equi-join on gram (shuffle keyed by gram — distributes like any
  * token join; AQE splits hot-gram skew), the count bound prunes them,
  * and only survivors pay the levenshtein verify. Strings short enough
  * to make the bound vacuous (max(|a|,|b|) ≤ q−1+d·q) can share zero
  * grams yet still match, so they take a separate all-pairs lane —
  * bounded, because it only ever holds strings ≤ q−1+d·q chars and
  * pairs within |Δlen| ≤ d; at scale that lane stays a rounding error
  * (few real corpora are majority ≤8-char strings) and the two lanes
  * partition the pair space exactly (max ≤ 8 vs max > 8), so no
  * dedup pass is needed.
  *
  * 100 TB shape: explode ≈|s| grams per row (map-side), one gram-keyed
  * shuffle whose width is the gram postings volume, per-pair partial
  * counts map-side combined, verify only on bound survivors. The title
  * re-attach at the end is an id-keyed join, not a second gram pass.
  */
object FuzzyJoinOps {
  type Q = (SparkSession, String) => DataFrame

  private val Qgram = 3
  private val MaxDist = 2
  private val TitleLen = 24

  /** All pairs with levenshtein(title_a, title_b) ≤ d over
    * `titles(id, title)`, as (doc_a, doc_b, dist), doc_a < doc_b.
    */
  def fuzzyJoin(titles: DataFrame, q: Int = Qgram,
      d: Int = MaxDist): DataFrame = {
    val shortMax = q - 1 + d * q // count bound vacuous ⟺ max len ≤ this
    val t = titles.select(col("id"), col("title"),
      length(col("title")).as("len"))
    // character q-gram MULTISET counts — set semantics would undercount
    // shared grams and break the bound's soundness
    val gramCounts = t
      .select(col("id"), col("len"), col("title"),
        explode_outer(when(col("len") >= q,
          sequence(lit(1), col("len") - q + 1, lit(1)))
          .otherwise(array().cast("array<int>"))).as("pos"))
      .where(col("pos").isNotNull)
      .select(col("id"), col("len"),
        col("title").substr(col("pos"), lit(q)).as("gram"))
      .groupBy("id", "len", "gram")
      .agg(count(lit(1)).as("cnt"))
    val a = gramCounts.select(col("id").as("a_id"), col("len").as("a_len"),
      col("gram"), col("cnt").as("a_cnt"))
    val b = gramCounts.select(col("id").as("b_id"), col("len").as("b_len"),
      col("gram"), col("cnt").as("b_cnt"))
    val candLong = a.join(b, Seq("gram"))
      .where(col("a_id") < col("b_id") &&
        abs(col("a_len") - col("b_len")) <= d &&
        greatest(col("a_len"), col("b_len")) > shortMax)
      .groupBy("a_id", "b_id")
      .agg(sum(least(col("a_cnt"), col("b_cnt"))).as("common"),
        max(greatest(col("a_len"), col("b_len"))).as("max_len"))
      .where(col("common") >= col("max_len") - q + 1 - d * q)
      .select("a_id", "b_id")
    val shorts = t.where(col("len") <= shortMax)
    val candShort = shorts.select(col("id").as("a_id"), col("len").as("a_len"))
      .join(shorts.select(col("id").as("b_id"), col("len").as("b_len")),
        col("a_id") < col("b_id") && abs(col("a_len") - col("b_len")) <= d)
      .select("a_id", "b_id")
    candLong.unionByName(candShort)
      .join(t.select(col("id").as("a_id"), col("title").as("a_title")), "a_id")
      .join(t.select(col("id").as("b_id"), col("title").as("b_title")), "b_id")
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        levenshtein(col("a_title"), col("b_title")).as("dist"))
      .where(col("dist") <= d)
      .orderBy("doc_a", "doc_b")
  }

  /** Registered form: 24-char document title prefixes — the fixture's
    * near-duplicate texts produce a dense distance-0/1/2 pair set.
    */
  private val fuzzyJoinQ: Q = (spark, dir) =>
    fuzzyJoin(Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        substring(col("text"), 1, TitleLen).as("title")))

  val queries: Map[String, Q] = Map(
    "e_fuzzy_join" -> fuzzyJoinQ,
  )

  /** Brute-force oracle: the candidate machinery must be INVISIBLE in
    * the result — DuckDB verifies every pair directly (both engines'
    * levenshtein is the standard unit-cost edit distance).
    */
  val oracles: Map[String, String] = Map(
    "e_fuzzy_join" ->
      s"""WITH t AS (
         |  SELECT doc_id, substr(text, 1, $TitleLen) AS title FROM documents
         |)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(levenshtein(a.title, b.title) AS INT) AS dist
         |FROM t a JOIN t b ON a.doc_id < b.doc_id
         |WHERE levenshtein(a.title, b.title) <= $MaxDist
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
