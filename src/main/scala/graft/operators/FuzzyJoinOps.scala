package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fuzzy (edit-distance) join — the approximate string-matching join a
  * training-data pipeline runs to link near-identical titles, URLs, or
  * entity names that exact keys miss (the reference's joins are all
  * equi-joins on declared SQL; this is the similarity upgrade of C1).
  *
  * Matching rule: levenshtein(a, b) ≤ d. The naive plan is an all-pairs
  * cross join — quadratic, dead at any scale. Two filter families were
  * measured here before settling on segments:
  *  - a full q-gram count filter (Gravano et al. VLDB'01) built
  *    per-pair counts over every shared gram: 28 s at sf0.1, because
  *    hot grams each contribute |posting|² pair rows;
  *  - q-gram PREFIX filtering (Chaudhuri et al. ICDE'06) didn't fix
  *    it: this corpus has only ~629 distinct (gram, copy) keys over
  *    5000 titles, so even the globally rarest grams carry ~175-doc
  *    postings and the "rare-prefix" join still emitted 2.76M
  *    candidates for 287 true pairs.
  * The candidate scheme that DOES scale on gram-dense data is the
  * PassJoin pigeonhole partition (Li, Deng, Feng, VLDB 2011): split
  * every string into d+1 segments; ed(a, b) ≤ d forces b to contain
  * at least one of a's segments EXACTLY, starting within ±d of its
  * home position (each edit shifts positions by ≤ 1). Candidates are
  * therefore an equi-join on (partner_len, segment_idx, segment_text)
  * between each string's own segments and each string's O(d²) probe
  * substrings — positional exact 8-char keys, selective even when the
  * q-gram vocabulary is saturated. Measured: 2.76M → ~1k candidates.
  * Pairs short enough for segments to degenerate take a separate
  * all-pairs lane bounded to strings ≤ 8 chars within |Δlen| ≤ d; the
  * lanes partition the pair space exactly (max ≤ 8 vs max > 8), so no
  * cross-lane dedup is needed.
  *
  * 100 TB shape: O(d) index keys and O(d²·(2d+1)) probe keys per
  * string, all generated map-side; ONE equi-join keyed by
  * (len, seg_idx, seg_text); levenshtein verify only on survivors,
  * with the (short) titles riding through the join so no re-attach
  * pass touches the corpus again. No broadcast of the corpus, no
  * quadratic stage; identical-segment groups still meet in the join,
  * but those are overwhelmingly true matches the OUTPUT contains
  * anyway, and AQE splits any residual hot key.
  */
object FuzzyJoinOps {
  type Q = (SparkSession, String) => DataFrame

  private val MaxDist = 2
  private val TitleLen = 24
  private val ShortMax = 8 // all-pairs lane boundary: pair max len ≤ this

  /** All pairs with levenshtein(title_a, title_b) ≤ d over
    * `titles(id, title)`, as (doc_a, doc_b, dist), doc_a < doc_b.
    */
  def fuzzyJoin(titles: DataFrame, d: Int = MaxDist): DataFrame = {
    val k = d + 1 // segment count: pigeonhole over ≤ d edits
    val t = titles.select(col("id"), col("title"),
      length(col("title")).as("len"))
    // segment geometry for a string of length L: the first (L mod k)
    // segments take ceil(L/k) chars, the rest floor(L/k) — fixed by L
    // alone, so both sides of the join derive it independently
    def segStart0(base: Column, rem: Column, i: Column): Column =
      i * base + least(i, rem) // 0-based
    def segLen(base: Column, rem: Column, i: Column): Column =
      base + when(i < rem, 1).otherwise(0)
    // index side: each string's own k segments, keyed by its length
    val idx = t.where(col("len") >= k)
      .select(col("id").as("a_id"), col("len").as("L"),
        col("title").as("a_title"),
        floor(col("len") / lit(k)).cast("int").as("base"),
        (col("len") % lit(k)).cast("int").as("rem"),
        explode(sequence(lit(0), lit(d), lit(1))).as("i"))
      .select(col("a_id"), col("a_title"), col("L"), col("i"),
        col("a_title").substr(
          segStart0(col("base"), col("rem"), col("i")) + 1,
          segLen(col("base"), col("rem"), col("i"))).as("seg"))
    // partner lengths that actually exist in the index — a tiny
    // distinct-lengths dim, broadcast semi-joined so probes are only
    // generated for real partners (the PassJoin length-filter: on a
    // fixed-width title corpus this cuts probe volume (2d+1)×)
    val lenDim = t.where(col("len") >= k)
      .select(col("len").as("L")).distinct()
    // probe side: for every plausible partner length L and segment i,
    // the substrings of THIS string at the segment's home position ±d
    val probe = t.where(col("len") + lit(d) >= lit(k))
      .select(col("id").as("b_id"), col("len").as("b_len"),
        col("title").as("b_title"),
        explode(sequence(greatest(col("len") - d, lit(k)), col("len") + d,
          lit(1))).as("L"))
      .join(broadcast(lenDim), Seq("L"), "left_semi")
      .select(col("b_id"), col("b_len"), col("b_title"), col("L"),
        floor(col("L") / lit(k)).cast("int").as("base"),
        (col("L") % lit(k)).cast("int").as("rem"),
        explode(sequence(lit(0), lit(d), lit(1))).as("i"))
      .select(col("b_id"), col("b_len"), col("b_title"), col("L"), col("i"),
        segStart0(col("base"), col("rem"), col("i")).as("p"),
        segLen(col("base"), col("rem"), col("i")).as("slen"))
      .select(col("b_id"), col("b_len"), col("b_title"), col("L"), col("i"),
        col("slen"),
        explode(when(
          least(col("b_len") - col("slen"), col("p") + d) >=
            greatest(col("p") - d, lit(0)),
          sequence(greatest(col("p") - d, lit(0)),
            least(col("b_len") - col("slen"), col("p") + d), lit(1))))
          .as("s"))
      .select(col("b_id"), col("b_len"), col("b_title"), col("L"), col("i"),
        col("b_title").substr(col("s") + 1, col("slen")).as("seg"))
    // titles ride through the candidate join (they're ≤ TitleLen chars)
    // so no re-attach joins are needed downstream — two fewer stages
    val candSeg = idx.join(probe, Seq("L", "i", "seg"))
      .where(col("a_id") =!= col("b_id") &&
        greatest(col("L"), col("b_len")) > ShortMax)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"),
        when(col("a_id") < col("b_id"), col("a_title"))
          .otherwise(col("b_title")).as("t_a"),
        when(col("a_id") < col("b_id"), col("b_title"))
          .otherwise(col("a_title")).as("t_b"))
    val shorts = t.where(col("len") <= ShortMax)
    val candShort = shorts.select(col("id").as("a_id"),
        col("len").as("a_len"), col("title").as("t_a"))
      .join(shorts.select(col("id").as("b_id"), col("len").as("b_len"),
          col("title").as("t_b")),
        col("a_id") < col("b_id") && abs(col("a_len") - col("b_len")) <= d)
      .select("a_id", "b_id", "t_a", "t_b")
    candSeg.unionByName(candShort)
      .select(col("a_id").as("doc_a"), col("b_id").as("doc_b"),
        levenshtein(col("t_a"), col("t_b")).as("dist"))
      .where(col("dist") <= d)
      .distinct()
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
