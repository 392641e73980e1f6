package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All per-row Catalyst expressions (one codegen'd scan,
  * no shuffle) — the shape that processes 100 TB of text at I/O speed.
  *
  * Every type that crosses the oracle boundary is normalized to
  * BIGINT/DOUBLE and arbitrary-double rounding avoids half-way
  * ambiguity (ratios of integer counts).
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(lower(c), " ")

  /** Token counting: whitespace tokens plus a BPE-ish regex pass
    * (letter runs / digit runs / single other chars — the pre-tokenizer
    * split most BPE vocabularies assume).
    */
  private val tokenCount: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(toks(col("text"))).cast("long").as("ws_tokens"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast("long").as("re_tokens"),
      round(col("n_chars").cast("double") /
        greatest(size(toks(col("text"))).cast("double"), lit(1.0)), 4)
        .as("chars_per_token"))
      .orderBy("doc_id")

  private val Stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on",
    "for", "with", "by", "at", "from")

  /** Quality scoring: length, stopword ratio, alpha-character ratio,
    * mean token length — the standard cheap heuristics (C4/Gopher-style
    * filters) composed into one score.
    */
  private val qualityScore: Q = (spark, dir) => {
    val t = toks(col("text"))
    val nTok = size(t).cast("double")
    val stopRatio = size(filter(t, x => x.isin(Stopwords: _*))).cast("double") /
      greatest(nTok, lit(1.0))
    val alphaRatio =
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
        greatest(col("n_chars").cast("double"), lit(1.0))
    val meanTokLen = (col("n_chars").cast("double") - (nTok - 1.0)) /
      greatest(nTok, lit(1.0))
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(meanTokLen, 4).as("mean_token_len"))
      .orderBy("doc_id")
  }

  /** n-gram-heuristic language ID: score = stopword hits per language
    * list; argmax with a fixed tie order (en > de > es > fr > unknown).
    * Real lists would be larger; the operator shape (per-row scoring
    * against broadcast-literal lists) is the production one.
    */
  private val LangStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "un", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "en", "que", "un", "une", "pour"))

  private def langScores: Seq[(String, Column)] = {
    val t = toks(col("text"))
    LangStops.map { case (lang, stops) =>
      lang -> size(filter(t, x => x.isin(stops: _*))).cast("long")
    }
  }

  /** Argmax over the per-language scores; when-chain in list order so
    * earlier languages win ties (en first), matching the oracle's CASE
    * evaluation order.
    */
  private def predLang(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(Option.empty[Column]) { case (acc, (lang, s)) =>
      Some(acc.fold(when(s === best && s > 0, lit(lang)))(
        c => c.when(s === best && s > 0, lit(lang))))
    }.get.otherwise(lit("unknown"))
  }

  def langIdOver(docs: DataFrame): DataFrame = {
    val scores = langScores
    docs.select(
      (col("doc_id") +: scores.map { case (l, s) => s.as(s"score_$l") }) :+
        predLang(scores).as("pred_lang"): _*)
  }

  /** Confusion matrix of the language-ID heuristic against the fixture
    * labels — the evaluation every classifier-driven curation step
    * ships next to its filter. Map-side scoring, one |langs|²-bounded
    * hash aggregation.
    */
  def langConfusionOver(docs: DataFrame): DataFrame =
    docs.select(col("lang"), predLang(langScores).as("pred_lang"))
      .groupBy("lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "pred_lang")

  private val langId: Q = (spark, dir) =>
    langIdOver(Tables.load(spark, dir, "documents")).orderBy("doc_id")

  /** Repetition metrics (Gopher-style filters): fraction of duplicate
    * word bigrams and duplicate tokens. High repetition flags
    * boilerplate/spam — a standard pretraining-quality gate.
    */
  private val repetition: Q = (spark, dir) => {
    // distinct-count over 64-bit token/bigram hashes instead of strings:
    // same counts (collisions are measure-zero at corpus scale) at a
    // fraction of the interpreted-HOF cost; _th staged once per row
    import graft.functions.{TextShingles => TS}
    Tables.load(spark, dir, "documents")
      .withColumn("_th", TS.tokenHashes(col("text")))
      .withColumn("_bh", TS.shingleHashesFrom(col("_th"), 2))
      .select(
        col("doc_id"),
        round(lit(1.0) - size(array_distinct(col("_bh"))).cast("double") /
          greatest(size(col("_bh")), lit(1)).cast("double"), 4).as("rep_bigram"),
        round(lit(1.0) - size(array_distinct(col("_th"))).cast("double") /
          greatest(size(col("_th")), lit(1)).cast("double"), 4).as("rep_token"))
      .orderBy("doc_id")
  }

  /** Document fingerprinting: content hash (md5, oracle-checkable) plus
    * the custom codegen'd polynomial rolling hash ([[RollingHash]]).
    */
  private val fingerprint: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("md5_fp"))
      .orderBy("doc_id")

  /** The custom codegen'd polynomial rolling hash ([[RollingHash]]),
    * oracle-checked against a DuckDB recursive-CTE replay of the same
    * h = h·B + byte (mod 2⁶⁴) recurrence in HUGEINT arithmetic.
    */
  private val fingerprintRolling: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      RollingHash.rollingHash(spark, col("text")).as("roll_fp"))
      .orderBy("doc_id")

  /** Per-language corpus stats (SURVEY §2.3 e_text_stats). */
  private val textStats: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang")

  /** End-to-end training-data pipeline in one plan: exact dedup →
    * quality gate (length + alpha ratio) → per-language corpus stats.
    * The composed query stays a single Catalyst plan — dedup's shuffle,
    * the codegen'd quality filter, and the final aggregation pipeline
    * together with no materialization between stages.
    */
  private val pipelineE2e: Q = (spark, dir) => {
    val alphaRatio =
      length(regexp_replace(col("text"), "[^a-zA-Z]", "")).cast("double") /
        greatest(col("n_chars").cast("double"), lit(1.0))
    graft.operators.DedupOps.exactDedup(Tables.load(spark, dir, "documents"))
      .where(col("n_chars") >= 100 && alphaRatio >= lit(0.8))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        sum(size(toks(col("text")))).cast("long").as("total_tokens"))
      .orderBy("lang")
  }

  /** Deterministic stratified sampling: key-hash modulus instead of
    * `sample()` — reproducible across runs, partitionings, and cluster
    * sizes (RNG-based sampling is none of those), which is what a
    * training-data pipeline needs for auditable subsets. Different
    * strata get different rates (en kept at 2/3, others at 1/3).
    */
  private val sampleStratified: Q = (spark, dir) => {
    val keep = when(col("lang") === "en", pmod(col("doc_id"), lit(3)) < 2)
      .otherwise(pmod(col("doc_id"), lit(3)) < 1)
    Tables.load(spark, dir, "documents")
      .where(keep)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sampled"),
        round(avg(col("n_chars")), 2).as("avg_chars"))
      .orderBy("lang")
  }

  /** Length-weighted deterministic sampling: keep a document iff
    * md5-60bit(doc_id) mod 2000 < n_chars, i.e. P(keep) ≈
    * n_chars/2000, clamped at 1 — importance sampling by length with
    * zero RNG state. The comparison is exact integer arithmetic, so
    * membership is identical under any partitioning and in the
    * oracle; one codegen'd scan plus the tiny per-lang aggregate.
    */
  private val sampleWeighted: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents")
      .where(pmod(TextShingles.md5Hash60(col("doc_id").cast("string")),
        lit(2000L)) < col("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")

  /** Exact corpus length quantiles per language via rank-pick: the
    * value at row_number floor(p·(n−1))+1 of the per-stratum sort. One
    * exchange on lang + one window sort — the distributed-exact path
    * (Spark's `percentile` aggregate buffers every value per group;
    * `approx_percentile` is nondeterministic vs any oracle). The picked
    * index is the lower (type-1) quantile, so results are integers from
    * the data, not interpolations.
    */
  private val lengthQuantiles: Q = (spark, dir) => {
    val byLen = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("n_chars", "doc_id")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    def pick(p: Double) =
      max(when(col("rn") === floor(lit(p) * (col("n") - 1)).cast("long") + 1,
        col("n_chars")))
    Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(byLen).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .groupBy("lang")
      .agg(pick(0.25).as("p25"), pick(0.50).as("p50"), pick(0.90).as("p90"))
      .orderBy("lang")
  }

  /** Interpolated (type-7 / numpy-default) quantiles per language:
    * value = lo + frac·(hi − lo) at virtual index p·(n−1), where lo/hi
    * are the neighboring order statistics picked by rank — the exact
    * distributed form of the interpolation `percentile_cont` performs,
    * without buffering a group's values in one aggregator. Same
    * one-exchange window shape as e_length_quantiles; the closing
    * arithmetic is a fixed double expression both engines evaluate
    * identically (frac is exact: p·(n−1) with p ∈ {.5,.9} and integer
    * n).
    */
  private val quantilesInterp: Q = (spark, dir) => {
    val byLen = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy("n_chars", "doc_id")
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    def at(idx: Column) = max(when(col("rn") === idx + 1, col("n_chars")))
    def interp(p: Double): Column = {
      val virt = lit(p) * (col("n") - 1).cast("double")
      val loIdx = floor(virt).cast("long")
      val frac = virt - loIdx.cast("double")
      val lo = at(loIdx).cast("double")
      val hi = at(least(loIdx + 1, col("n") - 1)).cast("double")
      round(lo + frac * (hi - lo), 4)
    }
    Tables.load(spark, dir, "documents")
      .select(col("lang"), col("n_chars"), col("doc_id"))
      .withColumn("rn", row_number().over(byLen).cast("long"))
      .withColumn("n", count(lit(1)).over(whole))
      .groupBy("lang", "n")
      .agg(interp(0.5).as("p50_interp"), interp(0.9).as("p90_interp"))
      .select(col("lang"), col("p50_interp"), col("p90_interp"))
      .orderBy("lang")
  }

  /** Top-5 terms per language: explode → two-phase count on
    * (lang, term) — map-side combine collapses each partition to its
    * distinct vocabulary before the shuffle — then a per-lang window
    * over the counted vocabulary (bounded by vocabulary size, not
    * corpus size).
    */
  private val topTerms: Q = (spark, dir) => {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("term"))
    Tables.load(spark, dir, "documents")
      .select(col("lang"), explode(TextShingles.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("lang", "term").agg(count(lit(1)).as("cnt"))
      .withColumn("term_rank", row_number().over(w))
      .where(col("term_rank") <= 5)
      .orderBy("lang", "term_rank")
  }

  val CmsDepth = 4
  val CmsWidth = 512L

  /** The CMS bucket for hash row `d`: md5-60bit("d:term") mod width —
    * the cross-engine hash family, so the whole sketch replays in the
    * oracle.
    */
  def cmsBucket(d: Int, term: Column): Column =
    pmod(TextShingles.md5Hash60(concat(lit(s"$d:"), term)), lit(CmsWidth))

  /** The CMS counter build as a reusable transform over any frame with
    * a `text` column — batch AND stream: as a streaming aggregation
    * (complete/update mode) its state is bounded at depth×width rows
    * (2048 here) no matter how long the stream runs, which is the
    * whole point of sketching a heavy-hitter count — pinned by a
    * MemoryStream test that compares the final counters to the batch
    * build.
    */
  def cmsCounters(docs: DataFrame): DataFrame =
    docs.select(explode(TextShingles.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .select(explode(array((0 until CmsDepth).map(d =>
        struct(lit(d).as("d"), cmsBucket(d, col("term")).as("bucket"))): _*))
        .as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(count(lit(1)).as("c"))

  /** Heavy hitters via a count-min sketch, relationally: the sketch
    * build IS a groupBy over (hash_row, bucket) — depth×width counters
    * (4×512 here) regardless of corpus size, reached through map-side
    * combine, so the shuffle carries at most d·w rows per partition.
    * The top-25 exact terms are then probed against the sketch
    * (broadcast: the counter table is 2 KB) and estimated as the
    * row-wise MIN of their d counters — the CMS guarantee est ≥ exact
    * holds by construction and is pinned in tests. At 100 TB you keep
    * the sketch and drop the exact side; it's computed here so the
    * oracle can audit the estimate against truth.
    */
  private val heavyHitters: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    val terms = docs
      .select(explode(TextShingles.tokens(col("text"))).as("term"))
      .where(length(col("term")) > 0)
    // ONE corpus-wide term count feeds both sides; the sketch builds
    // from the counted (Zipf-small) vocabulary — Σ cnt per (d, bucket)
    // is integer-identical to counting occurrences directly
    // ([[cmsCounters]], kept for the streaming lane where a two-stage
    // aggregation is not expressible), but pays 4 md5s per DISTINCT
    // term instead of 4 per token occurrence (r16, guide §2/§4)
    val termCnt = terms.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
    val counters = termCnt
      .select(col("exact_cnt"),
        explode(array((0 until CmsDepth).map(d =>
          struct(lit(d).as("d"), cmsBucket(d, col("term")).as("bucket"))): _*))
          .as("db"))
      .groupBy(col("db.d").as("d"), col("db.bucket").as("bucket"))
      .agg(sum(col("exact_cnt")).as("c"))
    val exactTop = termCnt
      .orderBy(col("exact_cnt").desc, col("term")).limit(25)
    exactTop
      .select(col("term"), col("exact_cnt"),
        explode(array((0 until CmsDepth).map(d =>
          struct(lit(d).as("d"), cmsBucket(d, col("term")).as("bucket"))): _*))
          .as("db"))
      .select(col("term"), col("exact_cnt"),
        col("db.d").as("d"), col("db.bucket").as("bucket"))
      .join(broadcast(counters), Seq("d", "bucket"))
      .groupBy("term", "exact_cnt")
      .agg(min(col("c")).as("cms_est"))
      .orderBy(col("exact_cnt").desc, col("term"))
  }

  /** Corpus-bigram language-model scoring: each document's mean
    * conditional bigram probability p(w₂|w₁) = C(w₁w₂)/C(w₁·) under
    * the corpus's own counts — the statistical-LM stand-in for the
    * model-perplexity quality filter (low score ≈ improbable word
    * sequences ≈ junk). No logarithm: the mean of exact rationals
    * ranks documents the same way mean log-prob does for filtering
    * purposes and, summed through a DECIMAL cast, is bit-reproducible
    * in the oracle where transcendental log ulps are not.
    *
    * Shape at 100 TB: explode to bigrams, two vocabulary-bounded count
    * dims, two shuffle joins keyed on the bigram/prefix, one per-doc
    * aggregation. The count dims are Zipf-small relative to the corpus
    * and broadcast below AQE's threshold.
    */
  private val lmScore: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    // posexplode_outer + lead, NOT explode(wordShingles(_, 2)): the
    // shingle HOF is interpreted and explode's inferred size>0 filter
    // re-evaluates it inside the scan (the e_decontaminate trap —
    // measured 5.4 s vs 1.3 s for this query at sf0.1). The window
    // pairs neighbors codegen'd, one doc_id exchange.
    val toks = docs.select(col("doc_id"),
      posexplode_outer(split(lower(col("text")), "\\s+"))
        .as(Seq("pos", "w1")))
    val wN = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos")
    val bigrams = toks
      .withColumn("w2", lead(col("w1"), 1).over(wN))
      .where(col("w2").isNotNull)
      .select(col("doc_id"), col("w1"),
        concat_ws(" ", col("w1"), col("w2")).as("bigram"))
    // ONE corpus-wide count, keyed (w1, bigram) — the prefix total
    // C(w1·) is the SUM of bigram counts sharing w1, so it derives
    // from the counted (vocabulary-sized) frame with a window instead
    // of a second corpus-wide aggregation; and carrying both counts on
    // one dim row halves the probe joins (2 joins + 2 corpus aggs →
    // 1 join + 1 corpus agg; r16, guide §2 "shuffle fewer bytes")
    val cnt = bigrams.groupBy("w1", "bigram").agg(count(lit(1)).as("c12"))
    val dim = cnt.withColumn("c1",
      sum("c12").over(org.apache.spark.sql.expressions.Window
        .partitionBy("w1")))
      .select("bigram", "c12", "c1")
    // explicit broadcast: the dim is the Zipf-small vocabulary (the
    // side the pre-r16 plan broadcast); without the hint the window on
    // the dim hides its size and Spark flips to broadcasting the
    // corpus-sized bigram probe side — exactly backwards at scale
    bigrams
      .join(broadcast(dim), "bigram")
      .withColumn("p", col("c12").cast("double") / col("c1").cast("double"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("p").cast(DecimalType(18, 12))).cast("double") /
          count(lit(1)).cast("double"), 6).as("lm_score"))
      .orderBy("doc_id")
  }

  /** Character-diversity (Gini impurity) over the letters a–z:
    * 1 − Σ (cnt_c/total)². A repetitive/degenerate document scores
    * near 0 (dominated by few letters); natural text sits near 0.95.
    * Entirely rational arithmetic — the entropy formulation needs a
    * transcendental log; Gini ranks the same pathologies and replays
    * bit-identically. Zero shuffle: 26 codegen'd replace/length pairs
    * per row, written as one left-to-right sum so engine and oracle
    * add in the same IEEE order.
    *
    * ASCII-only contract: [[LetterCounts]] counts raw a–z/A–Z bytes,
    * while the oracle's `lower()` is full Unicode — a character whose
    * Unicode lowercase maps into a–z (U+212A KELVIN SIGN → 'k',
    * 'İ' → 'i'+combining dot) would be counted by the oracle only. The
    * fixture corpus is ASCII-safe for these mappings; a production
    * caller feeding arbitrary Unicode should normalize first (the
    * e_normalize pass strips non-ASCII on both sides).
    */
  private val charDiversity: Q = (spark, dir) => {
    // One codegen'd byte scan produces all 26 counts ([[LetterCounts]]);
    // the expression-only form (26 translate passes, or worse, inline
    // regexp_replace re-evaluated per reference) costs 2.3-4.1 s at
    // sf0.1 against ~0.5 s here. The staged array column keeps
    // CollapseProject from inlining the scan per element_at.
    val staged = Tables.load(spark, dir, "documents")
      .withColumn("lc", LetterCounts.letterCounts(spark, col("text")))
      .select(col("doc_id") +: (0 until 26).map(i =>
        element_at(col("lc"), i + 1).cast("double").as(s"c$i")): _*)
    val counts = (0 until 26).map(i => col(s"c$i"))
    val withTotal = staged.withColumn("total", counts.reduceLeft(_ + _))
    val sumSq = counts.map(c => (c / col("total")) * (c / col("total")))
      .reduceLeft(_ + _)
    withTotal
      .select(col("doc_id"), col("total").cast("long").as("n_letters"),
        when(col("total") > 0, round(lit(1.0) - sumSq, 6)).otherwise(null)
          .as("gini"))
      .orderBy("doc_id")
  }

  /** Content blocklist (the C4 "bad words" move) through the
    * Aho–Corasick automaton ([[AhoMatches]]): a fixed phrase dictionary
    * (single tokens AND multi-word phrases) matched on token boundaries
    * in ONE pass per document — O(len + hits) regardless of dictionary
    * size, where the naive per-phrase `contains` chain the oracle runs
    * is O(len × |dict|). The dictionary includes `"low"`, a strict
    * substring of the vocabulary token `"slow"`, which must match
    * NOTHING — the gate row itself proves word-boundary semantics.
    *
    * Shape at 100 TB: one codegen'd scan, zero shuffle; the automaton
    * rebuilds per executor from the broadcast phrase list (a production
    * 10⁵-phrase blocklist builds in ~ms and lives in MBs).
    */
  private[graft] val BadPhrases: Seq[String] = Seq(
    "the the", "hash hash", "scan scan", "spark spark", "slow slow",
    "stream stream", "key value", "slow merge", "merge merge part",
    "value query scan", "batch batch batch", "low")

  private val badwords: Q = (spark, dir) => {
    val phraseArr = array(BadPhrases.map(lit): _*)
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        AhoMatches.blocklistHits(spark, lower(col("text")), BadPhrases)
          .as("ids"))
      .where(size(col("ids")) > 0)
      .select(col("doc_id"),
        size(col("ids")).cast("long").as("n_hits"),
        array_min(transform(col("ids"), i =>
          element_at(phraseArr, i + 1))).as("first_phrase"))
      .orderBy("doc_id")
  }

  val queries: Map[String, Q] = Map(
    "e_badwords" -> badwords,
    "e_quantiles_interp" -> quantilesInterp,
    "e_lm_score" -> lmScore,
    "e_char_diversity" -> charDiversity,
    "e_heavy_hitters" -> heavyHitters,
    "e_length_quantiles" -> lengthQuantiles,
    "e_top_terms" -> topTerms,
    "e_sample_stratified" -> sampleStratified,
    "e_sample_weighted" -> sampleWeighted,
    "e_pipeline_e2e" -> pipelineE2e,
    "e_token_count" -> tokenCount,
    "e_quality_score" -> qualityScore,
    "e_lang_id" -> langId,
    "e_lang_confusion" -> ((spark, dir) =>
      langConfusionOver(Tables.load(spark, dir, "documents"))),
    "e_repetition" -> repetition,
    "e_fingerprint" -> fingerprint,
    "e_fingerprint_rolling" -> fingerprintRolling,
    "e_text_stats" -> textStats,
  )

  private def sqlStops(stops: Seq[String]): String =
    stops.map(s => s"'$s'").mkString(", ")

  /** Generated a–z count/total/sum-of-squares SQL mirroring the exact
    * left-to-right IEEE addition order of the Spark expression chain.
    */
  private def charDiversitySql: String = {
    val cnts = ('a' to 'z').zipWithIndex.map { case (c, i) =>
      s"(length(t) - length(replace(t, '$c', '')))::DOUBLE AS c$i"
    }.mkString(",\n    ")
    val total = (0 until 26).map(i => s"c$i").mkString(" + ")
    val sumSq = (0 until 26).map(i => s"(c$i / total) * (c$i / total)")
      .mkString(" + ")
    s"""WITH lowered AS (
       |  SELECT doc_id, lower(text) AS t FROM documents
       |), cnts AS (
       |  SELECT doc_id,
       |    $cnts
       |  FROM lowered
       |), tot AS (
       |  SELECT *, $total AS total FROM cnts
       |)
       |SELECT doc_id, total::BIGINT AS n_letters,
       |  CASE WHEN total > 0 THEN round(1.0 - ($sumSq), 6) END AS gini
       |FROM tot ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of [[badwords]]: the oracle states the SEMANTICS
    * (whitespace normalized to single spaces, then boundary-padded
    * LIKE per phrase — the O(len × |dict|) form), the engine must
    * reproduce it through the one-pass automaton's on-the-fly
    * whitespace normalization.
    */
  private def badwordsOracle: String = {
    val vals = BadPhrases.map(p => s"('$p')").mkString(", ")
    s"""WITH p(phrase) AS (VALUES $vals),
       |hits AS (
       |  SELECT d.doc_id, p.phrase
       |  FROM documents d, p
       |  WHERE ' ' || regexp_replace(lower(d.text), '\\s', ' ', 'g') || ' '
       |    LIKE '%' || ' ' || p.phrase || ' ' || '%'
       |)
       |SELECT doc_id, count(*)::BIGINT AS n_hits, min(phrase) AS first_phrase
       |FROM hits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "e_badwords" -> badwordsOracle,
    "e_sample_weighted" ->
      """SELECT lang, count(*)::BIGINT AS n_kept,
        |sum(n_chars)::BIGINT AS sum_chars
        |FROM documents
        |WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 2000
        |  < n_chars
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Mirrors the engine's exact double shapes: virt = p*(n-1),
    // lo_idx = floor(virt), frac = virt - lo_idx, lo + frac*(hi-lo).
    "e_quantiles_interp" ->
      """WITH ranked AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |), agg AS (
        |  SELECT lang, n,
        |    max(CASE WHEN rn = CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
        |        THEN n_chars END) AS lo50,
        |    max(CASE WHEN rn = least(CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1,
        |        n - 1) + 1 THEN n_chars END) AS hi50,
        |    max(CASE WHEN rn = CAST(floor(0.9 * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1
        |        THEN n_chars END) AS lo90,
        |    max(CASE WHEN rn = least(CAST(floor(0.9 * CAST(n - 1 AS DOUBLE)) AS BIGINT) + 1,
        |        n - 1) + 1 THEN n_chars END) AS hi90
        |  FROM ranked GROUP BY lang, n
        |)
        |SELECT lang,
        |  round(CAST(lo50 AS DOUBLE) +
        |    (0.5 * CAST(n - 1 AS DOUBLE) - CAST(CAST(floor(0.5 * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS DOUBLE))
        |    * (CAST(hi50 AS DOUBLE) - CAST(lo50 AS DOUBLE)), 4) AS p50_interp,
        |  round(CAST(lo90 AS DOUBLE) +
        |    (0.9 * CAST(n - 1 AS DOUBLE) - CAST(CAST(floor(0.9 * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS DOUBLE))
        |    * (CAST(hi90 AS DOUBLE) - CAST(lo90 AS DOUBLE)), 4) AS p90_interp
        |FROM agg ORDER BY lang""".stripMargin,
    // Same bigram construction as the e_quality_gate shingle replay
    // (w=2), conditional-probability denominator = bigram instances
    // per prefix token, mean through a DECIMAL(18,12) sum.
    "e_lm_score" ->
      """WITH toked AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents
        |), bigrams AS (
        |  SELECT doc_id,
        |    toks[i] || ' ' || toks[i+1] AS bigram, toks[i] AS w1
        |  FROM toked, unnest(generate_series(1, len(toks) - 1)) AS u(i)
        |  WHERE len(toks) >= 2
        |), c12 AS (
        |  SELECT bigram, count(*) AS c12 FROM bigrams GROUP BY bigram
        |), c1 AS (
        |  SELECT w1, count(*) AS c1 FROM bigrams GROUP BY w1
        |)
        |SELECT b.doc_id, count(*)::BIGINT AS n_bigrams,
        |  round(sum(CAST(c12.c12::DOUBLE / c1.c1::DOUBLE AS DECIMAL(18,12)))::DOUBLE
        |    / count(*)::DOUBLE, 6) AS lm_score
        |FROM bigrams b JOIN c12 USING (bigram) JOIN c1 USING (w1)
        |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin,
    "e_char_diversity" -> charDiversitySql,
    // Full CMS replay: same md5-60bit("d:term") % width bucket family,
    // same 4x512 counter build, same min-of-rows estimate.
    "e_heavy_hitters" ->
      s"""WITH terms AS (
         |  SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
         |  FROM documents
         |), ok AS (
         |  SELECT term FROM terms WHERE length(term) > 0
         |), rows_d AS (
         |  SELECT unnest([${(0 until CmsDepth).mkString(", ")}]) AS d
         |), counters AS (
         |  SELECT d, ('0x' || substr(md5(d::VARCHAR || ':' || term), 1, 15))::BIGINT
         |      % $CmsWidth AS bucket, count(*) AS c
         |  FROM ok, rows_d GROUP BY 1, 2
         |), top AS (
         |  SELECT term, count(*) AS exact_cnt FROM ok GROUP BY term
         |  ORDER BY exact_cnt DESC, term LIMIT 25
         |), probe AS (
         |  SELECT term, exact_cnt, d,
         |    ('0x' || substr(md5(d::VARCHAR || ':' || term), 1, 15))::BIGINT
         |      % $CmsWidth AS bucket
         |  FROM top, rows_d
         |)
         |SELECT term, exact_cnt, min(c) AS cms_est
         |FROM probe JOIN counters USING (d, bucket)
         |GROUP BY term, exact_cnt
         |ORDER BY exact_cnt DESC, term""".stripMargin,
    "e_length_quantiles" ->
      """WITH ranked AS (
        |  SELECT lang, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents
        |)
        |SELECT lang,
        |  max(CASE WHEN rn = floor(0.25 * (n - 1))::BIGINT + 1 THEN n_chars END) AS p25,
        |  max(CASE WHEN rn = floor(0.50 * (n - 1))::BIGINT + 1 THEN n_chars END) AS p50,
        |  max(CASE WHEN rn = floor(0.90 * (n - 1))::BIGINT + 1 THEN n_chars END) AS p90
        |FROM ranked GROUP BY lang ORDER BY lang""".stripMargin,
    "e_top_terms" ->
      """WITH terms AS (
        |  SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS term
        |  FROM documents
        |), counted AS (
        |  SELECT lang, term, count(*) AS cnt FROM terms
        |  WHERE length(term) > 0 GROUP BY lang, term
        |), ranked AS (
        |  SELECT lang, term, cnt,
        |    row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS term_rank
        |  FROM counted
        |)
        |SELECT lang, term, cnt, term_rank FROM ranked
        |WHERE term_rank <= 5 ORDER BY lang, term_rank""".stripMargin,
    "e_token_count" ->
      """SELECT doc_id,
        |CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS re_tokens,
        |ROUND(CAST(n_chars AS DOUBLE) / GREATEST(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 1.0), 4) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e_quality_score" ->
      s"""SELECT doc_id,
         |CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
         |ROUND(CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (${sqlStops(Stopwords)}))) AS DOUBLE) / GREATEST(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 1.0), 4) AS stopword_ratio,
         |ROUND(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / GREATEST(CAST(n_chars AS DOUBLE), 1.0), 4) AS alpha_ratio,
         |ROUND((CAST(n_chars AS DOUBLE) - (CAST(len(string_split(lower(text), ' ')) AS DOUBLE) - 1.0)) / GREATEST(CAST(len(string_split(lower(text), ' ')) AS DOUBLE), 1.0), 4) AS mean_token_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "e_lang_id" -> {
      val scoreExprs = LangStops.map { case (lang, stops) =>
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (${sqlStops(stops)}))) AS BIGINT) AS score_$lang"
      }.mkString(",\n")
      val bestExpr = "GREATEST(" + LangStops.map(_._1).map(l => s"score_$l").mkString(", ") + ")"
      val caseExpr = LangStops.map(_._1).map(l =>
        s"WHEN score_$l = $bestExpr AND score_$l > 0 THEN '$l'").mkString(" ")
      s"""SELECT doc_id, ${LangStops.map(_._1).map(l => s"score_$l").mkString(", ")},
         |CASE $caseExpr ELSE 'unknown' END AS pred_lang FROM (
         |SELECT doc_id, $scoreExprs FROM documents) t ORDER BY doc_id""".stripMargin
    },
    "e_lang_confusion" -> {
      val scoreExprs = LangStops.map { case (lang, stops) =>
        s"CAST(len(list_filter(string_split(lower(text), ' '), x -> x IN (${sqlStops(stops)}))) AS BIGINT) AS score_$lang"
      }.mkString(",\n")
      val bestExpr = "GREATEST(" +
        LangStops.map(_._1).map(l => s"score_$l").mkString(", ") + ")"
      val caseExpr = LangStops.map(_._1).map(l =>
        s"WHEN score_$l = $bestExpr AND score_$l > 0 THEN '$l'").mkString(" ")
      s"""SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs FROM (
         |SELECT lang, CASE $caseExpr ELSE 'unknown' END AS pred_lang FROM (
         |SELECT lang, $scoreExprs FROM documents) t) s
         |GROUP BY lang, pred_lang ORDER BY lang, pred_lang""".stripMargin
    },
    "e_fingerprint" ->
      "SELECT doc_id, md5(text) AS md5_fp FROM documents ORDER BY doc_id",
    // regexp '\s+' tokenizer, NOT string_split on one space: the
    // engine tokenizes on \s+ (TS.tokens), and a whitespace RUN would
    // give the two sides different token lists (r10 self-review; the
    // shingleFeatsCte comment documents the same trap)
    "e_repetition" ->
      """WITH toked AS (
        |  SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS toks
        |  FROM documents
        |)
        |SELECT doc_id,
        |ROUND(1.0 - CAST(len(list_distinct(list_transform(generate_series(1, len(toks)-1),
        |  i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE)
        |  / GREATEST(len(toks)-1, 1), 4) AS rep_bigram,
        |ROUND(1.0 - CAST(len(list_distinct(toks)) AS DOUBLE)
        |  / GREATEST(len(toks), 1), 4) AS rep_token
        |FROM toked ORDER BY doc_id""".stripMargin,
    "e_text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars,
        |COUNT(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "e_sample_stratified" ->
      """SELECT lang, COUNT(*) AS n_sampled, ROUND(AVG(n_chars), 2) AS avg_chars
        |FROM documents
        |WHERE CASE WHEN lang = 'en' THEN doc_id % 3 < 2 ELSE doc_id % 3 < 1 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "e_pipeline_e2e" ->
      """SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars,
        |CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS total_tokens
        |FROM (
        |  SELECT * FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |    FROM documents) d WHERE rn = 1
        |) dd
        |WHERE n_chars >= 100
        |  AND CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |      / GREATEST(CAST(n_chars AS DOUBLE), 1.0) >= 0.8
        |GROUP BY lang ORDER BY lang""".stripMargin,
    // Replays RollingHash's h = h·1000003 + byte (mod 2⁶⁴) recurrence
    // as a recursive CTE in HUGEINT arithmetic, then maps the result
    // back to the signed-long domain. ascii(substr(..)) == the UTF-8
    // byte because the synthetic corpus is pure ASCII (verified at
    // sf0.01 and sf0.1: octet_length(encode(text)) == length(text)
    // for every row).
    "e_fingerprint_rolling" ->
      """WITH RECURSIVE roll(doc_id, i, n, h) AS (
        |  SELECT doc_id, 0, length(text), 0::HUGEINT FROM documents
        |  UNION ALL
        |  SELECT r.doc_id, r.i + 1, r.n,
        |    (r.h * 1000003 + ascii(substr(d.text, r.i + 1, 1)))
        |      % 18446744073709551616::HUGEINT
        |  FROM roll r JOIN documents d ON r.doc_id = d.doc_id WHERE r.i < r.n
        |)
        |SELECT doc_id,
        |  CASE WHEN h >= 9223372036854775808::HUGEINT
        |       THEN (h - 18446744073709551616::HUGEINT)::BIGINT
        |       ELSE h::BIGINT END AS roll_fp
        |FROM roll WHERE i = n ORDER BY doc_id""".stripMargin,
  )
}
