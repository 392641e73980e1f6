package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{TextShingles => TS, VectorOps}

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (100 TB): every variant avoids O(n²) pair enumeration.
  * Candidate pairs come only from LSH band buckets (one shuffle keyed on
  * (band, bucket-hash)); exact similarity is verified on candidates
  * only. Removal is greedy keep-smallest-id per verified pair —
  * single-pass and deterministic (a full connected-component union would
  * need iterative joins / GraphX; the greedy pass is the standard
  * production compromise).
  */
object DedupOps {
  type Q = (SparkSession, String) => DataFrame

  /** Exact dedup on text: hash-partition by the dedup key, keep min id.
    * Window(partitionBy text) = one shuffle on hash(text) — the same
    * plan at any scale.
    */
  def exactDedup(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("text").orderBy("doc_id")
    docs.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  private val dedupExact: Q = (spark, dir) =>
    exactDedup(Tables.load(spark, dir, "documents"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Candidate pairs (a < b) that share at least one LSH band bucket. */
  private def bandPairs(withBands: DataFrame, idCol: String): DataFrame = {
    val exploded = withBands
      .select(col(idCol), explode(col("bands")).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.key").as("key"))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Verify candidate pairs with an exact Jaccard on the feature sets,
    * then drop the larger id of every pair above the threshold.
    */
  private def survivors(
      docs: DataFrame, feats: DataFrame, pairs: DataFrame,
      threshold: Double): DataFrame = {
    val fa = feats.select(col("doc_id").as("id_a"), col("feat").as("feat_a"))
    val fb = feats.select(col("doc_id").as("id_b"), col("feat").as("feat_b"))
    val dups = pairs.join(fa, "id_a").join(fb, "id_b")
      .where(TS.jaccard(col("feat_a"), col("feat_b")) >= threshold)
      .select(col("id_b").as("doc_id")).distinct()
    docs.join(dups, Seq("doc_id"), "left_anti")
  }

  /** MinHash+LSH near-dup removal on 3-word shingles.
    * k=16 hashes, 4 bands × 4 rows → collision prob ≈ 1-(1-s⁴)⁴,
    * catching Jaccard ≳ 0.6 reliably; exact-verify at 0.8.
    */
  def minhashDedup(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val grams = TS.hashed(TS.wordShingles(col("text"), 3))
    val feats = docs.select(col("doc_id"), array_distinct(grams).as("feat"))
    val withBands = docs.select(col("doc_id"),
      TS.bandKeys(TS.minhashSignature(grams, 16), 4, 4).as("bands"))
      .where(size(col("bands")) > 0)
    survivors(docs, feats, bandPairs(withBands, "doc_id"), threshold)
  }

  private val dedupMinhash: Q = (spark, dir) =>
    minhashDedup(Tables.load(spark, dir, "documents"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** 64-bit SimHash (Charikar'02 / Manku WWW'07): per-token hash votes
    * on each bit; near-dups have small Hamming distance. Bit loop is
    * unrolled into 64 codegen'd aggregate expressions (no UDF).
    */
  def simhash(text: Column): Column = {
    val th = TS.hashed(TS.tokens(text))
    (0 until 64).map { i =>
      val bitSum = aggregate(th, lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === lit(1L), lit(1L))
          .otherwise(lit(-1L)))
      when(bitSum > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
  }

  /** SimHash near-dup removal: Manku-style banding — 4 bands of 16 bits;
    * pairs agreeing on ≥1 band are checked for Hamming distance ≤ 3.
    */
  def simhashDedup(docsIn: DataFrame, maxHamming: Int = 3): DataFrame = {
    val docs = docsIn.withColumn("simhash", simhash(col("text")))
    val withBands = docs.select(col("doc_id"),
      array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("simhash"), j * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*).as("bands"))
    val pairs = bandPairs(withBands, "doc_id")
    val sh = docs.select(col("doc_id"), col("simhash"))
    val dups = pairs
      .join(sh.select(col("doc_id").as("id_a"), col("simhash").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("simhash").as("sh_b")), "id_b")
      .where(bit_count(col("sh_a").bitwiseXOR(col("sh_b"))) <= maxHamming)
      .select(col("id_b").as("doc_id")).distinct()
    docs.join(dups, Seq("doc_id"), "left_anti")
  }

  private val dedupSimhash: Q = (spark, dir) =>
    simhashDedup(Tables.load(spark, dir, "documents"))
      .select("doc_id", "simhash")
      .orderBy("doc_id")

  /** Character-3-gram Jaccard near-dup: same LSH candidate machinery
    * over char-gram sets, exact-verified at 0.9.
    */
  def ngramDedup(docs: DataFrame, threshold: Double = 0.9): DataFrame = {
    val grams = TS.hashed(TS.charGrams(col("text"), 3))
    val feats = docs.select(col("doc_id"), array_distinct(grams).as("feat"))
    val withBands = docs.select(col("doc_id"),
      TS.bandKeys(TS.minhashSignature(grams, 16, seed = 11L), 4, 4).as("bands"))
      .where(size(col("bands")) > 0)
    survivors(docs, feats, bandPairs(withBands, "doc_id"), threshold)
  }

  private val dedupNgram: Q = (spark, dir) =>
    ngramDedup(Tables.load(spark, dir, "documents"))
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Embedding-cosine near-dup: 16-bit sign-LSH buckets, in-bucket
    * pairwise cosine ≥ 0.99 removes the larger vec_id. The bucket join
    * shuffles on the signature — never all-pairs.
    */
  def embeddingDedup(vecsIn: DataFrame, dim: Int = 64,
      threshold: Double = 0.99): DataFrame = {
    val planes = VectorOps.hyperplanes(16, dim)
    val vecs = vecsIn
      .withColumn("sig", VectorOps.signSignature(col("embedding"), planes))
    val a = vecs.select(col("vec_id").as("id_a"), col("embedding").as("v_a"), col("sig"))
    val b = vecs.select(col("vec_id").as("id_b"), col("embedding").as("v_b"), col("sig"))
    val dups = a.join(b, Seq("sig")).where(col("id_a") < col("id_b"))
      .where(VectorOps.cosine(col("v_a"), col("v_b")) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    vecs.join(dups, Seq("vec_id"), "left_anti").drop("sig")
  }

  private val dedupEmbedding: Q = (spark, dir) =>
    embeddingDedup(Tables.load(spark, dir, "embeddings"))
      .select("vec_id", "label")
      .orderBy("vec_id")

  val queries: Map[String, Q] = Map(
    "e_dedup_exact" -> dedupExact,
    "e_dedup_minhash" -> dedupMinhash,
    "e_dedup_simhash" -> dedupSimhash,
    "e_dedup_ngram" -> dedupNgram,
    "e_dedup_embedding" -> dedupEmbedding,
  )

  /** Only the exact variant is batch-SQL-expressible for the oracle; the
    * LSH variants are verified by ScalaTest with crafted near-dup docs.
    */
  val oracles: Map[String, String] = Map(
    "e_dedup_exact" ->
      """SELECT doc_id, lang, source, n_chars FROM (
        |SELECT doc_id, lang, source, n_chars,
        |ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
        |FROM documents) t WHERE rn = 1 ORDER BY doc_id""".stripMargin,
  )
}
