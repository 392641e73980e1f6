package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shingling + MinHash signatures as pure Catalyst expressions.
  * MinHash/LSH follows the classic scheme (Broder 1997; MMDS ch.3):
  * shingle → per-shingle hash → k permutation-hash minima → banded
  * bucketing. Everything is per-row and codegen'd; the only shuffle in
  * an LSH dedup is the band-bucket exchange, which is how it scales to
  * 100 TB (no O(n²) pair enumeration).
  */
object TextShingles {

  /** 2³¹-1: small enough that (h mod p)·a + b never overflows a LONG —
    * the whole affine hash stays in codegen'd long arithmetic (a DECIMAL
    * detour here cost 60× in practice). 31-bit minhash space is ample:
    * collision odds ~n²/2³² are negligible at realistic shingle counts.
    */
  private val MersennePrime = (1L << 31) - 1

  /** Deterministic affine hash parameters for the k minhash functions. */
  def hashParams(k: Int, seed: Long = 7L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** THE canonicalization rule (lowercase, strip non-[a-z0-9\s],
    * collapse whitespace runs, trim) — shared by normalizeText and
    * exactDedupKeepLongest so the dedup key and the normalize pass
    * cannot drift apart (each had its own verbatim copy before r10).
    */
  def canonical(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  /** Whitespace word tokens, lowercased. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** w-word shingles joined with single spaces; empty array if the doc
    * has fewer than w tokens.
    */
  def wordShingles(text: Column, w: Int): Column = {
    val t = tokens(text)
    when(size(t) >= w,
      transform(sequence(lit(1), size(t) - (w - 1)),
        i => concat_ws(" ", slice(t, i, lit(w)))))
      .otherwise(array())
  }

  /** Character n-grams of the lowercased text (distinct set). The gram
    * pass is the native one-scan [[CharGrams]] kernel — the previous
    * transform(sequence, substr) form was interpreted AND quadratic
    * (SQL substr walks the UTF-8 bytes from the start per call; the
    * CharGrams scaladoc records the measurement). Same strings in the
    * same first-occurrence order, and the when/otherwise null/short
    * lanes are unchanged (null or < n chars → empty array, not null).
    */
  def charGrams(text: Column, n: Int): Column = {
    val t = lower(text)
    when(length(t) >= n,
      array_distinct(CharGrams.charGrams(
        org.apache.spark.sql.SparkSession.active, t, n)))
      .otherwise(array())
  }

  /** xxhash64 of every element (shingle set → hash set). */
  def hashed(arr: Column): Column = transform(arr, x => xxhash64(x))

  /** Token-level hashes — stage this as its own column before calling
    * [[shingleHashesFrom]] (expression trees duplicate subtrees).
    */
  def tokenHashes(text: Column): Column = hashed(tokens(text))

  /** w-token shingle hashes mixed directly from staged token hashes —
    * no shingle string is ever built (concat_ws per shingle was the
    * hot spot in the interpreted HOF pipeline; hashing w longs is ~6×
    * cheaper than building + hashing the string).
    */
  def shingleHashesFrom(th: Column, w: Int): Column =
    when(size(th) >= w,
      transform(sequence(lit(1), size(th) - (w - 1)),
        i => xxhash64((0 until w).map(j => element_at(th, i + lit(j))): _*)))
      .otherwise(array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))

  /** The i-th affine permutation hash of a shingle hash, in overflow-free
    * LONG arithmetic — the scalar building block shared by the HOF
    * signature ([[minhashSignature]]) and the aggregate formulation.
    */
  def affine(h: Column, params: (Long, Long)): Column =
    pmod(pmod(h, lit(MersennePrime)) * lit(params._1) + lit(params._2),
      lit(MersennePrime))

  /** k-element MinHash signature of a hash array. Empty input → nulls,
    * which callers must filter (they can't be near-dups anyway).
    * pmod first maps into [0, 2³¹), so a·h + b < 2⁶² — no overflow even
    * under Spark 4's ANSI mode, and no decimal arithmetic in the loop.
    */
  def minhashSignature(hashes: Column, k: Int, seed: Long = 7L): Column =
    array(hashParams(k, seed).map(p =>
      array_min(transform(hashes, h => affine(h, p)))): _*)

  /** LSH band keys: one xxhash64 per band over its signature slice,
    * tagged with the band index so buckets never cross bands.
    */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        xxhash64(concat_ws(",",
          slice(sig, j * rowsPerBand + 1, rowsPerBand))).as("key"))
    }: _*)

  /** md5-derived 60-bit hash of a string — the cross-engine hash used
    * by the oracle-checkable MinHash variant: DuckDB computes the
    * identical value as ('0x' || substr(md5(s),1,15))::BIGINT, so the
    * whole LSH pipeline can be replayed by the oracle. 15 hex digits
    * keep the value positive and well inside a signed long.
    */
  def md5Hash60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Band keys via [[md5Hash60]] instead of xxhash64 (same structure as
    * [[bandKeys]]) — for pipelines that must be oracle-replayable.
    */
  def bandKeysMd5(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { j =>
      struct(lit(j).as("band"),
        md5Hash60(concat_ws(",",
          slice(sig, j * rowsPerBand + 1, rowsPerBand))).as("key"))
    }: _*)

  /** Exact Jaccard similarity of two (distinct-element) arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }
}
