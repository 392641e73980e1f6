package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over ARRAY<FLOAT> embedding columns. The kernels (dot,
  * Σx²) are the native whole-stage-codegen expressions in
  * [[VectorExprs]] — the original zip_with/aggregate formulation is a
  * HigherOrderFunction, which Catalyst evaluates INTERPRETED (a boxed
  * lambda round-trip per element, plus a materialized product array
  * per pair for zip_with; BASELINE.md's HOF trap list). Identical
  * arithmetic order, so every oracle hash is unchanged (r16
  * optimization pass, guide §4).
  */
object VectorOps {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dot(a: Column, b: Column): Column = VectorExprs.dot(a, b)

  /** Dot product against a constant query vector (array literal — the
    * broadcast-free way to scan 100 TB of vectors against one probe).
    */
  def dotConst(a: Column, q: Seq[Double]): Column =
    dot(a, typedLit(q))

  def l2Norm(a: Column): Column = sqrt(VectorExprs.sumSq(a))

  /** Cosine similarity; 0 when either side has zero norm. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  def cosineConst(a: Column, q: Seq[Double]): Column = cosine(a, typedLit(q))

  /** Driver-side cosine between two small constant vectors (e.g. query
    * vs centroid list) — plain Scala, no Spark job.
    */
  def cosineSeq(a: Seq[Double], b: Seq[Double]): Double = {
    val d = a.lazyZip(b).map(_ * _).sum
    val n = math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)
    if (n == 0.0) 0.0 else d / n
  }

  /** Deterministic pseudo-random unit-ish hyperplanes for sign-LSH
    * (random hyperplane rounding, Charikar STOC'02). Fixed seed —
    * signatures are reproducible across runs and cluster sizes.
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH signature: bit i = 1 iff v·planeᵢ > 0, packed into a LONG.
    * Vectors with high cosine similarity collide with high probability.
    */
  def signSignature(v: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotConst(v, p) > 0.0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_.bitwiseOR(_))
}
