package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over the embedding column.
  *
  * Two paths, mirroring production vector search:
  *  - brute force: one codegen'd cosine scan + TakeOrderedAndProject
  *    (per-partition top-k heaps, driver merge — no global sort). This
  *    is the exact baseline and already scales linearly.
  *  - IVF: vectors assigned to coarse centroids; the query probes only
  *    the nprobe nearest cells, scanning a fraction of the data. The
  *    centroid list here is a deterministic sample (first nlist vectors);
  *    at 100 TB the list comes from k-means over a sample — the plan
  *    shape (pruned scan + top-k) is identical.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  /** Fetch one embedding as a driver-side literal (single-row lookup). */
  private def vectorOf(spark: SparkSession, dir: String, id: Long): Seq[Double] =
    Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") === lit(id))
      .select("embedding").head()
      .getSeq[Float](0).map(_.toDouble)

  /** Exact top-10 by cosine similarity to vec_id=0 (query row excluded). */
  private val similarityTopk: Q = (spark, dir) => {
    val q = vectorOf(spark, dir, 0L)
    Tables.load(spark, dir, "embeddings")
      .where(col("vec_id") =!= 0L)
      .select(col("vec_id"),
        round(VectorOps.cosineConst(col("embedding"), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** nearest-cell assignment expression for a centroid list. */
  private def cellExpr(centroids: Seq[(Int, Seq[Double])]) =
    array_max(array(centroids.map { case (i, c) =>
      struct(VectorOps.cosineConst(col("embedding"), c).as("s"), lit(i).as("i"))
    }: _*)).getField("i")

  /** Deterministic k-means (Lloyd) for the IVF coarse quantizer:
    * seeded with the first k vectors, `iters` assignment/mean rounds.
    * Each round is one Spark aggregation (posexplode → per-(cell,dim)
    * mean); only k×dim doubles ever reach the driver, so the same code
    * trains the quantizer from a sample at 100 TB.
    */
  def kmeansCentroids(emb: org.apache.spark.sql.DataFrame, k: Int,
      iters: Int): Seq[(Int, Seq[Double])] = {
    var centroids: Seq[(Int, Seq[Double])] =
      emb.where(col("vec_id") < k.toLong).orderBy("vec_id")
        .select("vec_id", "embedding").collect().toSeq
        .map { case Row(id: Long, v: scala.collection.Seq[_]) =>
          (id.toInt, v.asInstanceOf[scala.collection.Seq[Float]].toSeq.map(_.toDouble))
        }
    for (_ <- 1 to iters) {
      val means = emb.withColumn("cell", cellExpr(centroids))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg(col("v")).as("m"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // empty cells keep their previous centroid
      centroids = centroids.map { case (i, c) => (i, means.getOrElse(i, c)) }
    }
    centroids
  }

  /** IVF ANN: k-means coarse quantizer (nlist=16, 2 Lloyd rounds),
    * nprobe=4 — the query scans only the 4 nearest cells.
    */
  private val annIvf: Q = (spark, dir) => {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids = kmeansCentroids(emb, k = 16, iters = 2)
    val cellOf = cellExpr(centroids)
    val q = vectorOf(spark, dir, 0L)
    val probeCells = centroids
      .map { case (i, c) => (i, VectorOps.cosineSeq(q, c)) }
      .sortBy(-_._2).take(4).map(_._1)
    emb.where(col("vec_id") =!= 0L)
      .withColumn("cell", cellOf)
      .where(col("cell").isin(probeCells: _*))
      .select(col("vec_id"),
        round(VectorOps.cosineConst(col("embedding"), q), 6).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  val queries: Map[String, Q] = Map(
    "e_similarity_topk" -> similarityTopk,
    "e_ann_ivf" -> annIvf,
  )

  /** No oracles: DuckDB list-cosine availability/precision is unverified
    * (SURVEY §2.3); both queries are ScalaTest-checked against
    * hand-computed cosines instead.
    */
  val oracles: Map[String, String] = Map.empty
}
