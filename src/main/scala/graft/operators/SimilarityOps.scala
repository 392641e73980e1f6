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

  /** IVF-style ANN: nlist=16 coarse cells, nprobe=4. */
  private val annIvf: Q = (spark, dir) => {
    val emb = Tables.load(spark, dir, "embeddings")
    val centroids: Seq[(Int, Seq[Double])] =
      emb.where(col("vec_id") < 16L).orderBy("vec_id")
        .select("vec_id", "embedding").collect().toSeq
        .map { case Row(id: Long, v: scala.collection.Seq[_]) =>
          (id.toInt, v.asInstanceOf[scala.collection.Seq[Float]].toSeq.map(_.toDouble))
        }
    // nearest-cell assignment: argmax over per-centroid cosine columns,
    // via array_max on (sim, idx) structs — pure expressions, codegen'd
    val cellOf = array_max(array(centroids.map { case (i, c) =>
      struct(VectorOps.cosineConst(col("embedding"), c).as("s"), lit(i).as("i"))
    }: _*)).getField("i")
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
