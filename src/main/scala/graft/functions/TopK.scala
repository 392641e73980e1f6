package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Scored row for per-key top-k: ordered by (score DESC, id ASC). */
final case class Scored(score: Double, id: Long)

/** Heap-style typed Aggregator keeping the top-k rows per group.
  *
  * The window-function formulation (row_number over partitionBy/orderBy
  * + filter rn<=k) SORTS every group in full; this Aggregator carries
  * at most k rows per group through partial aggregation, so the
  * shuffle moves k rows per key instead of all of them — the
  * difference between sorting 100 TB and sorting k·|keys| rows. Same
  * semantics (proved by the shared oracle with e_window_rank's query).
  */
class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    val merged = (buf :+ x).sortWith(better)
    if (merged.size > k) merged.take(k) else merged
  }

  override def zero: Seq[Scored] = Seq.empty
  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] = insert(buf, x)
  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(insert)
  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  def aggregator(k: Int): TopKAggregator = new TopKAggregator(k)
}
