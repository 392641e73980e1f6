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

/** Hash-ranked row for per-stratum quota selection: ordered by
  * (h ASC, id ASC). The 60-bit hash doesn't fit a Double mantissa, so
  * this is a Long-scored sibling of [[Scored]]; `quota` rides along
  * because the cap varies per stratum (every row of a group carries the
  * same quota, derived from its key).
  */
final case class Hashed(h: Long, id: Long, quota: Int)

/** Per-group MIN-k with a group-supplied cap: keeps the `quota`
  * smallest (h, id) rows through partial aggregation — the bounded
  * form of "rank ascending, keep rank <= quota" where quota differs
  * per group (the mixture-sampling shape). The shuffle carries at most
  * quota rows per stratum instead of the stratum.
  */
class QuotaMinKAggregator
    extends Aggregator[Hashed, Seq[Hashed], Seq[Hashed]] {

  private def better(a: Hashed, b: Hashed): Boolean =
    a.h < b.h || (a.h == b.h && a.id < b.id)

  private def capped(merged: Seq[Hashed]): Seq[Hashed] = {
    // quota is constant within a group; any element carries it
    val cap = merged.head.quota
    if (merged.size > cap) merged.take(cap) else merged
  }

  override def zero: Seq[Hashed] = Seq.empty
  override def reduce(buf: Seq[Hashed], x: Hashed): Seq[Hashed] =
    capped((buf :+ x).sortWith(better))
  override def merge(a: Seq[Hashed], b: Seq[Hashed]): Seq[Hashed] =
    if (a.isEmpty) b else if (b.isEmpty) a
    else capped((a ++ b).sortWith(better))
  override def finish(buf: Seq[Hashed]): Seq[Hashed] = buf

  override def bufferEncoder: Encoder[Seq[Hashed]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hashed]]()
  override def outputEncoder: Encoder[Seq[Hashed]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Hashed]]()
}

object QuotaMinK {
  def aggregator: QuotaMinKAggregator = new QuotaMinKAggregator
}
