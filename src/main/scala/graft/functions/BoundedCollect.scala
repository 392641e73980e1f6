package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Collects at most `cap + 1` smallest ids per group with a BOUNDED
  * buffer — the scale-safe replacement for `collect_list` when a group
  * can be degenerate. An LSH band bucket over a web-scale corpus can
  * hold millions of members (empty docs, boilerplate all share one
  * signature); `collect_list` would grow an executor buffer without
  * limit, while this Aggregator never holds more than ~2·cap ids and
  * ships ≤ cap+1 per group through partial aggregation. Returning
  * cap+1 (not cap) lets the caller distinguish "bucket of exactly cap"
  * from "bucket over cap" and drop the latter.
  *
  * Buffer is trimmed lazily (only when it doubles past the cap) so the
  * common small-bucket path is a cheap append, not a per-row sort.
  */
class BoundedMinIds(cap: Int)
    extends Aggregator[Long, Seq[Long], Seq[Long]] {

  private def trim(s: Seq[Long]): Seq[Long] =
    if (s.size > cap + 1) s.sorted.take(cap + 1) else s

  override def zero: Seq[Long] = Vector.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] = {
    val v = buf :+ x
    if (v.size > 2 * (cap + 1)) trim(v) else v
  }

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = trim(a ++ b)

  override def finish(buf: Seq[Long]): Seq[Long] = trim(buf)

  override def bufferEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
