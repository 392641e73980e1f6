package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) buffer: the k smallest 64-bit hashes seen.
  * A set function of the input — order- and partition-independent, so
  * the estimate is DETERMINISTIC (unlike RNG sampling) while using
  * constant memory like HLL.
  */
final class KmvBuffer(val k: Int) {
  // max-heap via sorted buffer of at most k hashes (k is small)
  var hashes: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    if (hashes.size < k) { hashes.add(h); () }
    else if (h < hashes.last()) {
      if (hashes.add(h)) { hashes.remove(hashes.last()); () }
    }
  }

  def merge(other: KmvBuffer): Unit = {
    val it = other.hashes.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** Standard KMV estimator: (k-1) / F(kth-min) with hashes mapped to
    * (0,1); exact count when fewer than k distinct hashes were seen.
    */
  def estimate: Long =
    if (hashes.size < k) hashes.size.toLong
    else {
      val kth = hashes.last().toLong
      // map signed long to (0,1): (h - Long.Min) / 2^64
      val frac = (kth.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)
      math.round((k - 1) / math.max(frac, java.lang.Double.MIN_VALUE))
    }

  /** KMV estimator for hashes uniform over [0, 2^bits) instead of the
    * full signed-long range — used by the pre-hashed (md5-derived,
    * 60-bit) input path so an external engine computing the same
    * hashes can replay the estimate bit-for-bit.
    */
  def estimateWithDomain(bits: Int): Long =
    if (hashes.size < k) hashes.size.toLong
    else {
      val kth = hashes.last().toLong
      val frac = kth.toDouble / math.pow(2.0, bits)
      math.round((k - 1) / math.max(frac, java.lang.Double.MIN_VALUE))
    }
}

/** Distinct-count sketch over a STRING column as a
  * TypedImperativeAggregate — the Catalyst API Spark's own HLL++ and
  * percentile_approx use (opaque mutable buffer + serialize/merge).
  * Demonstrates the third extension tier after custom Expression
  * (RollingHash) and typed Aggregator (TopKAggregator).
  *
  * Partial aggregation ships one ≤(8k+4)-byte buffer per partition
  * instead of every distinct value — the constant-memory cardinality
  * path, like HLL, but with a deterministic, order-independent
  * estimate (a pure set function of the input).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 256,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  // LONG input = already hashed upstream (e.g. the md5-derived 60-bit
  // hash the DuckDB oracle can also compute): insert raw and estimate
  // over the [0, 2^60) domain. STRING input = hash internally (XXH64).
  private val preHashed = child.dataType == LongType

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) {
      if (preHashed) buf.insert(v.asInstanceOf[Long])
      else {
        val s = v.asInstanceOf[UTF8String]
        buf.insert(XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L))
      }
    }
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (preHashed) buf.estimateWithDomain(60) else buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.hashes.size)
    bb.putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    (0 until n).foreach(_ => buf.insert(bb.getLong))
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvDistinct =
    copy(child = newChildren.head)
}

object KmvDistinct {
  /** Register `kmv_distinct(col)` and return a Column helper. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_distinct",
      exprs => KmvDistinct(exprs.head).toAggregateExpression(),
      "scala_udf")

  def kmvDistinct(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kmv_distinct", c)
  }
}
