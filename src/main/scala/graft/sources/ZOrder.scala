package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout
  * key. Sorting a table by `interleave(x, y)` before writing clusters
  * rows that are close in BOTH dimensions into the same files, so
  * min/max file statistics prune scans for predicates on either
  * column — the same layout trick Delta's Z-ORDER and Hudi's
  * space-filling-curve clustering apply before a 100 TB write. The
  * expression is a fold of builtin shift/mask/or columns, so it stays
  * inside whole-stage codegen: computing the key costs one projection.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative integral
    * columns: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * 2·bits ≤ 62 keeps the result in a positive BIGINT.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** The same interleave as DuckDB SQL over expressions `a` and `b` —
    * generated from the same bit layout so engine and oracle are
    * shared-by-construction.
    */
  def interleaveSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(
        s"((($a >> $i) & 1) << ${2 * i + 1})",
        s"((($b >> $i) & 1) << ${2 * i})")
    }.mkString("(", " |\n   ", ")")

  /** Write with the layout a 100 TB reader wants: hash-repartition on
    * the partition column (one writer task per output partition set —
    * avoids the many-small-files explosion of a plain partitionBy over
    * arbitrary task layout), sort rows inside each task by the
    * clustering key (file min/max stats become selective — pass a
    * [[interleave]] column to cluster on two dimensions), then
    * directory-partition. Readers filtering on `partCol` prune whole
    * directories; readers filtering on the sort key prune row groups.
    */
  def writePartitionedSorted(df: org.apache.spark.sql.DataFrame,
      path: String, partCol: String, sortKey: Column): Unit =
    df.repartition(col(partCol))
      .sortWithinPartitions(col(partCol), sortKey)
      .write.mode("overwrite")
      .partitionBy(partCol)
      .parquet(path)
}
