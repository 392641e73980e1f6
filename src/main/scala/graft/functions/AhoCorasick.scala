package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern automaton (Aho & Corasick, CACM 1975) —
  * the content-blocklist primitive the C4 pipeline applies to every
  * document ("bad words" filtering). One pass over the text finds ALL
  * dictionary phrases simultaneously: O(len + matches), independent of
  * the dictionary size, where the naive `exists(phrases, contains)`
  * chain is O(len × |dict|) and a 10⁵-phrase production blocklist makes
  * that 10⁵× slower per byte scanned.
  *
  * Word-boundary semantics: a phrase matches only between token
  * boundaries (`"low"` does NOT match inside `"slow"`). Implemented by
  * compiling each pattern as `' ' + phrase + ' '` and scanning the text
  * as if padded with one leading/trailing space — without materializing
  * the padded string. Overlapping boundary spaces are found naturally:
  * the automaton never consumes input on a match, so back-to-back
  * phrases sharing a separator space both report.
  *
  * Boundary contract: exactly the RE2 `\s` class — `\t \n \f \r ' '`
  * — is a token boundary; the scan normalizes those chars to `' '` on
  * the fly (and the same inside patterns at compile time), so
  * `"low\n"`, `"low\t"` and multi-space runs all delimit. The set is
  * deliberately NARROWER than `Character.isWhitespace` (no U+000B, no
  * U+001C–U+001F, no U+2028/U+2029): the DuckDB oracle normalizes via
  * `regexp_replace(…, '\s', ' ')` whose RE2 `\s` is `[\t\n\f\r ]`
  * only, and the engine must agree with the gate on EVERY input, not
  * just the fixture. Punctuation is deliberately NOT a boundary
  * (`"low."` does not match `low`): that is tokenization policy, not
  * scanning — normalize punctuation upstream (e.g. the e_normalize
  * transform) before the blocklist if the corpus needs it.
  *
  * The automaton is built once per instance from the phrase list and is
  * NOT serialized: the expression ships only the (small) phrase array
  * and each executor rebuilds lazily — the broadcast-dictionary shape.
  * Build cost is O(total pattern chars); transitions live in a LongMap
  * keyed `(state << 16) | char`, so memory is proportional to the trie,
  * not |states| × |alphabet| (a 10⁵-phrase dictionary stays ~MBs).
  */
object AhoCorasickAutomaton {
  /** RE2's `\s` = `[\t\n\f\r ]` — the oracle's normalization set. */
  @inline def isBoundary(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'
}

final class AhoCorasickAutomaton(patterns: Array[String]) extends Serializable {
  import AhoCorasickAutomaton.isBoundary
  @transient private lazy val compiled: (mutable.LongMap[Int], Array[Int], Array[Array[Int]]) = {
    val goto = new mutable.LongMap[Int]()
    // node 0 = root; out(v) = pattern ids whose padded form ends at v
    val outSets = mutable.ArrayBuffer[mutable.ArrayBuffer[Int]](mutable.ArrayBuffer.empty)
    var nNodes = 1
    def key(s: Int, c: Char): Long = (s.toLong << 16) | c.toLong
    patterns.zipWithIndex.foreach { case (p, id) =>
      val padded = " " + p + " "
      var s = 0
      padded.foreach { raw =>
        val c = if (isBoundary(raw)) ' ' else raw
        s = goto.getOrElse(key(s, c), {
          goto(key(s, c)) = nNodes
          outSets += mutable.ArrayBuffer.empty
          nNodes += 1
          nNodes - 1
        })
      }
      outSets(s) += id
    }
    // BFS fail links; merge output sets down the fail chain so search
    // never walks it.
    val fail = new Array[Int](nNodes)
    val queue = mutable.Queue[Int]()
    val rootKids = goto.iterator.filter(_._1 >>> 16 == 0).map(_._2).toSeq
    rootKids.foreach { v => fail(v) = 0; queue += v }
    val kidsOf = goto.toSeq.groupBy(kv => (kv._1 >>> 16).toInt)
      .map { case (s, kvs) => s -> kvs.map(kv => ((kv._1 & 0xffff).toChar, kv._2)) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      kidsOf.getOrElse(u, Seq.empty).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !goto.contains(key(f, c))) f = fail(f)
        val t = goto.getOrElse(key(f, c), 0)
        fail(v) = if (t == v) 0 else t
        outSets(v) ++= outSets(fail(v))
        queue += v
      }
    }
    (goto, fail, outSets.map(_.distinct.sorted.toArray).toArray)
  }

  /** Distinct pattern ids matched in `text` under word-boundary
    * semantics, ascending. One pass, no padded-string allocation.
    */
  def matchedIds(text: String): Array[Int] = {
    val (goto, fail, out) = compiled
    def key(s: Int, c: Char): Long = (s.toLong << 16) | c.toLong
    val hits = new java.util.BitSet(patterns.length)
    var state = 0
    var i = -1
    val n = text.length
    while (i <= n) {
      // virtual padding: position -1 and n read as ' '; the RE2-\s set
      // normalizes to ' ' so tabs/newlines delimit like spaces
      val c =
        if (i < 0 || i >= n) ' '
        else {
          val raw = text.charAt(i)
          if (isBoundary(raw)) ' ' else raw
        }
      var s = state
      while (s != 0 && !goto.contains(key(s, c))) s = fail(s)
      state = goto.getOrElse(key(s, c), 0)
      val o = out(state)
      var j = 0
      while (j < o.length) { hits.set(o(j)); j += 1 }
      i += 1
    }
    val res = new Array[Int](hits.cardinality())
    var b = hits.nextSetBit(0)
    var k = 0
    while (b >= 0) { res(k) = b; k += 1; b = hits.nextSetBit(b + 1) }
    res
  }

  /** Catalyst-facing form (codegen + eval call into this). */
  def matchedArrayData(text: UTF8String): ArrayData =
    new GenericArrayData(matchedIds(text.toString).map(_.asInstanceOf[Any]))
}

/** `blocklist_hits(text, phrases)` as a native Catalyst expression:
  * returns the distinct (ascending) indices into `phrases` that match
  * `text` on token boundaries. Stays inside whole-stage codegen — the
  * generated code makes one virtual call into the per-executor
  * automaton (rebuilt lazily from the shipped phrase list, never
  * serialized), so a 100 TB blocklist scan runs at I/O speed in the
  * same codegen span as the surrounding quality features.
  */
case class AhoMatches(child: Expression, phrases: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"blocklist_hits requires STRING, got ${child.dataType.sql}")

  @transient private lazy val automaton =
    new AhoCorasickAutomaton(phrases.toArray)

  override protected def nullSafeEval(input: Any): Any =
    automaton.matchedArrayData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ac = ctx.addReferenceObj("automaton", automaton,
      classOf[AhoCorasickAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ac.matchedArrayData($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): AhoMatches =
    copy(child = newChild)
}

object AhoMatches {
  /** Registry constructor: the phrase list arrives as a foldable array
    * literal (`array('a','b',…)`), evaluated once at plan time.
    */
  def fromExprs(exprs: Seq[Expression]): AhoMatches = {
    require(exprs.length == 2,
      "blocklist_hits(text, phrases) takes exactly 2 arguments")
    require(exprs(1).foldable,
      "blocklist_hits phrases must be a foldable array literal")
    val phrases = exprs(1).eval() match {
      case a: ArrayData =>
        val arr = a.toArray[UTF8String](StringType)
        // a bare NULL element would NPE deep in map(_.toString) with
        // an unhelpful trace — reject it with the same clear error
        // class as the other shape violations
        require(arr.forall(_ != null),
          "blocklist_hits phrases must not contain NULL")
        arr.map(_.toString).toSeq
      case other =>
        throw new IllegalArgumentException(
          s"blocklist_hits phrases must be ARRAY<STRING>, got $other")
    }
    AhoMatches(exprs.head, phrases)
  }

  /** Register `blocklist_hits` and return the matching Column. */
  def blocklistHits(spark: org.apache.spark.sql.SparkSession, c: Column,
      phrases: Seq[String]): Column = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "blocklist_hits", fromExprs, "built-in")
    org.apache.spark.sql.functions.call_function("blocklist_hits", c,
      org.apache.spark.sql.functions.array(
        phrases.map(org.apache.spark.sql.functions.lit): _*))
  }
}
