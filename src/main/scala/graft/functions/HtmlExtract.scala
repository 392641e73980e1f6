package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native HTML main-text extraction (guide §4). The Column form in
  * [[graft.operators.CorpusOps.htmlExtract]] chains SEVEN
  * regexp_replace passes over the full page per row (head, script,
  * style, nav, footer blocks; then every tag; then whitespace
  * collapse) — each a regex-NFA walk of the whole string with a fresh
  * intermediate allocation. This kernel computes the identical result
  * with indexOf-driven scans.
  *
  * Exact-semantics contract, pass for pass (the regexes are
  * case-sensitive and DOTALL, replacement " ", all matches):
  *  1–5. `(?s)<TAG\b[^>]*>.*?</TAG>` → " " for TAG ∈ head, script,
  *     style, nav, footer — in that order. A match needs: `<TAG`
  *     followed by a NON-word char (\b), then the first `>` (that is
  *     what greedy `[^>]*>` selects), then the first literal `</TAG>`
  *     after it (non-greedy `.*?`); absent any of those the start
  *     position fails and the scan resumes one char later, exactly
  *     like the regex engine.
  *  6. `<[^>]+>` → " " — a `<`, at least one non-`>`, then the first
  *     `>`.
  *  7. `\s+` → " " (the Java \s set: space \t \n \x0B \f \r), then
  *     `trim` — which in Spark strips only the ' ' char; after the
  *     collapse any leading/trailing \s run IS a single space, so
  *     skipping boundary runs reproduces trim exactly.
  *
  * HtmlExtractSpec pins byte-equality against the regex chain over
  * synthesized pages and adversarial fragments.
  */
object HtmlExtract {

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** One `(?s)<tag\b[^>]*>.*?</tag>` → " " pass (all matches). */
  private def stripBlocks(s: String, tag: String): String = {
    val open = "<" + tag
    val close = "</" + tag + ">"
    var p = s.indexOf(open)
    if (p < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (p >= 0) {
      val after = p + open.length
      // \b: the char after the tag name must exist and be non-word
      var matched = false
      if (after < s.length && !isWordChar(s.charAt(after))) {
        // [^>]* admits any char but '>' ('<' and newlines included),
        // so greedy-[^>]*-then-'>' selects exactly the FIRST '>'
        val gt = s.indexOf('>', after)
        if (gt >= 0) {
          val end = s.indexOf(close, gt + 1)
          if (end >= 0) {
            sb.append(s, i, p).append(' ')
            i = end + close.length
            matched = true
          }
        }
      }
      p = if (matched) {
        if (i >= s.length) -1 else s.indexOf(open, i)
      } else s.indexOf(open, p + 1)
    }
    if (sb.length == 0 && i == 0) s
    else { sb.append(s, i, s.length); sb.toString }
  }

  /** `<[^>]+>` → " " (all matches), fused with `\s+` → " " + trim. */
  private def stripTagsCollapse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false // a collapsed \s / replaced tag awaiting output
    var emitted = false      // something non-space already in sb (trim)
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        // <[^>]+> needs at least one non-'>' then '>'
        val gt = if (i + 1 < n && s.charAt(i + 1) != '>')
          s.indexOf('>', i + 1) else -1
        if (gt >= 0) {
          pendingSpace = true
          i = gt + 1
        } else {
          if (pendingSpace && emitted) sb.append(' ')
          pendingSpace = false
          sb.append(c); emitted = true
          i += 1
        }
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r') {
        pendingSpace = true
        i += 1
      } else {
        if (pendingSpace && emitted) sb.append(' ')
        pendingSpace = false
        sb.append(c); emitted = true
        i += 1
      }
    }
    sb.toString
  }

  /** The full chain; static-forwarded for generated code. */
  def extract(html: UTF8String): UTF8String = {
    var s = html.toString
    s = stripBlocks(s, "head")
    s = stripBlocks(s, "script")
    s = stripBlocks(s, "style")
    s = stripBlocks(s, "nav")
    s = stripBlocks(s, "footer")
    UTF8String.fromString(stripTagsCollapse(s))
  }

  case class HtmlExtractExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = child.nullable

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"html_extract requires STRING, got ${child.dataType.sql}")

    override protected def nullSafeEval(input: Any): Any =
      extract(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        u => s"graft.functions.HtmlExtract.extract($u)")

    override protected def withNewChildInternal(
        newChild: Expression): HtmlExtractExpr = copy(child = newChild)
  }

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "html_extract", exprs => HtmlExtractExpr(exprs.head), "built-in")
    }

  def htmlExtract(html: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("html_extract", html)
  }
}
