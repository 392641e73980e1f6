package graft.functions

import java.net.{URI, URISyntaxException}

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native whole-stage-codegen URL canonicalization (guide §4).
  *
  * The Column formulation in [[graft.operators.DomainOps.urlCanonicalize]]
  * calls `parse_url` five times (PROTOCOL, HOST, AUTHORITY, PATH, QUERY)
  * plus three regexes per row — and `parse_url` is RuntimeReplaceable
  * sugar over the interpreted `ParseUrlEvaluator`, so every call re-runs
  * `new java.net.URI(url)` on the full string. Worse, any filter derived
  * from the canonical column (e_link_extract's `dst_doc IS NOT NULL`)
  * inlines the whole chain a second time, tripling the per-row parse
  * count. This kernel parses ONCE and assembles the canonical form in a
  * single pass.
  *
  * Exact-semantics contract (oracle-identity), mirroring the Column
  * chain operation by operation:
  *  - `new URI(url)`; a syntax error throws the engine's INVALID_URL
  *    (ANSI is on, so `parse_url` has failOnError=true — same error
  *    class);
  *  - proto = lower(scheme) — NULL result if absent (matches
  *    `concat(null, …) = NULL`);
  *  - host = lower(getHost) with ONE leading "www." stripped — NULL
  *    result if absent; lowercase is UTF8String.toLowerCase, the same
  *    collation-free lower `Lower` uses;
  *  - port recovered from rawAuthority by the `:(\d+)$` rule (ASCII
  *    digits), kept unless empty or the scheme default (http:80,
  *    https:443);
  *  - path = getRawPath with ONE trailing "/" removed — NULL result if
  *    absent (opaque URI);
  *  - query = getRawQuery split on "&" with limit -1 (Spark `split`
  *    keeps trailing empties), parts sorted in UTF8 binary order
  *    (`array_sort` on strings), joined with "&" and prefixed "?";
  *    absent or empty query contributes nothing;
  *  - fragment dropped.
  *
  * UrlCanonSpec pins byte-equality against the original Column chain
  * over the gate's synthesized URL surface plus adversarial forms.
  */
object UrlExprs {

  /** The identical condition (class INVALID_URL, sqlState 22P02)
    * parse_url raises under ANSI. QueryExecutionErrors.invalidUrlError
    * and the exception's Scala signature are private[spark], but the
    * (String errorClass, java.util.Map params) constructor is public
    * bytecode — reached reflectively once per (rare) failure.
    */
  private def invalidUrl(url: String, cause: URISyntaxException): RuntimeException = {
    val params = new java.util.HashMap[String, String]()
    params.put("url", url)
    val ex = Class.forName("org.apache.spark.SparkIllegalArgumentException")
      .getConstructor(classOf[String], classOf[java.util.Map[String, String]])
      .newInstance("INVALID_URL", params)
      .asInstanceOf[RuntimeException]
    ex.initCause(cause)
    ex
  }

  /** Single-parse canonical form; null on missing scheme/host/path.
    * Static-forwarded so generated code can call it directly.
    */
  def canon(url: UTF8String): UTF8String = {
    val uri =
      try new URI(url.toString)
      catch {
        case e: URISyntaxException =>
          throw invalidUrl(url.toString, e)
      }
    val scheme = uri.getScheme
    val host = uri.getHost
    val path = uri.getRawPath
    if (scheme == null || host == null || path == null) return null

    val proto = UTF8String.fromString(scheme).toLowerCase.toString
    var h = UTF8String.fromString(host).toLowerCase.toString
    if (h.startsWith("www.")) h = h.substring(4)

    // :(\d+)$ over the raw authority — ASCII digits only, ≥1 of them
    val auth = uri.getRawAuthority
    var port = ""
    if (auth != null) {
      var i = auth.length - 1
      while (i >= 0 && auth.charAt(i) >= '0' && auth.charAt(i) <= '9') i -= 1
      if (i >= 0 && i < auth.length - 1 && auth.charAt(i) == ':')
        port = auth.substring(i + 1)
    }
    val defaultPort = (proto == "http" && port == "80") ||
      (proto == "https" && port == "443")
    val portPart = if (port.isEmpty || defaultPort) "" else ":" + port

    val p = if (path.endsWith("/")) path.substring(0, path.length - 1)
      else path

    val q = uri.getRawQuery
    val sb = new java.lang.StringBuilder(url.numBytes + 8)
    sb.append(proto).append("://").append(h).append(portPart).append(p)
    if (q != null && !q.isEmpty) {
      // Spark split(q, "&") keeps trailing empties (limit -1); sort is
      // array_sort's UTF8 binary order
      val parts = q.split("&", -1).map(UTF8String.fromString)
      java.util.Arrays.sort(parts.asInstanceOf[Array[AnyRef]])
      sb.append('?')
      var i = 0
      while (i < parts.length) {
        if (i > 0) sb.append('&')
        sb.append(parts(i).toString)
        i += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Canonicalize a URL string column in one parse. */
  case class UrlCanon(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"url_canon requires STRING, got ${child.dataType.sql}")

    override protected def nullSafeEval(input: Any): Any =
      canon(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, u => {
        s"""
           |${ev.value} = graft.functions.UrlExprs.canon($u);
           |${ev.isNull} = ${ev.value} == null;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): UrlCanon =
      copy(child = newChild)
  }

  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register the kernel in `spark` (idempotent per session). */
  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "url_canon", exprs => UrlCanon(exprs.head), "built-in")
    }

  def urlCanon(u: Column): Column = {
    register(SparkSession.active)
    org.apache.spark.sql.functions.call_function("url_canon", u)
  }
}
