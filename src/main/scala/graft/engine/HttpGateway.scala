package graft.engine

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

/** The reference's HTTP transport bound to [[Router.dispatch]] — the
  * K5 surface: a loopback daemon whose every response passes the CORS
  * gateKeeper (`/root/reference/index.js:193-220`) and whose
  * query/legacy/ffi routes answer with the reference's byte-exact
  * envelopes (`itsGood` / `sendError`, index.js:253-262: success is
  * `{"results":[…],"ok":true}`, errors are `{"ok":false,"error":…}`,
  * both HTTP 200 — Express `res.send(obj)`).
  *
  * gateKeeper parity, in order (index.js:193-201):
  *  1. EVERY response — success, error, catalog — carries the three
  *     CORS headers with the reference's exact values;
  *  2. an OPTIONS request short-circuits to 200 BEFORE any routing,
  *     whatever the path (the preflight contract).
  *
  * `GET /` is `showAPI` (index.js:371-424): the mounted route list by
  * method, query routes enriched with their `dataType.fields` — here
  * the analyzed result schema from [[QueryRegistry.describe]], so the
  * API catalog K1 pins is also served over the wire.
  *
  * Scope note (the reference's own shape): results materialize on the
  * gateway process — the transport is for CATALOG/CONTROL-sized
  * answers, and the registry's limit clamp [1,1000] (F2) bounds every
  * template-backed page. This daemon exists for wire-level parity,
  * not as the 100 TB data path; large results ship through the
  * dataset sinks.
  */
final class HttpGateway private (server: HttpServer,
    pool: java.util.concurrent.ExecutorService, ns: Namespaces,
    spark: SparkSession, dir: String) {

  def port: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$port"
  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
    val os = ex.getResponseBody
    try { if (bytes.nonEmpty) os.write(bytes) } finally os.close()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&").iterator
      .filter(_.contains("="))
      .map { kv =>
        val Array(k, v) = kv.split("=", 2)
        (java.net.URLDecoder.decode(k, "UTF-8"),
          java.net.URLDecoder.decode(v, "UTF-8"))
      }
      .toMap

  /** showAPI: every mounted route, query routes with their analyzed
    * field list (the same exact-by-construction schema strings
    * [[QueryRegistry.describe]] / r_catalog pin). A parameterized
    * template can't compile without its positional args — its fields
    * stay empty, like the reference logging "Query info not found"
    * and returning the bare route (index.js:385-388).
    */
  private def fieldsOf(q: NamedQuery): String =
    scala.util.Try(q.build(spark, dir).schema.fields
      .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(","))
      .getOrElse("")

  /** How many times the catalog was actually BUILT (schema-analyzed) —
    * the memoization contract HttpGatewaySpec pins: any number of
    * `GET /` hits analyze each registered query's plan exactly once.
    */
  @volatile private[graft] var catalogBuilds: Int = 0

  // The catalog is a pure function of (ns contents, spark, dir):
  // compute it at first request and serve the cached bytes afterwards —
  // the reference computes queryInfo once at boot (index.js:117-119),
  // not per request; 237 Catalyst analysis passes per catalog hit was
  // the r13 finding. Namespaces is MUTABLE after boot
  // (register/registerFfi are public), so the memo is keyed on its
  // generation counter: a late-mounted query invalidates the cache and
  // appears on the next `GET /` instead of being served stale forever.
  @volatile private var catalogMemo: (Long, String) = (-1L, "")

  private def catalogJson(): String = {
    val g = ns.generation
    val memo = catalogMemo
    if (memo._1 == g) memo._2
    else {
      catalogBuilds += 1
      val built = buildCatalogJson()
      catalogMemo = (g, built)
      built
    }
  }

  private def buildCatalogJson(): String = {
    val routes = ns.databases.toSeq.sorted.flatMap { db =>
      ns.names(db).toSeq.sorted.map { n =>
        s"""{"path":${jsonStr(s"/q/$db/$n")},"dataType":{"fields":${
          jsonStr(fieldsOf(ns.lookup(db, n).get))}}}"""
      }
    } ++ ns.legacyNames.toSeq.sorted.map { n =>
      s"""{"path":${jsonStr(s"/query/$n")},"dataType":{"fields":${
        jsonStr(fieldsOf(ns.lookupLegacy(n).get))}}}"""
    } ++ ns.ffiServices.toSeq.sorted.flatMap(s =>
      ns.ffiRoutes(s).map(r =>
        s"""{"path":${jsonStr(s"/ffi/$s${r.localpath}")}}"""))
    s"""{"get":[${routes.mkString(",")}]}"""
  }

  private def install(): Unit = {
    server.createContext("/", (ex: HttpExchange) =>
      try {
        // gateKeeper: CORS headers on EVERY response, byte-equal to
        // the reference's three header values
        val h = ex.getResponseHeaders
        h.set("Access-Control-Allow-Origin", "*")
        h.set("Access-Control-Allow-Methods", "GET,PUT,POST,DELETE,OPTIONS")
        h.set("Access-Control-Allow-Headers",
          "Content-Type, Authorization, Content-Length, X-Requested-With")
        if (ex.getRequestMethod == "OPTIONS") {
          // preflight short-circuits before ANY routing (index.js:199-201)
          respond(ex, 200, "")
        } else if (ex.getRequestMethod != "GET") {
          respond(ex, 200, """{"ok":false,"error":"Route not found."}""")
        } else {
          val path = ex.getRequestURI.getPath
          if (path == "/") respond(ex, 200, catalogJson())
          else {
            // request params become $vars (the reference's req.param
            // space); `token` is the session key, not a query var.
            // The whole dispatch+materialize runs in ONE CacheRegistry
            // consumption scope: memo values this request obtains stay
            // pinned until the response rows are materialized, so a
            // concurrent worker thread's builds can never evict a
            // frame out from under this request (4-thread pool).
            val vars = queryParams(ex) - "token"
            CacheRegistry.scoped {
              Router.dispatch(ns, path, vars)(spark, dir) match {
                case Left(err) =>
                  respond(ex, 200,
                    s"""{"ok":false,"error":${jsonStr(err)}}""")
                case Right(df) =>
                  // Driver-side materialization is CLAMPED to the
                  // registry's F2 page bound: an unbounded full-scan
                  // served over HTTP would otherwise be a driver OOM at
                  // scale. take(N) runs an incremental bounded job (no
                  // full collect); clients paging past the clamp use the
                  // registry's keyset pagination. Every declared
                  // reference query pages under the clamp, so envelope
                  // parity is unchanged on the contract surface.
                  val rows = df.toJSON.take(HttpGateway.MaxResultRows)
                  respond(ex, 200,
                    s"""{"results":[${rows.mkString(",")}],"ok":true}""")
              }
            }
          }
        }
      } catch {
        case e: Exception =>
          // getMessage can be null (e.g. bare NPE) — never let the
          // error path itself throw and close the exchange bodyless
          val msg = Option(e.getMessage).getOrElse(e.toString)
          try respond(ex, 200,
            s"""{"ok":false,"error":${jsonStr(msg)}}""")
          catch { case _: Exception => () }
      })
  }
}

object HttpGateway {
  /** Per-response row clamp — the registry's [1,1000] page bound (F2)
    * applied at the transport too, so no route can materialize an
    * unbounded result on the gateway process.
    */
  val MaxResultRows: Int = 1000

  /** Bind 127.0.0.1 on an ephemeral port and serve `ns` over HTTP. */
  def start(ns: Namespaces, spark: SparkSession, dir: String): HttpGateway = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val pool = Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    val g = new HttpGateway(server, pool, ns, spark, dir)
    g.install()
    server.start()
    g
  }
}
