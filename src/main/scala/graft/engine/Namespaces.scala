package graft.engine

import scala.collection.concurrent.TrieMap

/** Namespaced query registry with the reference's legacy flat alias
  * namespace. The reference registers every config-declared query
  * twice: under its database namespace (`/q/<db>/<qname>`,
  * `queryInfo[db][qname]`) AND under the bare name
  * (`/query/<qname>`, `legacyQinfo[qname] = info` —
  * `index.js:117-118`, route pair `index.js:318-324`). When two
  * databases declare the same query name the bare-name slot is
  * LAST-WRITER-WINS — intentional reference behavior this mirrors
  * exactly (the namespaced lookup stays unambiguous).
  */
final class Namespaces {
  private val byDb = TrieMap.empty[(String, String), NamedQuery]
  private val legacy = TrieMap.empty[String, NamedQuery]

  /** Bumped on every mutation so caches keyed on registry CONTENT
    * (HttpGateway's catalog memo) can detect late registration instead
    * of serving a stale catalog forever: a query mounted after the
    * first `GET /` dispatches fine, and now also appears in the
    * catalog on the next request.
    */
  private val gen = new java.util.concurrent.atomic.AtomicLong(0L)
  def generation: Long = gen.get()

  /** Startup-only contract (as in the reference, which registers
    * synchronously at boot — index.js:117-118): the two puts are not
    * atomic, so a reader racing a REGISTRATION could briefly see the
    * namespaced entry without its legacy alias. Harmless at startup;
    * synchronize here before adding runtime registration.
    */
  def register(db: String, query: NamedQuery): Unit = {
    byDb.put((db, query.name), query)
    legacy.put(query.name, query) // last writer wins, as in the reference
    gen.incrementAndGet()
  }

  /** `/q/<db>/<qname>` — the namespaced (unambiguous) lookup. */
  def lookup(db: String, name: String): Option[NamedQuery] =
    byDb.get((db, name))

  /** `/query/<qname>` — the legacy bare-name lookup; resolves to the
    * most recently registered query of that name across all databases.
    */
  def lookupLegacy(name: String): Option[NamedQuery] =
    legacy.get(name)

  def databases: Set[String] = byDb.keySet.map(_._1).toSet
  def names(db: String): Set[String] =
    byDb.keySet.collect { case (d, n) if d == db => n }.toSet
  def legacyNames: Set[String] = legacy.keySet.toSet

  // External REST routes (`/ffi/<service><localpath>`, the reference's
  // makeRESTroute registry — index.js:327-366), keyed by service.
  private val ffi = TrieMap.empty[(String, String), ConfigBoot.FfiRoute]

  def registerFfi(r: ConfigBoot.FfiRoute): Unit = {
    ffi.put((r.service, r.localpath), r)
    gen.incrementAndGet()
  }
  def ffiRoutes(service: String): Seq[ConfigBoot.FfiRoute] =
    ffi.collect { case ((s, _), r) if s == service => r }.toSeq
  def ffiServices: Set[String] = ffi.keySet.map(_._1).toSet
}

object Namespaces {
  /** Build a registry from a flat query map under one database name —
    * how SparkEntry's catalog mounts as a namespace.
    */
  def of(db: String,
      queries: Map[String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame],
      oracles: Map[String, String] = Map.empty): Namespaces = {
    val ns = new Namespaces
    queries.foreach { case (name, build) =>
      ns.register(db, NamedQuery(name, build, oracles.get(name)))
    }
    ns
  }
}

/** Route-style dispatch over a [[Namespaces]] registry — the
  * engine-side analog of the reference's route pair
  * (`/q/<db>/<qname>` + legacy `/query/<qname>`, index.js:318-324)
  * with its `{ok:false, error}` envelope (sendError, index.js:260-262).
  * No HTTP layer by scope (SURVEY §1.4): a path string goes in, an
  * `Either[error, DataFrame]` envelope comes out. "Database not
  * found." byte-matches the reference (index.js:440,501,544); an
  * unknown query name has no reference string — the reference only
  * mounts routes for queries that exist, so it 404s at the server —
  * and maps here to a `Query "…" not found.` error in the same
  * envelope (the shape the salesforce plugin uses for services,
  * index.js:608).
  */
object Router {
  /** Trailing path segments are positional `?` args (`/:p1/:p2/…`,
    * index.js:270-272) and `vars` carries `$var` values (the
    * reference's request params, index.js:279) — both only meaningful
    * for template-backed (config-declared) queries; extra segments on
    * a code-registered query fall through to the 404 analog.
    */
  def dispatch(ns: Namespaces, path: String,
      vars: Map[String, String] = Map.empty)(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): Either[String, org.apache.spark.sql.DataFrame] = {
    def runQ(q: NamedQuery, args: List[String]) = q.template match {
      // Express mounts the route with exactly `arity` `:pN` segments
      // (index.js:270-272,318-319), so EXTRA segments never match —
      // 404. FEWER is reachable (params may arrive as query params
      // instead) and surfaces as the handler's `Missing parameter: pN`
      // error; ConfigBoot.run reproduces that shape.
      case Some(t) if args.size > SqlTemplates.positionalArity(t) =>
        Left("Route not found.")
      case Some(t) =>
        SqlTemplates.tryQuery(ConfigBoot.run(spark, dir, t, args, vars))
      case None if args.isEmpty =>
        SqlTemplates.tryQuery(q.build(spark, dir))
      case None => Left("Route not found.")
    }
    path.split("/").filter(_.nonEmpty).toList match {
      case "ffi" :: service :: rest =>
        if (!ns.ffiServices.contains(service)) Left("Route not found.")
        else ns.ffiRoutes(service)
          .find(r => ConfigBoot.ffiMatches(r, rest)) match {
          case None => Left("Route not found.")
          case Some(r) =>
            SqlTemplates.tryQuery(ConfigBoot.runFfi(spark, r, rest))
        }
      // Unknown qname WITH extra segments is a pure Express 404 (no
      // route was ever mounted for any arity); the bare unknown-qname
      // case keeps the documented `Query "…" not found.` envelope.
      case "q" :: db :: qname :: rest =>
        if (!ns.databases.contains(db)) Left("Database not found.")
        else ns.lookup(db, qname) match {
          case None if rest.nonEmpty => Left("Route not found.")
          case None => Left(s"""Query "$qname" not found.""")
          case Some(q) => runQ(q, rest)
        }
      case "query" :: qname :: rest =>
        ns.lookupLegacy(qname) match {
          case None if rest.nonEmpty => Left("Route not found.")
          case None => Left(s"""Query "$qname" not found.""")
          case Some(q) => runQ(q, rest)
        }
      case _ => Left("Route not found.")
    }
  }
}
