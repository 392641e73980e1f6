package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expression, NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, IsNotNull, LessThan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source modeling a paginated REST endpoint — the scale
  * path for the reference's external-service federation
  * (/root/reference/index.js:327-366, SURVEY §4 "potential future
  * customs"). The reference proxies remote JSON opaquely on the one
  * node; a DSv2 table instead:
  *
  *  - plans one InputPartition per remote page → executors fetch pages
  *    in parallel (here the "endpoint" is a deterministic in-memory
  *    record generator — the container has no egress; an HTTP client
  *    drops into [[RestPageReader.fetchPage]] without touching the
  *    planning code),
  *  - implements SupportsPushDownFilters, translating Catalyst filters
  *    into the query parameters a REST API would accept (`id = n`,
  *    `id > n`, `id < n`) so executors skip non-matching pages — the
  *    DSv2 analog of predicate pushdown into parquet,
  *  - implements SupportsPushDownRequiredColumns (column pruning).
  *
  * Usage: spark.read.format("graft.sources.RestLikeSource")
  *   .option("pages", 4).option("pageSize", 250).load()
  */
class RestLikeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestLikeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RestTable(
      properties.asScala.getOrElse("pages", "4").toInt,
      properties.asScala.getOrElse("pageSize", "250").toInt,
      properties.asScala.get("baseUrl"))
}

object RestLikeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("score", DoubleType, nullable = false)))

  /** The deterministic fake "remote" record for a given id. */
  def record(id: Long): (Long, String, Double) =
    (id, s"item_$id", (id % 97) / 97.0)

  /** Intersect [lo, hi] with every pushed id filter — ids are dense, so
    * the accepted filters fold to ONE interval. The single place the
    * filter→interval translation lives: partition pruning, the agg
    * metadata interval, and the live query-string params all call this,
    * so a new accepted filter type is added here exactly once.
    */
  def intervalOf(pushed: Array[Filter], lo: Long, hi: Long): (Long, Long) = {
    var a = lo
    var b = hi
    // id > Long.MaxValue / id < Long.MinValue are unsatisfiable; v±1
    // would overflow and silently WIDEN the interval instead of
    // emptying it (the complete-aggregate path has no local re-filter,
    // so an overflowed interval would answer COUNT with the full row
    // count). Saturate to the canonical empty interval — max/min keep
    // it empty through any later filter.
    def forceEmpty(): Unit = { a = Long.MaxValue; b = Long.MinValue }
    pushed.foreach {
      case EqualTo("id", v: Long) => a = math.max(a, v); b = math.min(b, v)
      case GreaterThan("id", v: Long) =>
        if (v == Long.MaxValue) forceEmpty() else a = math.max(a, v + 1)
      case LessThan("id", v: Long) =>
        if (v == Long.MinValue) forceEmpty() else b = math.min(b, v - 1)
      case _ =>
    }
    (a, b)
  }
}

class RestTable(pages: Int, pageSize: Int, baseUrl: Option[String])
    extends Table with SupportsRead {
  override def name(): String = s"rest_like($pages pages x $pageSize)"
  override def schema(): StructType = RestLikeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(pages, pageSize, baseUrl)
}

class RestScanBuilder(pages: Int, pageSize: Int, baseUrl: Option[String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RestLikeSource.schema
  private var limit: Option[Int] = None
  private var aggs: Option[Seq[AggregateFunc]] = None

  private def isId(e: Expression): Boolean = e match {
    case nr: NamedReference => nr.fieldNames.sameElements(Array("id"))
    case _ => false
  }

  /** Global COUNT(*) / MIN(id) / MAX(id) answer from page arithmetic —
    * the REST analog of an endpoint's `?count=true` metadata call: no
    * page is fetched at all. Anything else (grouping, other columns)
    * stays in Spark.
    */
  private def translatable(agg: Aggregation): Boolean =
    agg.groupByExpressions.isEmpty && agg.aggregateExpressions.nonEmpty &&
      agg.aggregateExpressions.forall {
        case _: CountStar => true
        case m: Min => isId(m.column)
        case m: Max => isId(m.column)
        case _ => false
      }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translatable(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (translatable(agg)) { aggs = Some(agg.aggregateExpressions.toSeq); true }
    else false

  /** LIMIT n prunes trailing pages the same way the id filters prune
    * non-matching ones — the reference's `perpage` clamp
    * (/root/reference/index.js:475-478) pushed all the way into the
    * source: a REST backend would receive `?limit=n` and stop paging.
    * Partially pushed: whole pages are still fetched, so Spark keeps
    * its own final limit on top.
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  /** Accept id-range filters (what a REST query string could express);
    * everything else stays in Spark as a post-filter. Only Long-valued
    * comparisons are accepted: the appliers (interval/matching) pattern
    * match on `v: Long`, so accepting any other value type here would
    * report a filter as pushed yet silently not apply it — the accepted
    * and applied sets must be the same by construction.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case EqualTo("id", _: java.lang.Long) |
           GreaterThan("id", _: java.lang.Long) |
           LessThan("id", _: java.lang.Long) |
           IsNotNull("id") => true
      case _ => false
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = aggs match {
    case Some(a) => new RestAggScan(pages, pageSize, pushed, a, baseUrl)
    case None => new RestScan(pages, pageSize, pushed, required, limit, baseUrl)
  }
}

/** Completely-pushed global aggregate over the REST source: the answer
  * is computed from the dense-id interval arithmetic the filter pruning
  * already uses, so ZERO pages are fetched — one partition, one row.
  * At 100 TB-of-remote-data scale this is the difference between a
  * metadata call and paging the whole endpoint through the cluster.
  */
class RestAggScan(pages: Int, pageSize: Int, pushed: Array[Filter],
    aggs: Seq[AggregateFunc], baseUrl: Option[String] = None)
    extends Scan with Batch {

  /** Surviving id interval after the pushed filters (ids are dense). */
  private def interval: (Long, Long) =
    RestLikeSource.intervalOf(pushed, 0L, pages.toLong * pageSize - 1)

  override def readSchema(): StructType = StructType(aggs.zipWithIndex.map {
    case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
    case (_, i) => StructField(s"agg_$i", LongType, nullable = true)
  })

  override def toBatch: Batch = this
  override def description(): String =
    s"rest_like_agg_pushdown(${aggs.mkString(", ")})"

  override def planInputPartitions(): Array[InputPartition] =
    Array(RestPage(0, 0))

  override def createReaderFactory(): PartitionReaderFactory = {
    val (a, b) = interval
    val empty = b < a
    // Reduce each pushed agg to a serializable tag at planning time
    // (an unpushable agg fails here, not in a task); the VALUES are
    // produced lazily in the reader — Spark may build the factory more
    // than once per query (explain + execute), and the live metadata
    // call must go out exactly once, from the single planned
    // partition's reader.
    val tags: Seq[String] = aggs.map {
      case _: CountStar => "count"
      case _: Min => "min"
      case _: Max => "max"
      case f => throw new IllegalStateException(s"unpushable agg $f")
    }
    val url = baseUrl
    new SingleRowReaderFactory(() => {
      // Live mode issues the REAL metadata call (`/items/count?min&max`)
      // instead of answering from local arithmetic — the zero-data-pages
      // property is then asserted on the server's request log, not
      // assumed. ALL THREE aggregates come from the one response
      // (count/min/max): against a remote with sparse ids, answering
      // min/max from local dense-id arithmetic while count comes from
      // the wire would make the aggregates disagree with each other.
      // Synthetic mode keeps the arithmetic answer.
      val (count, minV, maxV): (Long, Any, Any) = url match {
        case Some(u) =>
          val body = RestHttp.get(s"$u/items/count?min=$a&max=$b")
          val root = RestHttp.mapper.readTree(body)
          val c = root.get("count").asLong()
          if (c == 0L) (0L, null, null)
          else (c, root.get("min").asLong(), root.get("max").asLong())
        case None =>
          // guard with b < a, not max(0, b-a+1): the saturated empty
          // interval (MaxValue, MinValue) makes b-a+1 itself wrap to 2
          val c = if (empty) 0L else b - a + 1
          (c, if (empty) null else a, if (empty) null else b)
      }
      tags.map {
        case "count" => count
        case "min" => minV
        case "max" => maxV
      }
    })
  }
}

/** Shared HTTP plumbing for the live-federation path: a plain
  * `HttpURLConnection` GET (JDK-only, executor-safe) and Spark's own
  * bundled Jackson for the JSON parse — no dependency beyond what every
  * Spark classpath already carries.
  */
object RestHttp {
  val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def get(url: String): String = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(10000)
    conn.setReadTimeout(30000)
    try {
      val code = conn.getResponseCode
      if (code >= 400) {
        // surface the remote's error envelope (the reference answers
        // ok:false with a reason — index.js:254-262) instead of the
        // JDK's opaque IOException; the body is what tells an operator
        // WHICH parameter the service rejected
        val err = Option(conn.getErrorStream)
          .map { es =>
            try new String(es.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            finally es.close()
          }
          .getOrElse("")
        throw new IllegalStateException(s"HTTP $code from $url: $err")
      }
      val in = conn.getInputStream
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    } finally conn.disconnect()
  }
}

class SingleRowReaderFactory(values: () => Seq[Any])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var served = false
      override def next(): Boolean = if (served) false else { served = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(values())
      override def close(): Unit = ()
    }
}

class RestScan(pages: Int, pageSize: Int, pushed: Array[Filter],
    required: StructType, limit: Option[Int],
    baseUrl: Option[String] = None) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Exact count of page ids in [lo, hi] that satisfy every pushed
    * filter — ids are dense, so the filters intersect to one interval.
    */
  private def matching(lo: Long, hi: Long): Long = {
    val (a, b) = RestLikeSource.intervalOf(pushed, lo, hi)
    if (b < a) 0L else b - a + 1
  }

  /** One partition per page — pages whose id range can't satisfy the
    * pushed filters are never planned (partition pruning), and under a
    * pushed LIMIT, planning stops at the first page prefix whose
    * cumulative matching-row count covers the limit (trailing-page
    * pruning).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val live = (0 until pages).map { p =>
      val lo = p.toLong * pageSize
      (p, matching(lo, lo + pageSize - 1))
    }.filter(_._2 > 0)
    val selected = limit match {
      case Some(n) =>
        var cum = 0L
        live.takeWhile { case (_, c) => val need = cum < n; cum += c; need }
      case None => live
    }
    selected.map { case (p, _) => RestPage(p, pageSize): InputPartition }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(pushed, required, baseUrl)
}

case class RestPage(page: Int, pageSize: Int) extends InputPartition

class RestReaderFactory(pushed: Array[Filter], required: StructType,
    baseUrl: Option[String] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPageReader(partition.asInstanceOf[RestPage], pushed, required,
      baseUrl)
}

class RestPageReader(page: RestPage, pushed: Array[Filter],
    required: StructType, baseUrl: Option[String] = None)
    extends PartitionReader[InternalRow] {

  /** The executor-side page fetch, one call per partition. With a
    * `baseUrl` this is a REAL HTTP GET: the pushed id filters travel as
    * `min`/`max` query-string params (EqualTo arrives as min=v&max=v)
    * and the JSON body is parsed with Spark's bundled Jackson — the
    * DSv2 analog of predicate pushdown reaching the remote service.
    * Without one, a deterministic in-memory generator stands in (no
    * egress in the build sandbox; tests run both paths against
    * [[HttpFixtureServer]] on loopback and assert identical results).
    */
  private def fetchPage: Iterator[(Long, String, Double)] = baseUrl match {
    case Some(url) =>
      var qs = s"page=${page.page}&pageSize=${page.pageSize}"
      val (min, max) =
        RestLikeSource.intervalOf(pushed, Long.MinValue, Long.MaxValue)
      if (min != Long.MinValue) qs += s"&min=$min"
      if (max != Long.MaxValue) qs += s"&max=$max"
      val body = RestHttp.get(s"$url/items?$qs")
      val root = RestHttp.mapper.readTree(body)
      require(root.isArray, s"expected a JSON array page, got: $body")
      val it = root.elements()
      new Iterator[(Long, String, Double)] {
        override def hasNext: Boolean = it.hasNext
        override def next(): (Long, String, Double) = {
          val n = it.next()
          (n.get("id").asLong(), n.get("name").asText(),
            n.get("score").asDouble())
        }
      }
    case None =>
      val lo = page.page.toLong * page.pageSize
      (lo until lo + page.pageSize).iterator.map(RestLikeSource.record)
  }

  private val rows = fetchPage.filter { case (id, _, _) =>
    pushed.forall {
      case EqualTo("id", v: Long) => id == v
      case GreaterThan("id", v: Long) => id > v
      case LessThan("id", v: Long) => id < v
      case _ => true
    }
  }

  private var current: (Long, String, Double) = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow = {
    val full = Map[String, Any](
      "id" -> current._1,
      "name" -> UTF8String.fromString(current._2),
      "score" -> current._3)
    InternalRow.fromSeq(required.fields.toSeq.map(f => full(f.name)))
  }

  override def close(): Unit = ()
}
