package graft.sources

import java.util
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SOQL query compilation — the missing operator-shape half of the
  * reference's Salesforce federation (A5). The reference compiles its
  * configured templates to SOQL text and hands the string to
  * `conn.query` (`/root/reference/plugins/salesforce.js:101-116`,
  * templates `/root/reference/config.json:54-61`:
  * `select id, accountnumber, name from account` and
  * `select id from $what`). The sandbox has no network, so the LIVE
  * call can't run — but the contract that matters for parity is the
  * TEXT sent over the wire, and that is fully compilable and
  * assertable offline. [[Soql.compile]] produces the exact lowercase
  * `select … from … [where …] [limit n]` shape the reference's
  * templates use, and [[SoqlSpec]] pins it string-exact.
  *
  * Keywords are lowercase to byte-match the reference templates (SOQL
  * is case-insensitive; jsforce sends the template text verbatim).
  */
object Soql {
  /** Render one pushed Spark filter as a SOQL condition; None = the
    * filter has no SOQL form and must stay in Spark as a post-filter.
    * SOQL null tests are spelled `= null` / `!= null` (not IS NULL).
    */
  def compileFilter(f: Filter): Option[String] = f match {
    case EqualTo(c, v) => Some(s"$c = ${lit(v)}")
    case GreaterThan(c, v) => Some(s"$c > ${lit(v)}")
    case GreaterThanOrEqual(c, v) => Some(s"$c >= ${lit(v)}")
    case LessThan(c, v) => Some(s"$c < ${lit(v)}")
    case LessThanOrEqual(c, v) => Some(s"$c <= ${lit(v)}")
    case In(c, vs) => Some(s"$c in (${vs.map(lit).mkString(", ")})")
    case IsNull(c) => Some(s"$c = null")
    case IsNotNull(c) => Some(s"$c != null")
    // LIKE wildcards inside the PREFIX must be escaped (SOQL uses
    // backslash escapes for % and _), else startsWith("100%") compiles
    // to a prefix-'100' match — wrong rows from a live org, invisible
    // locally because the fixture reader re-filters with the real
    // predicate (r10 self-review)
    case StringStartsWith(c, v) =>
      Some(s"$c like ${likeLit(escapeLike(v) + "%")}")
    case And(l, r) =>
      for (a <- compileFilter(l); b <- compileFilter(r)) yield s"($a and $b)"
    case Or(l, r) =>
      for (a <- compileFilter(l); b <- compileFilter(r)) yield s"($a or $b)"
    case _ => None
  }

  /** SOQL literal: single-quoted strings with backslash-escaped quotes
    * (jsforce/SOQL escaping), bare numerics/booleans, `null`.
    */
  def lit(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case u: UTF8String => lit(u.toString)
    case b: Boolean => b.toString
    // SOQL numeric literals take no exponent notation: 1.0E8.toString
    // would compile to a MALFORMED_QUERY on a live org — render the
    // exact decimal expansion instead (plain string of the shortest
    // round-trip decimal, so the value is unchanged)
    case d: Double => BigDecimal(d.toString).bigDecimal.toPlainString
    case f: Float => BigDecimal(f.toString).bigDecimal.toPlainString
    case n => n.toString
  }

  /** Escape LIKE wildcards in a literal fragment destined for a
    * pattern position (prefix of a startsWith).
    */
  private def escapeLike(s: String): String =
    s.replace("%", "\\%").replace("_", "\\_")

  /** Quote a LIKE pattern: quote-escape only — the wildcard
    * backslashes placed by [[escapeLike]] must survive, so the
    * blanket backslash-doubling of [[lit]] cannot apply.
    */
  private def likeLit(pattern: String): String =
    "'" + pattern.replace("'", "\\'") + "'"

  /** The full query text `conn.query` would receive. SOQL has no
    * `select *`: an empty projection (a bare COUNT in Spark) selects
    * `id`, the minimal valid field list.
    */
  def compile(obj: String, cols: Seq[String], filters: Seq[Filter],
      limit: Option[Int]): String = {
    val sel = if (cols.isEmpty) "id" else cols.mkString(", ")
    val where = filters.flatMap(compileFilter) match {
      case Nil => ""
      case cs => " where " + cs.mkString(" and ")
    }
    val lim = limit.map(n => s" limit $n").getOrElse("")
    s"select $sel from $obj$where$lim"
  }
}

/** Driver-side log of every SOQL text a scan compiled — the offline
  * stand-in for a wire capture (what WOULD be sent to `conn.query`).
  * Tests assert the exact strings; cleared per test.
  */
object SoqlWire {
  private val q = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  def record(soql: String): Unit = q.add(soql)
  def queries: Seq[String] = { val b = Seq.newBuilder[String]; q.forEach(b += _); b.result() }
  def clear(): Unit = q.clear()
}

/** DSv2 table over a Salesforce SObject. Pushed projection, filters,
  * and limit compile to SOQL at scan build ([[Soql.compile]]); rows
  * come from a deterministic local fixture standing in for the remote
  * org (no egress in the sandbox — a jsforce-equivalent HTTP client
  * would drop into [[SoqlPartitionReader]] without touching planning,
  * exactly like [[RestLikeSource]]'s live mode). Partitioning models
  * Salesforce's queryMore paging: one InputPartition per 500-row
  * batch, so a large SObject streams through executors in parallel
  * rather than through one driver loop.
  *
  * Usage: spark.read.format("graft.sources.SoqlSource")
  *   .option("object", "account").option("rows", 200).load()
  */
class SoqlSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SoqlSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SoqlTable(
      properties.asScala.getOrElse("object", "account"),
      properties.asScala.getOrElse("rows", "200").toInt)
}

object SoqlSource {
  /** Account-shaped schema mirroring the reference's configured query
    * (`select id, accountnumber, name from account`) plus one numeric
    * field so range pushdown has something to compile.
    */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("accountnumber", StringType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("annualrevenue", DoubleType, nullable = false)))

  /** Deterministic fixture record i — Salesforce-style 18-char id. */
  def record(i: Long): (String, String, String, Double) =
    (f"001$i%015d", s"ACC-$i", s"Account $i", i * 1000.0)

  val batchSize = 500
}

class SoqlTable(obj: String, rows: Int) extends Table with SupportsRead {
  override def name(): String = s"soql($obj, $rows rows)"
  override def schema(): StructType = SoqlSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SoqlScanBuilder(obj, rows)
}

class SoqlScanBuilder(obj: String, rows: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownLimit {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = SoqlSource.schema
  private var limit: Option[Int] = None

  /** Accept exactly the filters [[Soql.compileFilter]] can express —
    * accepted and compiled sets identical by construction.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(Soql.compileFilter(_).isDefined)
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** SOQL supports `limit n` directly; whole queryMore batches still
    * arrive, so Spark keeps its own final limit (partial push).
    */
  override def pushLimit(l: Int): Boolean = { limit = Some(l); true }
  override def isPartiallyPushed(): Boolean = true

  override def build(): Scan = {
    val soql = Soql.compile(obj, required.fieldNames.toSeq, pushed.toSeq, limit)
    SoqlWire.record(soql)
    new SoqlScan(rows, pushed, required, limit, soql)
  }
}

class SoqlScan(rows: Int, pushed: Array[Filter], required: StructType,
    limit: Option[Int], val soql: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"soql_pushdown[$soql]"

  /** One partition per queryMore batch. Under a pushed limit WITHOUT
    * pushed filters, plan only the batch prefix covering it (a remote
    * would stop paging). With filters pushed the prefix arithmetic is
    * unsound — a predicate matching only later batches would make a
    * row-count prefix drop rows — so every batch is planned and the
    * limit applies after the (remote-side) filtering, exactly as a
    * real queryMore loop would keep paging until `limit` SURVIVING
    * rows arrived.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val batches = (rows + SoqlSource.batchSize - 1) / SoqlSource.batchSize
    val wanted = limit match {
      case Some(n) if pushed.isEmpty =>
        math.min(batches, (n + SoqlSource.batchSize - 1) / SoqlSource.batchSize)
      case _ => batches
    }
    (0 until wanted).map(b => SoqlBatch(b, rows): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SoqlReaderFactory(pushed, required)
}

/** Named (not anonymous) so the closure ships only the filters and the
  * pruned schema — an anonymous factory would capture the whole
  * non-serializable Scan.
  */
class SoqlReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SoqlPartitionReader(p.asInstanceOf[SoqlBatch], pushed, required)
}

case class SoqlBatch(batch: Int, totalRows: Int) extends InputPartition

class SoqlPartitionReader(batch: SoqlBatch, pushed: Array[Filter],
    required: StructType) extends PartitionReader[InternalRow] {

  /** The executor-side batch fetch — where a live jsforce-equivalent
    * `query`/`queryMore` HTTP call would go. The fixture applies the
    * pushed filters locally, exactly as the remote org would before
    * returning the batch.
    */
  private def value(rec: (String, String, String, Double), col: String): Any =
    col match {
      case "id" => rec._1
      case "accountnumber" => rec._2
      case "name" => rec._3
      case "annualrevenue" => rec._4
    }

  private def passes(rec: (String, String, String, Double), f: Filter): Boolean = {
    def cmp(c: String, v: Any): Int = (value(rec, c), v) match {
      case (a: String, b: String) => a.compareTo(b)
      case (a: Double, b) => java.lang.Double.compare(a, b.toString.toDouble)
      case (a, b) => a.toString.compareTo(b.toString)
    }
    f match {
      case EqualTo(c, v) => cmp(c, v) == 0
      case GreaterThan(c, v) => cmp(c, v) > 0
      case GreaterThanOrEqual(c, v) => cmp(c, v) >= 0
      case LessThan(c, v) => cmp(c, v) < 0
      case LessThanOrEqual(c, v) => cmp(c, v) <= 0
      case In(c, vs) => vs.exists(v => cmp(c, v) == 0)
      case IsNull(_) => false // fixture fields are non-null
      case IsNotNull(_) => true
      case StringStartsWith(c, v) =>
        value(rec, c).asInstanceOf[String].startsWith(v)
      case And(l, r) => passes(rec, l) && passes(rec, r)
      case Or(l, r) => passes(rec, l) || passes(rec, r)
      case _ => true
    }
  }

  private val lo = batch.batch.toLong * SoqlSource.batchSize
  private val hi = math.min(lo + SoqlSource.batchSize, batch.totalRows.toLong)
  private val it = (lo until hi).iterator.map(SoqlSource.record)
    .filter(rec => pushed.forall(passes(rec, _)))

  private var current: (String, String, String, Double) = _
  override def next(): Boolean =
    if (it.hasNext) { current = it.next(); true } else false

  override def get(): InternalRow = InternalRow.fromSeq(
    required.fieldNames.toSeq.map { c =>
      value(current, c) match {
        case s: String => UTF8String.fromString(s)
        case d: Double => d
      }
    })

  override def close(): Unit = ()
}
