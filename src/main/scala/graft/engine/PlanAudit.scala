package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SortExec, SparkPlan, WholeStageCodegenExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.window.WindowExec

/** One parquet scan in the plan: what reached the reader.
  * `partitionFilters` are the predicates resolved against the
  * directory layout (`d=.../`) — a non-empty list means the scan
  * LISTS only matching directories instead of the whole dataset, the
  * property that turns a 100 TB pass into a one-partition read.
  */
final case class ScanInfo(pushedFilters: Seq[String], readSchema: String,
    partitionFilters: Seq[String] = Nil)

/** Structured summary of a physical plan — the properties the 100 TB
  * story depends on, as data instead of a string to eyeball.
  */
final case class PlanReport(
    shuffles: Int,
    broadcasts: Int,
    scans: Seq[ScanInfo],
    codegenSpans: Int,
    windows: Int,
    sorts: Int) {

  /** Every scan pruned below the given column count? */
  def scansPrunedTo(maxCols: Int): Boolean =
    scans.forall(_.readSchema.count(_ == ',') + 1 <= maxCols)

  /** Scans whose directory listing is narrowed by partition filters. */
  def partitionPrunedScans: Int = scans.count(_.partitionFilters.nonEmpty)

  def render: String =
    s"shuffles=$shuffles broadcasts=$broadcasts codegenSpans=$codegenSpans " +
      s"windows=$windows sorts=$sorts scans=${scans.size}" +
      scans.map(s => s"\n  scan pushed=${s.pushedFilters.mkString("[", ",", "]")}" +
        s" part=${s.partitionFilters.mkString("[", ",", "]")}" +
        s" read=${s.readSchema}").mkString
}

/** Plan-quality audit: walk the physical plan (descending into AQE
  * wrappers and reused subtrees) and count the operators that dominate
  * cost at scale. The same checks PlanSpec pins for the registered
  * queries, exposed as library API so a user can gate THEIR pipelines
  * ("this job must stay under N shuffles, with every scan pruned")
  * instead of eyeballing `.explain` output.
  */
object PlanAudit {

  def audit(df: DataFrame): PlanReport = {
    val nodes = flatten(df.queryExecution.executedPlan)
    PlanReport(
      shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeLike]),
      broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeLike]),
      scans = nodes.collect { case s: FileSourceScanExec =>
        ScanInfo(
          s.metadata.get("PushedFilters").toSeq
            .flatMap(_.stripPrefix("[").stripSuffix("]").split(",\\s*"))
            .filter(f => f.nonEmpty && f != "[]"),
          s.metadata.getOrElse("ReadSchema", ""),
          s.partitionFilters.map(_.sql))
      },
      codegenSpans = nodes.count(_.isInstanceOf[WholeStageCodegenExec]),
      windows = nodes.count(_.isInstanceOf[WindowExec]),
      sorts = nodes.count(_.isInstanceOf[SortExec]))
  }

  /** Pre-order walk that sees through the wrappers `collect` stops at:
    * the AQE root holds its current plan out-of-band (not as a child).
    * `executedPlan`, not `inputPlan` — the input plan predates the
    * stage-preparation rules, so it has no Exchange or codegen nodes
    * yet and would under-count every category.
    */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val inner = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => p.children
    }
    p +: inner.flatMap(flatten)
  }
}
