package graft

import graft.engine.PlanAudit

/** The plan-audit API itself, checked against plans whose shapes
  * PlanSpec already pins by string: the structured counts must agree
  * with what the strings say.
  */
class PlanAuditSpec extends SparkSpec {

  private def report(q: String) =
    PlanAudit.audit(SparkEntry.queries(q)(spark, sf))

  test("a per-row scan query audits as shuffle-free and pruned") {
    val r = report("e_pii_redact")
    // the trailing result orderBy is the only allowed exchange
    assert(r.shuffles <= 1, r.render)
    assert(r.broadcasts == 0, r.render)
    assert(r.scans.nonEmpty && r.scansPrunedTo(3),
      s"pii_redact reads (doc_id, text)-ish only: ${r.render}")
  }

  test("a broadcast join audits as broadcast, not shuffle-join") {
    val r = report("e_join_broadcast")
    assert(r.broadcasts >= 1, r.render)
  }

  test("pushed filters are visible per scan") {
    val r = report("r_filter_eq_date")
    assert(r.scans.exists(_.pushedFilters.exists(_.contains("o_orderdate"))),
      r.render)
  }

  test("window queries report their WindowExec count") {
    assert(report("e_window_running").windows >= 1)
    // a per-row scan query must have none
    assert(report("e_pii_redact").windows == 0)
  }

  test("exchange budget of the fused pipeline matches the PlanSpec pin") {
    val r = report("e_pipeline_e2e")
    assert(r.shuffles + r.broadcasts <= 4, r.render)
  }

  test("e_plan_audit VALUES literal matches the live plans") {
    // same drift protection as CatalogDriftSpec: an intentional plan
    // change must update the literal, and this fails with the exact
    // rows to paste instead of waiting for the driver's red row
    val live = SparkEntry.queries("e_plan_audit")(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getInt(4), r.getInt(5))).toSeq
    val re = raw"\('([^']*)', (\d+), (\d+), (\d+), (\d+), (\d+)\)".r
    val declared = re.findAllMatchIn(SparkEntry.oracleSql("e_plan_audit"))
      .map(m => (m.group(1), m.group(2).toInt, m.group(3).toInt,
        m.group(4).toInt, m.group(5).toInt, m.group(6).toInt)).toSeq
    if (live != declared) {
      val block = live.map { case (n, s, b, w, sc, pr) =>
        s"  ('$n', $s, $b, $w, $sc, $pr)" }.mkString(",\n")
      fail(s"plan-audit contract drifted; paste into the oracle:\n$block")
    }
  }
}
