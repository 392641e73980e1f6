package graft

/** Keeps the hand-maintained r_catalog VALUES literal honest: the
  * driver hash-checks that literal against `QueryRegistry.describe`
  * output, so a query added (or reshaped) without updating the literal
  * red-flags the whole gate. This test regenerates the block from the
  * live registry and, on drift, fails with the exact text to paste
  * into `SparkEntry.oracleSql("r_catalog")`.
  */
class CatalogDriftSpec extends SparkSpec {

  test("r_catalog VALUES literal matches the live query registry") {
    // the meta-queries (r_catalog itself, the e_plan_audit contract)
    // describe the operator registry and are not part of it
    val rows = (SparkEntry.queries - "r_catalog" - "e_plan_audit")
      .toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val schema = fn(spark, sf).schema
        (name, schema.fields.length,
          schema.fields.map(f => s"${f.name}:${f.dataType.simpleString}")
            .mkString(","))
    }
    val re = raw"\('([^']*)', (\d+), '([^']*)'\)".r
    val declared = re.findAllMatchIn(SparkEntry.oracleSql("r_catalog"))
      .map(m => (m.group(1), m.group(2).toInt, m.group(3))).toSet
    val actual = rows.toSet
    if (declared != actual) {
      val block = rows
        .map { case (n, c, f) => s"  ('$n', $c, '$f')" }
        .mkString(
          "\"\"\"SELECT * FROM (VALUES\n", ",\n",
          "\n) AS t(query_name, n_columns, fields)\nORDER BY query_name\"\"\"")
      fail(
        s"""r_catalog VALUES literal drifted from the registry.
           |  missing from literal: ${(actual.map(_._1) -- declared.map(_._1)).toSeq.sorted.mkString(", ")}
           |  stale in literal:     ${(declared.map(_._1) -- actual.map(_._1)).toSeq.sorted.mkString(", ")}
           |  changed schema:       ${(actual.map(_._1) intersect declared.map(_._1)).toSeq.sorted.filter(n => actual.find(_._1 == n) != declared.find(_._1 == n)).mkString(", ")}
           |Regenerated block (paste into SparkEntry.oracleSql("r_catalog")):
           |$block""".stripMargin)
    }
  }
}
