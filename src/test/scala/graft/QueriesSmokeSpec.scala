package graft

/** Every registered query must build (analyze) and run at sf0.001; the
  * driver's DuckDB differential covers value correctness for the oracle
  * set — this guards the no-oracle queries and the registry wiring.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // count() exercises the full plan; most queries must be non-empty
      val n = df.count()
      val mayBeEmpty = Set("e_join_anti", "e_set_except")
      assert(n > 0 || mayBeEmpty.contains(name), s"$name returned 0 rows")
    }
  }
}
