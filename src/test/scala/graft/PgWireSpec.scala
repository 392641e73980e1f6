package graft

import graft.sources.PgWire
import org.apache.spark.sql.functions._

/** A1 LIVE: the hand-rolled PostgreSQL v3 wire client against a real
  * local `postgres` server — pushdown text pinned (the SoqlSource
  * compile-exact discipline), wire answers equal to the parquet truth,
  * server errors surfaced with the backend's own message.
  */
class PgWireSpec extends SparkSpec {

  private def pgAssume(): Unit =
    assume(PgWire.available,
      "PostgreSQL server binaries not present on this host")

  test("the shipped SQL carries the filter / aggregate — pushdown is " +
      "compile-exact, and the wire answer equals the parquet truth") {
    pgAssume()
    val schema = PgWire.ensureLoaded(spark, sf)
    // the EXACT SQL each gate row ships (a filter the remote engine
    // runs; an aggregate the remote engine runs)
    assert(PgWire.scanSql(schema) ==
      s"SELECT n_nationkey, n_name, n_regionkey FROM $schema.nation " +
        "WHERE n_regionkey = 2 ORDER BY n_nationkey")
    assert(PgWire.aggSql(schema).contains("GROUP BY n_regionkey"),
      "aggregate must ship inside the remote SQL")
    val wire = PgWire.pgScan(spark, sf).collect().toSeq
    val truth = Tables.load(spark, sf, "nation")
      .where(col("n_regionkey") === 2)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey").collect().toSeq
    assert(wire == truth, "wire scan diverged from parquet truth")
    // only qualifying rows crossed the wire: the result IS the filter
    assert(wire.nonEmpty && wire.forall(_.getInt(2) == 2))
  }

  test("RowDescription type OIDs map to Catalyst types: int4 -> int, " +
      "count(*) int8 -> bigint, varchar -> string") {
    pgAssume()
    val agg = PgWire.pgAgg(spark, sf)
    val types = agg.schema.fields.map(f => f.name -> f.dataType.simpleString)
      .toMap
    assert(types("n_regionkey") == "int")
    assert(types("n_nations") == "bigint")
    assert(types("max_key") == "int")
    val scan = PgWire.pgScan(spark, sf)
    assert(scan.schema("n_name").dataType.simpleString == "string")
  }

  test("the wire-served dim broadcasts against the parquet fact and " +
      "the join answer equals the all-parquet twin") {
    pgAssume()
    val live = PgWire.pgJoin(spark, sf)
    val plan = live.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"dim must broadcast:\n$plan")
    val n = Tables.load(spark, sf, "nation")
    val s = Tables.load(spark, sf, "supplier")
    val twin = s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(n("n_nationkey"), n("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        graft.Num.dsum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy("n_nationkey")
    assert(live.collect().toSeq == twin.collect().toSeq,
      "live federation diverged from the all-parquet twin")
  }

  test("a server error surfaces as the backend's own message, and the " +
      "connection machinery survives for the next query") {
    pgAssume()
    PgWire.ensureLoaded(spark, sf)
    val (h, p) = PgWire.server
    val e = intercept[java.sql.SQLException] {
      PgWire.query(h, p, "graft", "postgres", "SELECT no_such_col FROM nope")
    }
    assert(e.getMessage.contains("42P01") ||
      e.getMessage.toLowerCase.contains("does not exist"),
      s"backend error not surfaced: ${e.getMessage}")
    // the failure poisoned nothing: a fresh query still answers
    val ok = PgWire.query(h, p, "graft", "postgres", "SELECT 1 AS one")
    assert(ok.rows == Seq(Seq("1")))
  }

  test("NULLs cross the wire as nulls, not empty strings") {
    pgAssume()
    val (h, p) = PgWire.server
    val r = PgWire.query(h, p, "graft", "postgres",
      "SELECT NULL::int AS a, '' AS b")
    assert(r.rows == Seq(Seq(null, "")),
      s"null/empty distinction lost: ${r.rows}")
  }
}
