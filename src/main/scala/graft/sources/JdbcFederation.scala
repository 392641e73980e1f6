package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Live JDBC federation — the reference's defining trait is two
  * heterogeneous RDBMS backends (pg + mysql) plus SOQL and REST under
  * one namespace (/root/reference/index.js:230-252, config.json:11-40).
  * Here the second backend is a REAL JDBC database: an embedded Apache
  * Derby instance (its jars ship with Spark at /opt/spark/jars) holding
  * the small dimension tables, read back through `spark.read.jdbc` so
  * filters and projections land in the remote engine as SQL — the same
  * wire contract a networked PostgreSQL/MySQL would get.
  *
  * Scale notes (100 TB):
  *  - Only DIMENSIONS live behind JDBC (the reference's pg/mysql hold
  *    exactly such entity tables, testdb.sql:2-11). Facts stay on the
  *    distributed store; the JDBC dim is broadcast into joins, so the
  *    RDBMS serves |dim| rows once per query, never per-executor-task.
  *  - For a big JDBC table, `spark.read.jdbc` takes partitionColumn/
  *    lowerBound/upperBound/numPartitions to issue range-parallel
  *    queries; the dims here are 5-25 rows, so a single partition IS
  *    the right plan.
  *  - In-memory Derby is visible only inside this JVM — correct for
  *    local[32]. In production the URL points at a network RDBMS; the
  *    embedded engine stands in for it in the sandbox (SURVEY §1.4),
  *    everything above the DriverManager URL is unchanged.
  */
object JdbcFederation {

  /** Dimension tables the federated backend owns (mirrors the
    * reference's pg fixture scope, testdb.sql:2-11: small entity
    * tables, not facts).
    */
  private val dims: Map[String, String] = Map(
    "nation" -> """CREATE TABLE "nation" (
                  |  "n_nationkey" INT NOT NULL,
                  |  "n_name" VARCHAR(32),
                  |  "n_regionkey" INT)""".stripMargin,
    "region" -> """CREATE TABLE "region" (
                  |  "r_regionkey" INT NOT NULL,
                  |  "r_name" VARCHAR(32))""".stripMargin)

  private val loaded = scala.collection.mutable.Set.empty[String]

  /** One in-memory database per fixture dir (nation/region differ only
    * in theory across SFs — TPC-H fixes them at 25/5 rows — but keying
    * by dir keeps the loader honest if a fixture ever changes).
    */
  private def url(dir: String): String =
    s"jdbc:derby:memory:graft_${Integer.toHexString(dir.hashCode)}"

  /** Bootstrap the embedded backend once per JVM: create the dim tables
    * and insert their rows from the fixture parquet. The collect is
    * small-by-construction (25 nation + 5 region rows — the exact
    * analog of the reference loading testdb.sql into pg at setup) and
    * runs once, not per query.
    */
  def ensureLoaded(spark: SparkSession, dir: String): String = synchronized {
    val u = url(dir)
    if (!loaded.contains(u)) {
      // keep derby.log out of the working tree; in-memory dbs write
      // nothing else
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
      val conn = DriverManager.getConnection(u + ";create=true")
      try {
        conn.setAutoCommit(false)
        for ((table, ddl) <- dims.toSeq.sortBy(_._1)) {
          val st = conn.createStatement()
          try st.executeUpdate(ddl) finally st.close()
          val rows = Tables.load(spark, dir, table).collect()
          val cols = Tables.load(spark, dir, table).columns
          val ps = conn.prepareStatement(
            s"""INSERT INTO "$table" VALUES (${cols.map(_ => "?").mkString(",")})""")
          try {
            rows.foreach { r =>
              cols.indices.foreach(i => ps.setObject(i + 1, r.get(i)))
              ps.addBatch()
            }
            ps.executeBatch()
          } finally ps.close()
        }
        conn.commit()
      } finally conn.close()
      loaded += u
    }
    u
  }

  /** Read a federated dim through the JDBC source. Spark's JDBC relation
    * compiles pushable filters to WHERE clauses and prunes columns into
    * the SELECT list — `PushedFilters` on the scan node is the proof
    * (pinned by JdbcFederationSpec).
    */
  def readTable(spark: SparkSession, dir: String, table: String): DataFrame = {
    require(dims.contains(table), s"not a federated dim: $table")
    spark.read.format("jdbc")
      .option("url", ensureLoaded(spark, dir))
      .option("dbtable", s""""$table"""")
      .load()
  }
}
