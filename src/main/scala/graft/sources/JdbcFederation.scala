package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Live JDBC federation — the reference's defining trait is two
  * heterogeneous RDBMS backends (pg + mysql) plus SOQL and REST under
  * one namespace (/root/reference/index.js:230-252, config.json:11-40).
  * Here BOTH extra backends are REAL JDBC databases: two separate
  * embedded Apache Derby instances (jars ship with Spark at
  * /opt/spark/jars), each behind its own DriverManager URL and each
  * owning its own dimension tables, read back through `spark.read.jdbc`
  * so filters and projections land in the remote engine as SQL — the
  * same wire contract networked PostgreSQL + MySQL would get.
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

  /** Dimension tables the federated backends own (mirrors the
    * reference's fixture scope, testdb.sql:2-11: small entity tables,
    * not facts).
    */
  private val dims: Map[String, String] = Map(
    "nation" -> """CREATE TABLE "nation" (
                  |  "n_nationkey" INT NOT NULL,
                  |  "n_name" VARCHAR(32),
                  |  "n_regionkey" INT)""".stripMargin,
    "region" -> """CREATE TABLE "region" (
                  |  "r_regionkey" INT NOT NULL,
                  |  "r_name" VARCHAR(32))""".stripMargin)

  /** TWO distinct backends, not one: the reference's identity is pg AND
    * mysql as separate engines under one namespace (config.json:11-40
    * declares both; index.js:230-252 mounts each db by name). Each
    * backend here is its own embedded Derby DATABASE — a separate
    * catalog behind a separate DriverManager URL, exactly what two
    * networked RDBMS look like to Spark's JDBC source. `pgmain` owns
    * `nation`, `mysqlmain` owns `region` (entity split in the spirit of
    * the reference's per-db table scopes).
    */
  private val backends: Map[String, Seq[String]] = Map(
    "pgmain" -> Seq("nation"),
    "mysqlmain" -> Seq("region"))

  private def backendOf(table: String): String =
    backends.collectFirst { case (b, ts) if ts.contains(table) => b }
      .getOrElse(throw new IllegalArgumentException(
        s"not a federated dim: $table"))

  private val loaded = scala.collection.mutable.Set.empty[String]

  /** One in-memory database per (backend, fixture dir) — nation/region
    * differ only in theory across SFs (TPC-H fixes them at 25/5 rows),
    * but keying by dir keeps the loader honest if a fixture changes.
    */
  private def url(dir: String, backend: String): String =
    s"jdbc:derby:memory:graft_${backend}_${Integer.toHexString(dir.hashCode)}"

  /** Bootstrap a table's owning backend once per JVM: create the dim
    * tables that backend owns and insert their rows from the fixture
    * parquet. The collect is small-by-construction (25 nation + 5
    * region rows — the exact analog of the reference loading testdb.sql
    * into pg at setup) and runs once, not per query. Returns the
    * backend's JDBC URL.
    */
  def ensureLoaded(spark: SparkSession, dir: String,
      table: String = "nation"): String = synchronized {
    val backend = backendOf(table)
    val u = url(dir, backend)
    if (!loaded.contains(u)) {
      // keep derby.log out of the working tree; in-memory dbs write
      // nothing else
      System.setProperty("derby.stream.error.file",
        s"${System.getProperty("java.io.tmpdir")}/graft_derby.log")
      val conn = DriverManager.getConnection(u + ";create=true")
      try {
        conn.setAutoCommit(false)
        for (t <- backends(backend).sorted) {
          val st = conn.createStatement()
          try st.executeUpdate(dims(t)) finally st.close()
          val df = Tables.load(spark, dir, t)
          val rows = df.collect()
          val cols = df.columns
          val ps = conn.prepareStatement(
            s"""INSERT INTO "$t" VALUES (${cols.map(_ => "?").mkString(",")})""")
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

  /** Read a federated dim through the JDBC source, from whichever
    * backend owns it. Spark's JDBC relation compiles pushable filters
    * to WHERE clauses and prunes columns into the SELECT list —
    * `PushedFilters` on the scan node is the proof (pinned by
    * JdbcFederationSpec).
    */
  def readTable(spark: SparkSession, dir: String, table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", ensureLoaded(spark, dir, table))
      .option("dbtable", s""""$table"""")
      .load()
}
