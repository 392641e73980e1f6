package graft.sources

import java.io.{DataInputStream, DataOutputStream}
import java.net.Socket
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** LIVE PostgreSQL federation over a hand-rolled v3 wire-protocol
  * client — the A1 surface executed against a REAL `postgres` server
  * process, closing the long-carried "live pg wire execution"
  * environment gap (the sandbox ships PostgreSQL 15 server binaries
  * but no JDBC driver jar, so `spark.read.jdbc` cannot reach it; the
  * wire protocol itself is public and small).
  *
  * Protocol (PostgreSQL docs, "Frontend/Backend Protocol", v3.0):
  * StartupMessage(196608, user, database) → AuthenticationOk (trust)
  * → ReadyForQuery; then simple Query('Q') → RowDescription('T') +
  * DataRow('D')* + CommandComplete('C') → ReadyForQuery('Z');
  * ErrorResponse('E') carries (code, message) field pairs. Text result
  * format only — exactly what the reference's node-postgres client
  * speaks (/root/reference/index.js:230-244 ships template-compiled
  * SQL text to pg and reads rows back; this module reproduces that
  * contract end to end, server process included).
  *
  * Pushdown story: like [[SoqlSource]], the predicate / projection /
  * aggregate are COMPILED INTO the shipped SQL (string-pinned by
  * PgWireSpec), so the remote engine does the filtering and the wire
  * carries only the qualifying rows — the reference's own execution
  * model. Scale shape (the [[JdbcFederation]] contract): only bounded
  * DIMENSION tables live behind the wire client; the rows land in one
  * driver-side batch and broadcast into fact joins, so the RDBMS
  * serves |dim| rows once per query. A big remote table would ride a
  * range-parallel JDBC source instead; everything above the transport
  * is unchanged.
  *
  * Server lifecycle: one local cluster per JVM — initdb into a temp
  * dir (as `nobody` when running as root: postgres refuses root), a
  * free ephemeral port on 127.0.0.1, trust auth, stopped and deleted
  * by a shutdown hook. Dimension content loads per dataset dir into
  * its own schema from the SAME fixture parquet the oracle reads, so
  * DuckDB-over-parquet is the exact oracle for the federated answer.
  */
object PgWire {

  final case class PgResult(columns: Seq[(String, Int)],
      rows: Seq[Seq[String]])

  // ---- wire client (simple-query protocol) -------------------------

  /** Run one SQL statement over a fresh connection; returns columns
    * (name, type OID) and rows as text fields (null ⇒ null). Throws
    * with the server's message on ErrorResponse.
    */
  def query(host: String, port: Int, user: String, db: String,
      sql: String): PgResult = {
    val sock = new Socket(host, port)
    try {
      sock.setTcpNoDelay(true)
      val out = new DataOutputStream(sock.getOutputStream)
      val in = new DataInputStream(sock.getInputStream)
      // StartupMessage: no type byte; Int32 len, Int32 protocol 3.0
      val params = (s"user\u0000$user\u0000database\u0000$db" +
        "\u0000\u0000").getBytes(UTF_8)
      out.writeInt(8 + params.length)
      out.writeInt(196608)
      out.write(params)
      out.flush()
      awaitReady(in)
      // Query
      val q = sql.getBytes(UTF_8)
      out.writeByte('Q')
      out.writeInt(4 + q.length + 1)
      out.write(q)
      out.writeByte(0)
      out.flush()
      var cols = Seq.empty[(String, Int)]
      val rows = Seq.newBuilder[Seq[String]]
      var err: String = null
      var done = false
      while (!done) {
        val (tag, body) = readMessage(in)
        tag match {
          case 'T' =>
            val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
            var off = 2
            cols = (0 until n).map { _ =>
              val z = body.indexOf(0, off)
              val name = new String(body, off, z - off, UTF_8)
              // tableOID(4) attnum(2) typeOID(4) typlen(2) typmod(4) fmt(2)
              val typeOid = ((body(z + 7) & 0xff) << 24) |
                ((body(z + 8) & 0xff) << 16) |
                ((body(z + 9) & 0xff) << 8) | (body(z + 10) & 0xff)
              off = z + 19
              (name, typeOid)
            }
          case 'D' =>
            val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
            var off = 2
            rows += (0 until n).map { _ =>
              val len = ((body(off) & 0xff) << 24) |
                ((body(off + 1) & 0xff) << 16) |
                ((body(off + 2) & 0xff) << 8) | (body(off + 3) & 0xff)
              off += 4
              if (len == -1) null
              else {
                val v = new String(body, off, len, UTF_8)
                off += len
                v
              }
            }
          case 'E' => err = errorMessage(body)
          case 'Z' => done = true
          case _ => () // CommandComplete / Notice / ParameterStatus …
        }
      }
      // Terminate
      out.writeByte('X'); out.writeInt(4); out.flush()
      if (err != null) throw new java.sql.SQLException(s"pgwire: $err")
      PgResult(cols, rows.result())
    } finally sock.close()
  }

  private def awaitReady(in: DataInputStream): Unit = {
    var ready = false
    var err: String = null
    while (!ready) {
      val (tag, body) = readMessage(in)
      tag match {
        case 'R' =>
          val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
            ((body(2) & 0xff) << 8) | (body(3) & 0xff)
          if (code != 0)
            throw new java.sql.SQLException(
              s"pgwire: unsupported auth method $code (expected trust)")
        case 'E' => err = errorMessage(body)
        case 'Z' => ready = true
        case _ => () // ParameterStatus / BackendKeyData
      }
    }
    if (err != null) throw new java.sql.SQLException(s"pgwire: $err")
  }

  private def readMessage(in: DataInputStream): (Char, Array[Byte]) = {
    val tag = in.readByte().toChar
    val len = in.readInt() - 4
    val body = new Array[Byte](len)
    in.readFully(body)
    (tag, body)
  }

  /** ErrorResponse body: (fieldType byte, cstring)* then \0 — keep
    * severity, code, and message.
    */
  private def errorMessage(body: Array[Byte]): String = {
    var off = 0
    val fields = Map.newBuilder[Char, String]
    while (off < body.length && body(off) != 0) {
      val t = body(off).toChar
      val z = body.indexOf(0, off + 1)
      fields += t -> new String(body, off + 1, z - off - 1, UTF_8)
      off = z + 1
    }
    val f = fields.result()
    s"${f.getOrElse('S', "ERROR")} ${f.getOrElse('C', "")}: ${
      f.getOrElse('M', "unknown error")}"
  }

  // ---- managed local server ----------------------------------------

  private val PgBinDir = {
    val roots = new java.io.File("/usr/lib/postgresql")
    Option(roots.listFiles()).toSeq.flatten.sortBy(_.getName)
      .lastOption.map(v => s"${v.getAbsolutePath}/bin")
  }

  /** True when a local PostgreSQL server can run (binaries present). */
  def available: Boolean = PgBinDir.exists(d =>
    new java.io.File(s"$d/postgres").exists())

  private val User = "graft"

  private def sh(cmd: String): Int = {
    // postgres refuses to run as root: under root, hop to `nobody`
    // (cd first — nobody cannot read root's cwd)
    val asUser =
      if (System.getProperty("user.name") == "root")
        Seq("su", "-s", "/bin/sh", "nobody", "-c", s"cd /tmp && $cmd")
      else Seq("/bin/sh", "-c", cmd)
    val pb = new ProcessBuilder(asUser: _*)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val outTxt = new String(p.getInputStream.readAllBytes(), UTF_8)
    val rc = p.waitFor()
    if (rc != 0)
      System.err.println(s"[pgwire] `$cmd` rc=$rc:\n${outTxt.takeRight(800)}")
    rc
  }

  /** (host, port) of the per-JVM local server, started on first use. */
  lazy val server: (String, Int) = {
    val bin = PgBinDir.getOrElse(
      sys.error("pgwire: no PostgreSQL server binaries under /usr/lib/postgresql"))
    val dataDir = java.nio.file.Files.createTempDirectory("graft_pg")
    val port = {
      val s = new java.net.ServerSocket(0)
      try s.getLocalPort finally s.close()
    }
    if (System.getProperty("user.name") == "root") {
      // chown so `nobody` owns the cluster dir
      sh0(s"chown nobody ${dataDir}")
    }
    require(sh(s"$bin/initdb -D $dataDir -A trust -U $User") == 0,
      "pgwire: initdb failed")
    require(sh(s"$bin/pg_ctl -D $dataDir -o '-p $port -k $dataDir " +
      s"-c listen_addresses=127.0.0.1' -l $dataDir/server.log start -w") == 0,
      "pgwire: server start failed")
    sys.addShutdownHook {
      sh(s"$bin/pg_ctl -D $dataDir -m immediate stop")
      org.apache.commons.io.FileUtils.deleteQuietly(dataDir.toFile)
    }
    ("127.0.0.1", port)
  }

  // root-context helper (no user hop)
  private def sh0(cmd: String): Int =
    new ProcessBuilder("/bin/sh", "-c", cmd).inheritIO().start().waitFor()

  // ---- fixture load + Spark integration ----------------------------

  private val loadedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def esc(s: String): String = s.replace("'", "''")

  /** Load the `nation` dimension for a dataset dir into its own pg
    * schema (idempotent per JVM); returns the schema name.
    */
  def ensureLoaded(spark: SparkSession, dir: String): String =
    loadedDirs.computeIfAbsent(dir, _ => {
      val (h, p) = server
      val schema = s"g${Integer.toHexString(dir.hashCode)}"
      def run(sql: String): Unit = query(h, p, User, "postgres", sql)
      run(s"DROP SCHEMA IF EXISTS $schema CASCADE")
      run(s"CREATE SCHEMA $schema")
      run(s"""CREATE TABLE $schema.nation (
             |  n_nationkey INT NOT NULL,
             |  n_name VARCHAR(32),
             |  n_regionkey INT)""".stripMargin)
      val rows = graft.Tables.load(spark, dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey").collect()
      val values = rows.map(r =>
        s"(${r.getInt(0)}, '${esc(r.getString(1))}', ${r.getInt(2)})")
        .mkString(", ")
      run(s"INSERT INTO $schema.nation VALUES $values")
      schema
    })

  private def catalystType(oid: Int): DataType = oid match {
    case 16 => BooleanType
    case 20 => LongType
    case 21 => ShortType
    case 23 => IntegerType
    case 700 => FloatType
    case 701 => DoubleType
    case 1700 => DecimalType(18, 2)
    case _ => StringType // varchar/text/unknown → text form
  }

  private def parse(v: String, t: DataType): Any =
    if (v == null) null
    else t match {
      case BooleanType => v == "t"
      case ShortType => v.toShort
      case IntegerType => v.toInt
      case LongType => v.toLong
      case FloatType => v.toFloat
      case DoubleType => v.toDouble
      case _: DecimalType => new java.math.BigDecimal(v)
      case _ => v
    }

  /** Execute `sql` on the local server and return the (bounded) result
    * as a DataFrame — types derived from the RowDescription's type
    * OIDs, exactly what the wire declared.
    */
  def queryToDf(spark: SparkSession, sql: String): DataFrame = {
    val (h, p) = server
    val res = query(h, p, User, "postgres", sql)
    val schema = StructType(res.columns.map { case (n, oid) =>
      StructField(n, catalystType(oid))
    })
    val rows = res.rows.map(r =>
      Row.fromSeq(r.zip(schema.fields).map { case (v, f) =>
        parse(v, f.dataType) }))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
  }

  /** The compiled SQL each gate row ships — exposed so PgWireSpec pins
    * the pushdown text (the [[SoqlSource]] compile-exact discipline).
    */
  def scanSql(schema: String): String =
    s"SELECT n_nationkey, n_name, n_regionkey FROM $schema.nation " +
      "WHERE n_regionkey = 2 ORDER BY n_nationkey"

  def aggSql(schema: String): String =
    s"SELECT n_regionkey, count(*) AS n_nations, " +
      "max(n_nationkey) AS max_key, min(n_nationkey) AS min_key " +
      s"FROM $schema.nation GROUP BY n_regionkey ORDER BY n_regionkey"

  def dimSql(schema: String): String =
    s"SELECT n_nationkey, n_name, n_regionkey FROM $schema.nation"

  /** Gate row bodies (registered in ReferenceOps): the filter /
    * aggregate run INSIDE postgres; only qualifying rows cross the
    * wire.
    */
  def pgScan(spark: SparkSession, dir: String): DataFrame =
    queryToDf(spark, scanSql(ensureLoaded(spark, dir)))

  def pgAgg(spark: SparkSession, dir: String): DataFrame =
    queryToDf(spark, aggSql(ensureLoaded(spark, dir)))

  /** The wire-served dim broadcast against the parquet fact — the
    * [[JdbcFederation]] join shape with a REAL postgres serving the
    * dimension.
    */
  def pgJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val n = queryToDf(spark, dimSql(ensureLoaded(spark, dir)))
    val s = graft.Tables.load(spark, dir, "supplier")
    s.join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .groupBy(n("n_nationkey"), n("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        graft.Num.dsum(col("s_acctbal")).as("sum_acctbal"))
      .orderBy("n_nationkey")
  }
}
