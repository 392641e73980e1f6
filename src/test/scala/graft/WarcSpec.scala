package graft

import org.apache.spark.sql.functions._
import graft.sources.WarcOps

/** WARC parser unit behavior: Content-Length framing (not delimiter
  * splitting), strictness on torn input, and the synthesized-fixture
  * file shape the gate row rides.
  */
class WarcSpec extends SparkSpec {

  private def rec(typ: String, uri: String, payload: String): String = {
    val cl = payload.getBytes("UTF-8").length
    s"WARC/1.0\r\nWARC-Type: $typ\r\nWARC-Target-URI: $uri\r\n" +
      s"Content-Length: $cl\r\n\r\n$payload\r\n\r\n"
  }

  test("Content-Length framing survives embedded CRLFCRLF and 'WARC/1.0' text") {
    val p1 = "first\r\n\r\nWARC/1.0\r\nstill the first payload"
    val p2 = "second"
    val blob = (rec("response", "u1", p1) + rec("response", "u2", p2))
      .getBytes("UTF-8")
    val rs = WarcOps.parseRecords(7L, blob)
    assert(rs.length == 2)
    assert(rs(0).payload == p1 && rs(1).payload == p2)
    assert(rs(0).target_uri == "u1" && rs(1).target_uri == "u2")
    assert(rs.forall(_.warc_file == 7L))
  }

  test("repeated header fields survive (ISO 28500 allows them): " +
      "n_headers counts lines, named fields take the first occurrence") {
    val p = "payload"
    val cl = p.getBytes("UTF-8").length
    val blob = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Concurrent-To: <urn:a>\r\nWARC-Concurrent-To: <urn:b>\r\n" +
      "WARC-Target-URI: u1\r\nWARC-Target-URI: u2\r\n" +
      s"Content-Length: $cl\r\n\r\n$p\r\n\r\n").getBytes("UTF-8")
    val rs = WarcOps.parseRecords(0L, blob)
    assert(rs.length == 1)
    // 6 actual header LINES — a name-keyed map would report 4
    assert(rs(0).n_headers == 6, s"n_headers: ${rs(0).n_headers}")
    assert(rs(0).target_uri == "u1", "first occurrence wins")
    assert(rs(0).payload == p)
  }

  test("torn blob fails loudly, no silent partial records") {
    val good = rec("response", "u", "payload body")
    val torn = good.dropRight(6).getBytes("UTF-8") // cut inside payload
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(0L, torn)
    }
    val badVersion = ("WARC/0.9\r\n" + good.drop(10)).getBytes("UTF-8")
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(0L, badVersion)
    }
    // record not closed by CRLFCRLF: lie about Content-Length
    val lied = good.replace("Content-Length: 12", "Content-Length: 10")
      .getBytes("UTF-8")
    intercept[IllegalArgumentException] {
      WarcOps.parseRecords(0L, lied)
    }
  }

  test("gz round-trip: per-record gzip members parse to the plain result") {
    val p1 = "first\r\n\r\nWARC/1.0\r\nstill the first payload"
    val p2 = "second"
    val r1 = rec("response", "u1", p1)
    val r2 = rec("response", "u2", p2)
    val gz = WarcOps.gzipMember(r1.getBytes("UTF-8")) ++
      WarcOps.gzipMember(r2.getBytes("UTF-8"))
    val rs = WarcOps.parseRecordsGz(3L, gz)
    assert(rs == WarcOps.parseRecords(3L,
      (r1 + r2).getBytes("UTF-8")).map(_.copy(warc_file = 3L)))
  }

  test("gz strictness: torn member, corrupted CRC, truncated trailer, " +
      "and a two-record member all fail loudly") {
    val good = WarcOps.gzipMember(
      rec("response", "u", "payload body").getBytes("UTF-8"))
    // torn inside the deflate body
    intercept[IllegalArgumentException] {
      WarcOps.gunzipMembers(good.dropRight(12))
    }
    // truncated trailer
    intercept[IllegalArgumentException] {
      WarcOps.gunzipMembers(good.dropRight(3))
    }
    // flipped byte in the deflate body → CRC (or stream) failure
    val corrupt = good.clone()
    corrupt(12) = (corrupt(12) ^ 0x41).toByte
    intercept[Exception] { WarcOps.gunzipMembers(corrupt) }
    // bad magic on the second member
    intercept[IllegalArgumentException] {
      WarcOps.gunzipMembers(good ++ Array[Byte](0x00, 0x01))
    }
    // a member framing TWO records violates the one-per-member contract
    val twoRecs = WarcOps.gzipMember(
      (rec("response", "a", "x") + rec("response", "b", "y"))
        .getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      WarcOps.parseRecordsGz(0L, twoRecs)
    }
  }

  test("gz property: random binary members round-trip through the " +
      "framing — including 0x1f8b sequences inside compressed data") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 50) {
      val members = Seq.fill(1 + rnd.nextInt(5)) {
        val a = new Array[Byte](rnd.nextInt(2000))
        rnd.nextBytes(a)
        a
      }
      val blob = members.map(WarcOps.gzipMember).reduce(_ ++ _)
      val back = WarcOps.gunzipMembers(blob)
      assert(back.length == members.length)
      back.zip(members).foreach { case (a, b) =>
        assert(java.util.Arrays.equals(a, b))
      }
    }
  }

  test("gz fixture gate twin equals the plain gate row exactly") {
    val plain = SparkEntry.queries("e_warc_parse")(spark, sf).collect().toSeq
    val gz = SparkEntry.queries("e_warc_parse_gz")(spark, sf).collect().toSeq
    assert(gz == plain)
  }

  test("synthesized fixture: 16 files, warcinfo first, all docs framed") {
    val docs = Tables.load(spark, sf, "documents")
    val files = WarcOps.synthWarcFiles(docs)
    assert(files.count() == 16)
    val recs = WarcOps.parseWarcBlobs(files).toDF()
    val n = docs.count()
    assert(recs.where(col("warc_type") === "warcinfo").count() == 16)
    assert(recs.where(col("warc_type") === "response").count() == n)
    // every response framed intact: WARC header count is the synthesis
    // constant and the payload opens with the HTTP status line
    assert(recs.where(col("warc_type") === "response")
      .where(col("n_headers") =!= 6 ||
        !col("payload").startsWith("HTTP/1.1 ")).isEmpty)
  }
}
