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
