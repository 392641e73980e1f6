package graft

import org.apache.spark.sql.functions._

import graft.operators.DomainOps

/** The native single-parse canonicalization kernel
  * ([[graft.functions.UrlExprs.UrlCanon]]) must be BYTE-EQUAL to the
  * original parse_url/regex Column chain it replaced
  * ([[DomainOps.urlCanonicalizeParsed]]) — the chain is the kernel's
  * executable spec. Exercised over the gate's full synthesized URL
  * surface (synthUrl twins, resolved link hrefs) plus adversarial
  * forms the fixtures never produce.
  */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def assertAgree(urls: Seq[String]): Unit = {
    val df = urls.toDF("u")
      .select(col("u"),
        DomainOps.urlCanonicalize(col("u")).as("kernel"),
        DomainOps.urlCanonicalizeParsed(col("u")).as("chain"))
    val bad = df.where(
      !(col("kernel") <=> col("chain"))).collect()
    assert(bad.isEmpty, s"kernel/chain disagree: ${bad.mkString("; ")}")
  }

  test("kernel equals the parse_url chain on the synthUrl gate surface") {
    val synth = spark.range(0, 400)
      .select(DomainOps.synthUrl(col("id")).as("u"))
      .as[String].collect().toSeq
    assertAgree(synth)
  }

  test("kernel equals the parse_url chain on resolved link-href forms") {
    val resolved = (0L until 200L).flatMap { id =>
      val origin = s"https://site${id % 7}.example.org"
      (1 to 4).map(j => s"$origin/doc/${(id + 13 * j) % 200}?b=2&a=1#r$j")
    }
    assertAgree(resolved)
  }

  test("kernel equals the parse_url chain on adversarial forms") {
    assertAgree(Seq(
      // case, www, default/non-default/empty ports
      "HTTP://WWW.EXAMPLE.COM:80/A/B/",
      "https://www.example.com:443/x",
      "https://example.com:8443/x?b=1&a=2",
      "http://example.com:8080/",
      "http://example.com:/x",
      // trailing slashes (only ONE is stripped)
      "https://h.io/a//",
      "https://h.io/",
      "https://h.io",
      // query shapes: empty, dangling &, empty params, repeated keys,
      // sort-sensitive values, '=' in value
      "https://h.io/p?",
      "https://h.io/p?a=1&",
      "https://h.io/p?&&",
      "https://h.io/p?z=1&z=0&y",
      "https://h.io/p?b=x=y&a=%20&A=2",
      // fragments dropped, userinfo kept out of host
      "https://h.io/p?a=1#frag",
      "https://user:pw@h.io:99/p#f",
      "https://user@www.H.io/p",
      // multiple www prefixes: only the first is stripped
      "https://www.www.h.io/p",
      // IPv6 authority
      "http://[2001:db8::1]:8080/p?x=1",
      "http://[2001:db8::1]/p",
      // scheme-only / opaque / no-host forms (NULL lanes)
      "mailto:a@b.example",
      "file:///tmp/x",
      "https:///nohost/path"))
  }

  test("null input stays null; both forms agree") {
    val df = Seq[Option[String]](None).toDF("u")
      .select(DomainOps.urlCanonicalize(col("u")).as("kernel"),
        DomainOps.urlCanonicalizeParsed(col("u")).as("chain"))
    val r = df.collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("invalid URL throws INVALID_URL like parse_url under ANSI") {
    val bad = Seq("https://h.io/p?a=|bad|").toDF("u")
    val kernelErr = intercept[Exception] {
      bad.select(DomainOps.urlCanonicalize(col("u"))).collect()
    }
    val chainErr = intercept[Exception] {
      bad.select(DomainOps.urlCanonicalizeParsed(col("u"))).collect()
    }
    def cls(e: Throwable): String = {
      var c: Throwable = e
      while (c.getCause != null && !c.getMessage.contains("INVALID_URL"))
        c = c.getCause
      c.getMessage
    }
    assert(cls(kernelErr).contains("INVALID_URL"),
      s"kernel error: ${cls(kernelErr)}")
    assert(cls(chainErr).contains("INVALID_URL"),
      s"chain error: ${cls(chainErr)}")
  }
}
