package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** The native HTML-extraction kernel ([[graft.functions.HtmlExtract]])
  * must be BYTE-EQUAL to the seven-pass regexp_replace chain it
  * replaced ([[CorpusOps.htmlExtractRegex]]) — the chain is the
  * kernel's executable spec. Exercised over the gate's synthesized
  * page surface (synthHtml, synthLinkedPage) plus adversarial
  * fragments the synthesis never produces.
  */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def assertAgree(html: Seq[String]): Unit = {
    val df = html.toDF("h")
      .select(col("h"),
        CorpusOps.htmlExtract(col("h")).as("kernel"),
        CorpusOps.htmlExtractRegex(col("h")).as("chain"))
    val bad = df.where(!(col("kernel") <=> col("chain"))).collect()
    assert(bad.isEmpty,
      s"kernel/chain disagree on ${bad.length} inputs: " +
        bad.take(3).mkString("; "))
  }

  test("kernel equals the regex chain on synthesized pages") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("text"), col("doc_id"))
    val pages = docs
      .select(CorpusOps.synthHtml(col("text"), col("doc_id")).as("h"))
      .as[String].collect().toSeq
    assertAgree(pages)
    val linked = docs
      .select(graft.operators.DomainOps.synthLinkedPage(
        col("text"), col("doc_id"), 100L).as("h"))
      .as[String].collect().toSeq
    assertAgree(linked)
  }

  test("kernel equals the regex chain on adversarial fragments") {
    assertAgree(Seq(
      // unclosed / bare / nested blocks
      "<head><title>t</title>",               // no </head>: block survives tag-strip
      "<head>a</head>b<head>c</head>",        // two blocks
      "<head><head>x</head>y</head>",          // nested: first close wins
      "<heading>not a head</heading>ok",       // \b: word char after tag name
      "<head\nclass='x'>drop</head>keep",      // newline inside [^>]*
      "<script>if (a<b) { x(); }</script>t",   // '<' inside block body
      "<script src=\"x>\">s</script>t",        // '>' inside attr ends [^>]*
      "<style>.a{color:red}</style><nav>n</nav><footer>f</footer>body",
      // tag-strip edges
      "a<b>c",
      "a<>b",                                   // <> is not a tag
      "a<b",                                    // unclosed tag survives
      "<<a>>b",                                  // <<a> matches, trailing > stays
      "< >spaced< / >",
      // whitespace collapse + trim edges
      "  \t\n a  b \r\n ",
      "\fx\f",
      "",
      " ",
      "<p>  </p>",
      // scripts containing fake closers for OTHER tags
      "<script>\"</head>\"</script>rest",
      // case sensitivity: uppercase tags are NOT block-stripped
      "<HEAD>x</HEAD><P>y</P>",
      // the head regex eats to the FIRST close even across other tags
      "<head><script></head></script>tail"))
  }

  test("null input stays null; both forms agree") {
    val r = Seq[Option[String]](None).toDF("h")
      .select(CorpusOps.htmlExtract(col("h")),
        CorpusOps.htmlExtractRegex(col("h"))).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
