package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Pmod, Substring}
import org.apache.spark.sql.types.LongType
import graft.functions.RollingHash

/** Session-extension entry point: injects the library's custom SQL
  * functions into the analyzer's registry so a pure-SQL user (the
  * reference's audience — every query it serves is SQL text,
  * /root/reference/config.json:19-24) gets them without touching the
  * Scala API:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  * SELECT rolling_hash(text), md5_hash60(text), graft_shard(text, 64) ...
  * }}}
  *
  *  - `rolling_hash(s)` — the codegen'd polynomial fingerprint
  *    ([[graft.functions.RollingHash]]).
  *  - `md5_hash60(s)` — the cross-engine 60-bit md5 hash every
  *    oracle-replayable pipeline keys on
  *    ([[graft.functions.TextShingles.md5Hash60]]), built here from
  *    native Catalyst nodes (Conv∘Substring∘Md5) so it stays inside
  *    whole-stage codegen.
  *  - `graft_shard(s, k)` — deterministic content-hash shard id
  *    (the e_shuffle_shard assignment) as a scalar function.
  *  - `letter_counts(s)` — single-pass a–z occurrence array
  *    ([[graft.functions.LetterCounts]], codegen'd).
  *
  * All four are Expression-level injections (no UDF encoders, no
  * codegen breaks) — the function registry is the integration seam,
  * not a wrapper layer.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** The injected function set — one source of truth for both the
    * extensions path (new sessions) and [[install]] (live sessions).
    */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)),
    // The composed functions carry a graft usage string so DESCRIBE
    // FUNCTION explains THIS function, not the outermost Catalyst node
    // of its expansion.
    (FunctionIdentifier("md5_hash60"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "", "md5_hash60",
        "md5_hash60(str) - deterministic 60-bit content hash: first 15 hex" +
          " chars of md5(str) as BIGINT (expands to Conv∘Substring∘Md5).",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[Expression]) => md5Hash60Expr(exprs.head)),
    (FunctionIdentifier("graft_shard"),
      new ExpressionInfo(classOf[GraftExtensions].getName, "", "graft_shard",
        "graft_shard(str, k) - content-hash shard id in [0, k):" +
          " pmod(md5_hash60(str), k); stable under input relayout.",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[Expression]) => Pmod(md5Hash60Expr(exprs.head), exprs(1))),
    (FunctionIdentifier("letter_counts"),
      new ExpressionInfo(classOf[graft.functions.LetterCounts].getName,
        "letter_counts"),
      (exprs: Seq[Expression]) => graft.functions.LetterCounts(exprs.head)),
    (FunctionIdentifier("blocklist_hits"),
      new ExpressionInfo(classOf[graft.functions.AhoMatches].getName, "",
        "blocklist_hits",
        "blocklist_hits(str, array('p1','p2',…)) - distinct indices of" +
          " the phrases matching str on token boundaries, via one" +
          " Aho-Corasick pass (the phrase array must be a literal).",
        "", "", "", "", "", "", "built-in"),
      (exprs: Seq[Expression]) => graft.functions.AhoMatches.fromExprs(exprs)))

  /** Register the same functions into an already-running session (the
    * notebook case, where `spark.sql.extensions` can no longer apply).
    * Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }

  /** Catalyst tree of [[graft.functions.TextShingles.md5Hash60]]:
    * ('0x' || substr(md5(s),1,15))::BIGINT in DuckDB terms. Md5's
    * implicit cast accepts STRING input directly.
    */
  def md5Hash60Expr(e: Expression): Expression =
    Cast(Conv(Substring(Md5(e), Literal(1), Literal(15)),
      Literal(16), Literal(10)), LongType)
}
