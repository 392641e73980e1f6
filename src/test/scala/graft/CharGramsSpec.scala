package graft

import graft.functions.CharGrams
import org.apache.spark.sql.functions._

/** CharGrams must be byte-identical to the SQL substr formulation —
  * including multi-byte UTF-8, short strings, and k = 1 — in both the
  * codegen and interpreted evaluation paths.
  */
class CharGramsSpec extends SparkSpec {
  import spark.implicits._

  private val cases = Seq(
    "hello world",
    "", "a", "ab", "abc",
    "héllo wörld ünïcode", // 2-byte chars: offsets ≠ positions
    "日本語のテキスト", // 3-byte chars
    "mixed 日本 and ascii é end",
    "aaaaaaaaaa")

  private def viaSubstr(k: Int) = {
    val t = col("s")
    when(length(t) >= k,
      transform(sequence(lit(1), length(t) - (k - 1)),
        i => t.substr(i, lit(k))))
      .otherwise(array().cast("array<string>"))
  }

  test("equals the substr formulation for k in 1..5 (codegen path)") {
    for (k <- 1 to 5) {
      val df = cases.toDF("s")
        .select(col("s"),
          CharGrams.charGrams(spark, col("s"), k).as("fast"),
          viaSubstr(k).as("slow"))
      val bad = df.where(not(col("fast") === col("slow"))).collect()
      assert(bad.isEmpty, s"k=$k mismatches: ${bad.mkString(";")}")
    }
  }

  test("interpreted eval matches codegen") {
    val e = CharGrams(
      org.apache.spark.sql.catalyst.expressions.Literal("héllo日本x"), 3)
    val arr = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.GenericArrayData]
    val got = (0 until arr.numElements()).map(arr.getUTF8String(_).toString)
    val s = "héllo日本x"
    val want = (0 to s.length - 3).map(i => s.substring(i, i + 3))
    assert(got === want)
  }

  test("k longer than the string yields an empty array, not null") {
    val r = Seq("ab").toDF("s")
      .select(size(CharGrams.charGrams(spark, col("s"), 5)))
      .collect().head.getInt(0)
    assert(r === 0)
  }
}
