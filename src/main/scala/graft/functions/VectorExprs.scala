package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native whole-stage-codegen vector kernels for the embedding hot
  * paths (guide §4 "eliminate non-codegen expressions in the hot
  * path"): the zip_with/aggregate formulation in [[VectorOps]] is an
  * interpreted HigherOrderFunction — every element pays a boxed lambda
  * round-trip, and zip_with additionally materializes the 64-element
  * product array per PAIR. Inside the within-cell pair joins
  * (semDedup, knnJoin, the brute-force recall truths) that lambda
  * overhead IS the stage cost at any scale. These expressions run the
  * same left-fold in a tight unboxed loop.
  *
  * Arithmetic contract (oracle-identity): bit-identical to the HOF
  * form — `acc = ((0.0 + p₀) + p₁) + …` with pᵢ =
  * (double)aᵢ * (double)bᵢ, the exact sequential IEEE order DuckDB's
  * list_* replay and the previous zip_with/aggregate form evaluate.
  * Null semantics match too: a null array, length mismatch (zip_with
  * pads the shorter side with null products), or any null element
  * yields NULL.
  */
object VectorExprs {

  private def okElem(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def elemIsFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Σ (double)aᵢ·(double)bᵢ over two float/double arrays. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (okElem(left.dataType) && okElem(right.dataType))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_dot requires ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")

    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
      val a = left.eval(input)
      if (a == null) return null
      val b = right.eval(input)
      if (b == null) return null
      val aa = a.asInstanceOf[ArrayData]
      val bb = b.asInstanceOf[ArrayData]
      val n = aa.numElements()
      if (n != bb.numElements()) return null
      val af = elemIsFloat(left.dataType)
      val bf = elemIsFloat(right.dataType)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (aa.isNullAt(i) || bb.isNullAt(i)) return null
        val x = if (af) aa.getFloat(i).toDouble else aa.getDouble(i)
        val y = if (bf) bb.getFloat(i).toDouble else bb.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val getA = if (elemIsFloat(left.dataType))
          s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB = if (elemIsFloat(right.dataType))
          s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
           |    $acc += $getA * $getB;
           |  }
           |  if (!${ev.isNull}) ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
  }

  /** Σ (double)aᵢ² — the l2-norm body (caller applies sqrt). */
  case class VecSumSq(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override def checkInputDataTypes(): TypeCheckResult =
      if (okElem(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"vec_sumsq requires ARRAY<FLOAT|DOUBLE>, got ${child.dataType.sql}")

    override protected def nullSafeEval(input: Any): Any = {
      val aa = input.asInstanceOf[ArrayData]
      val af = elemIsFloat(child.dataType)
      val n = aa.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (aa.isNullAt(i)) return null
        val x = if (af) aa.getFloat(i).toDouble else aa.getDouble(i)
        acc += x * x
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val x = ctx.freshName("x")
        val get = if (elemIsFloat(child.dataType))
          s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
           |  double $x = $get;
           |  $acc += $x * $x;
           |}
           |if (!${ev.isNull}) ${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): VecSumSq =
      copy(child = newChild)
  }

  // per-session registration guard (weak keys: sessions die with specs)
  private val registered =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register both kernels in `spark` (idempotent per session). */
  def register(spark: SparkSession): Unit =
    if (registered.put(spark, java.lang.Boolean.TRUE) == null) {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "vec_sumsq", exprs => VecSumSq(exprs.head), "built-in")
    }

  private def active(): SparkSession = SparkSession.active

  def dot(a: Column, b: Column): Column = {
    register(active())
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)
  }

  def sumSq(a: Column): Column = {
    register(active())
    org.apache.spark.sql.functions.call_function("vec_sumsq", a)
  }
}
