package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product (SURVEY.md
  * §2.9 similarity search hot path).
  *
  * The declarative form — `aggregate(zip_with(a, b, x*y), 0.0, +)` — is
  * correct but slow at scale: Spark's higher-order functions are NOT
  * whole-stage-codegen'd; each row materializes an intermediate product
  * array and folds it by invoking the lambda interpreter per element.
  * For a 64-dim float embedding that is 64 boxed lambda dispatches plus
  * an array allocation per pair — per candidate pair in the near-dup
  * verify join, per corpus row in the brute-force scan.
  *
  * This expression compiles the same computation into the generated loop:
  * one fused multiply-accumulate pass over the two `ArrayData`s, no
  * intermediate array, no virtual calls. Accumulation is IDENTICAL to the
  * declarative form — left-to-right, each element pair cast to double
  * before multiply — so results (and the LSH sign decisions derived from
  * them) are bit-for-bit unchanged, which the DuckDB-derived oracles
  * (`ann_lsh_topk`, `ann_lsh_recall`) depend on.
  *
  * Null semantics mirror `zip_with`+`aggregate`: null array → null;
  * length mismatch → null (zip_with pads with null, poisoning the sum);
  * any null element → null.
  */
case class VecDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects float/double arrays, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val la = l.asInstanceOf[ArrayData]
    val ra = r.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n != ra.numElements()) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = if (lf) la.getFloat(i).toDouble else la.getDouble(i)
      val y = if (rf) ra.getFloat(i).toDouble else ra.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $l.numElements();
         |if ($n != $r.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($l.isNullAt($i) || $r.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $l.$lGet($i)) * ((double) $r.$rGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDotExpr = copy(left = newLeft, right = newRight)
}

object VecDotExpr {
  /** Register `vec_dot` in the session's function registry (same pattern
    * as [[CanonicalJsonExpr.register]]) so `call_function` resolves to the
    * native expression.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotExpr(exprs.head, exprs(1)), "built-in")
}
