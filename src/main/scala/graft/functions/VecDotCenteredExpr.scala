package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the mean-centered dot product
  * `Σ (v[i] - m[i]) · p[i]` — the LSH bucket-bit kernel
  * ([[graft.pipeline.Similarity.lshBucket]]).
  *
  * The declarative form centered via `zip_with(v, means, x - m)` and then
  * took [[VecDotExpr]] (or previously `aggregate`) against each plane —
  * but the interpreted zip_with re-evaluates per PLANE reference, so a
  * 32-plane banded signature paid 32 centering passes (each an
  * interpreted lambda per element plus an intermediate array) per row.
  * This expression fuses subtract-multiply-accumulate into one generated
  * loop per plane with no intermediate array.
  *
  * Accumulation parity: left-to-right double, each term
  * `(v[i] - m[i]) * p[i]` — exactly the order the derived DuckDB oracles
  * (`ann_lsh_topk`, `ann_lsh_recall`) reproduce with
  * `list_sum(list_transform(range, i -> (e[i]-mu[i]) * p[i]))`, so the
  * sign decisions stay bit-for-bit identical. Null semantics mirror the
  * zip_with chain: null array / length mismatch / null element → null.
  */
case class VecDotCenteredExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot_centered"

  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(first, second, third).map(_.dataType).forall(elemOk))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "vec_dot_centered expects three float/double arrays")

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(v: Any, m: Any, p: Any): Any = {
    val va = v.asInstanceOf[ArrayData]
    val ma = m.asInstanceOf[ArrayData]
    val pa = p.asInstanceOf[ArrayData]
    val n = va.numElements()
    if (n != ma.numElements() || n != pa.numElements()) return null
    val vf = isFloat(first); val mf = isFloat(second); val pf = isFloat(third)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (va.isNullAt(i) || ma.isNullAt(i) || pa.isNullAt(i)) return null
      val x = if (vf) va.getFloat(i).toDouble else va.getDouble(i)
      val mu = if (mf) ma.getFloat(i).toDouble else ma.getDouble(i)
      val pl = if (pf) pa.getFloat(i).toDouble else pa.getDouble(i)
      acc += (x - mu) * pl
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGet = if (isFloat(first)) "getFloat" else "getDouble"
    val mGet = if (isFloat(second)) "getFloat" else "getDouble"
    val pGet = if (isFloat(third)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, m, p) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $v.numElements();
         |if ($n != $m.numElements() || $n != $p.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i) || $m.isNullAt($i) || $p.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += (((double) $v.$vGet($i)) - ((double) $m.$mGet($i)))
         |            * ((double) $p.$pGet($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): VecDotCenteredExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VecDotCenteredExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot_centered", exprs =>
        VecDotCenteredExpr(exprs.head, exprs(1), exprs(2)), "built-in")
}
