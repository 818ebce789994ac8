package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for canonical JSON (SURVEY.md §4 item 3 /
  * §2.11): string→string canonicalization inlined into whole-stage codegen
  * instead of crossing a ScalaUDF boundary (no encoder round-trip, no
  * closure serialization, stays inside the generated loop). The heavy
  * lifting delegates to [[JsonCanon.canonicalize]] via a static call from
  * the generated code.
  */
case class CanonicalJsonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_json"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      JsonCanon.canonicalize(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "UTF8String.fromString(graft.functions.JsonCanon.canonicalize(" +
        s"$c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalJsonExpr =
    copy(child = newChild)
}

object CanonicalJsonExpr {
  /** Register `canonical_json` in the session's function registry so SQL
    * and `call_function` resolve to the native expression.
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "canonical_json", exprs => CanonicalJsonExpr(exprs.head), "built-in")
}
