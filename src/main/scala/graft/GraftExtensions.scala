package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Session-extensions entry point: register the engine's native expression
  * family in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get the codegen'd
  * kernels without touching the Scala API. The same builders back the
  * per-session `register(spark)` helpers the operators use internally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  // Builder-time argument: the expression may still be unresolved here,
  // so eval() on an arbitrary expression would throw an opaque
  // UnsupportedOperationException (and a null literal an NPE). Accept a
  // non-null integer literal, or any RESOLVED foldable integer
  // expression (`1+2`, `cast('64' as int)` — constant-foldable SQL that
  // worked under the old eval path), and name the contract otherwise.
  private def intArg(name: String, e: Expression): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case c if c.resolved && c.foldable && c.dataType == IntegerType =>
      c.eval() match {
        case v: Int => v
        case _ => throw new AnalysisException(
          "NON_FOLDABLE_ARGUMENT",
          Map("funcName" -> s"`$name`", "paramName" -> "`k`",
            "paramType" -> "\"INT\""))
      }
    case _ => throw new AnalysisException(
      "NON_FOLDABLE_ARGUMENT",
      Map("funcName" -> s"`$name`", "paramName" -> "`k`",
        "paramType" -> "\"INT\""))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression,
        clazz: Class[_]): Unit =
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))

    inject("canonical_json", exprs => CanonicalJsonExpr(exprs.head),
      classOf[CanonicalJsonExpr])
    inject("vec_dot", exprs => VecDotExpr(exprs.head, exprs(1)),
      classOf[VecDotExpr])
    inject("vec_dot_centered",
      exprs => VecDotCenteredExpr(exprs.head, exprs(1), exprs(2)),
      classOf[VecDotCenteredExpr])
    inject("word_shingles",
      exprs => ShinglesExpr(exprs.head, intArg("word_shingles", exprs(1))),
      classOf[ShinglesExpr])
    inject("minhash_sig",
      exprs => MinHashSigExpr(exprs.head, intArg("minhash_sig", exprs(1))),
      classOf[MinHashSigExpr])
    inject("simhash64", exprs => SimHashExpr(exprs.head),
      classOf[SimHashExpr])
  }
}
