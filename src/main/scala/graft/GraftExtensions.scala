package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extensions entry point: register the engine's native expression
  * family in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get the codegen'd
  * kernels without touching the Scala API. The same builders back the
  * per-session `register(spark)` helpers the operators use internally.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue()

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
      exprs => ShinglesExpr(exprs.head, intArg(exprs(1))),
      classOf[ShinglesExpr])
    inject("minhash_sig",
      exprs => MinHashSigExpr(exprs.head, intArg(exprs(1))),
      classOf[MinHashSigExpr])
    inject("simhash64", exprs => SimHashExpr(exprs.head),
      classOf[SimHashExpr])
  }
}
