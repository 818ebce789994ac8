package graft

import graft.functions.CanonicalJsonExpr
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point: register the engine's native functions
  * in any session via
  * `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`), so SQL users get them without
  * touching the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("canonical_json"),
      new ExpressionInfo(classOf[CanonicalJsonExpr].getName, "canonical_json"),
      exprs => CanonicalJsonExpr(exprs.head)))
  }
}
