package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Jaro-Winkler similarity — the record-linkage string kernel
  * (name/entity matching in curation pipelines) Spark lacks (it ships
  * only `levenshtein` and `soundex`). Canonical definition, pinned
  * empirically against DuckDB's `jaro_winkler_similarity` (the t19
  * oracle): empty strings score 0, match window ⌊max(|a|,|b|)/2⌋−1,
  * greedy left-to-right matching, transpositions = half the
  * matched-but-different count, Winkler prefix boost (ℓ ≤ 4, p = 0.1)
  * applied only when jaro > 0.7. The empty-string edge is probed, not
  * assumed: DuckDB 1.0.0 scores ('',''), ('','a') and ('a','') all
  * 0.0 — NOT the RapidFuzz convention of 1.0 for two empties — and the
  * kernel matches (FunctionsSpec pins all three).
  *
  * The loop is too branchy to inline profitably, so codegen emits a
  * call to the static [[JaroWinkler.similarity]] kernel — the standard
  * built-in pattern (UTF8String methods do the same); the expression
  * stays inside whole-stage codegen with no UDF serialization or row
  * boxing. O(|a|·window) time, two small boolean arrays of state.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")

  override protected def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      s"""${ev.value} = graft.functions.JaroWinkler.similarity(
         |  $l.toString(), $r.toString());""".stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JaroWinklerExpr =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerExpr {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", exprs => JaroWinklerExpr(exprs.head, exprs(1)),
      "built-in")
}

/** Static kernel (object → static forwarders, callable from generated
  * Java). Kept separate from the expression so specs can hit the scalar
  * directly.
  */
object JaroWinkler {

  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb, i + window + 1)
      var j = lo
      var found = false
      while (j < hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var half = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    // Integer halving, not /2.0: an odd matched-but-different count
    // floors (DuckDB/RapidFuzz convention — found empirically, 154/2000
    // random pairs diverged under the real-valued convention).
    val t = (half / 2).toDouble
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}
