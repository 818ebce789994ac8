package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for k-word sliding shingles over a word
  * array — the map-side workhorse of the MinHash near-dedup pipeline
  * (SURVEY.md §2.9; [[graft.pipeline.Dedup.shingles]]).
  *
  * The declarative form — `transform(sequence(0, n-k), i ->
  * concat_ws(' ', w[i+1] .. w[i+k]))` — pays an interpreted lambda
  * dispatch per output shingle, each evaluating k `element_at` probes and
  * a concat, and `sequence` materializes an index array first: for a
  * corpus that is pure per-word overhead on every scan. This expression
  * emits the shingle array in one generated-code call into a static
  * helper (the [[CanonicalJsonExpr]] pattern): a single pass, direct
  * `ArrayData` reads, `UTF8String.concatWs` joins, no boxed indices.
  *
  * Output contract is identical to the declarative form on non-null
  * input: `n >= k` → `n-k+1` space-joined windows in order; shorter
  * input → ONE shingle joining all words (empty input → `[""]`). A null
  * word array yields null (the declarative `when` chain yields `[""]`
  * there via concat_ws's null-skipping — unreachable in practice because
  * `split` never returns null for non-null text, and document text is
  * non-null; the cross-engine gate pins the behavior on real data).
  */
case class ShinglesExpr(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, "shingle length must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShinglesExpr.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShinglesExpr.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

object ShinglesExpr {
  private val Space = UTF8String.fromString(" ")

  /** One pass over the word array; null words (impossible from `split`)
    * are skipped by concatWs, matching the declarative concat_ws.
    */
  def compute(words: ArrayData, k: Int): ArrayData = {
    val n = words.numElements()
    val w = new Array[UTF8String](n)
    var i = 0
    while (i < n) { w(i) = words.getUTF8String(i); i += 1 }
    if (n >= k) {
      val out = new Array[AnyRef](n - k + 1)
      i = 0
      while (i <= n - k) {
        val win = new Array[UTF8String](k)
        System.arraycopy(w, i, win, 0, k)
        out(i) = UTF8String.concatWs(Space, win: _*)
        i += 1
      }
      new GenericArrayData(out)
    } else {
      new GenericArrayData(Array[AnyRef](UTF8String.concatWs(Space, w: _*)))
    }
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs =>
        ShinglesExpr(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
}
