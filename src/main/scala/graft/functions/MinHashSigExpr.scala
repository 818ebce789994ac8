package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression computing a full MinHash signature per row —
  * the shuffle-free form of the signature stage in
  * [[graft.pipeline.Dedup.minHashLsh]].
  *
  * The relational form (`explode(shset)` → `groupBy(doc).agg(min(
  * xxhash64(lit(i), sh)) × k)`) multiplies the corpus by its shingle
  * count and SHUFFLES it to re-assemble per-document rows — at 100 TB
  * that explode+exchange is the dominant cost of near-dedup's map side.
  * This expression folds the same k seeded minimums in one generated-code
  * pass over the shingle array: no explode, no shuffle, signature born on
  * the row it belongs to.
  *
  * Hash parity is exact: each element hash replays Spark's own
  * `xxhash64(lit(i), sh)` chain via [[XxHash64Function]] — the int seed
  * literal folded in first (seed 42), the shingle's UTF8 bytes second —
  * so signatures, band buckets, and therefore the emitted candidate
  * pairs are bit-identical to the relational form (asserted in
  * PipelineSpec, and the `d2_minhash_recall` gate pins pair recall
  * against the DuckDB-exact ground truth either way).
  */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1, "numHashes must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigExpr.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSigExpr.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

object MinHashSigExpr {

  /** Min over shingles of `xxhash64(lit(i), shingle)` for each seed index
    * i — the per-seed prefix `hash(i, 42)` is corpus-independent, so it is
    * computed once per call, not once per (shingle, seed).
    */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val seeds = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      seeds(i) = XxHash64Function.hash(i, IntegerType, 42L)
      i += 1
    }
    val out = Array.fill(numHashes)(Long.MaxValue)
    val n = shingles.numElements()
    var j = 0
    while (j < n) {
      val s = shingles.getUTF8String(j)
      i = 0
      while (i < numHashes) {
        val h = XxHash64Function.hash(s, StringType, seeds(i))
        if (h < out(i)) out(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs =>
        MinHashSigExpr(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue()), "built-in")
}
