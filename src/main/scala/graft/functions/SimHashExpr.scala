package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression computing a 64-bit SimHash fingerprint per
  * row from a word array — the shuffle-free form of
  * [[graft.pipeline.Dedup.simHashFingerprint]]'s relational pipeline
  * (explode(words) → 16 nibble projections → groupBy(doc) with 64
  * sum-aggregates), which multiplied the corpus by its word count and
  * shuffled it back together per document.
  *
  * Bit parity with the relational form (and with the `d3_simhash` DuckDB
  * oracle, which recomputes all 64 votes from sha256 in SQL): the word
  * hash is the first 16 hex chars of sha256 — i.e. the first 8 digest
  * bytes — and vote bit j reads bit (j mod 4) of hex nibble 15 - j/4,
  * exactly the `conv(substring(hx, i+1, 1), 16, 10)` + shiftright/mask
  * chain of the declarative twin. Duplicate words vote multiply, as
  * explode did.
  */
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("SHA-256"))

  def compute(words: ArrayData): Long = {
    val md = digests.get()
    val votes = new Array[Int](64)
    val n = words.numElements()
    var wi = 0
    while (wi < n) {
      md.reset()
      val d = md.digest(words.getUTF8String(wi).getBytes)
      var j = 0
      while (j < 64) {
        // Hex nibble 15 - j/4 of the digest prefix: even hex positions are
        // the high nibble of byte i/2, odd the low nibble.
        val nibIdx = 15 - j / 4
        val b = d(nibIdx >> 1) & 0xFF
        val nib = if ((nibIdx & 1) == 0) (b >>> 4) & 0xF else b & 0xF
        votes(j) += (if (((nib >> (j % 4)) & 1) == 1) 1 else -1)
        j += 1
      }
      wi += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHashExpr(exprs.head), "built-in")
}
