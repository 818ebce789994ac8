package graft

import graft.pipeline.Tokenizer
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Subword tokenizer (t22/t23): hand-computable greedy longest-match
  * behavior under a forced-tiny vocabulary, the fallback-alphabet rule,
  * and the lossless-coverage invariant on real corpus data — the
  * properties the DuckDB gate's fixed corpus cannot isolate.
  */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val corpus =
    Seq((0L, "aaab aaab aaab ab z azb")).toDF("doc_id", "text")

  test("greedy longest-match with a 2-unit vocab, fallback chars included") {
    // Gram frequencies by hand: aa=6, ab=4, then aaa/aab/aaab=3, so the
    // top-2 vocabulary is {aa, ab}.
    val vocab = Tokenizer.subwordVocab(corpus, vocabSize = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(vocab.toSeq == Seq(("aa", 6L, 1), ("ab", 4L, 2)), vocab.toSeq)
    val got = Tokenizer.tokenizeWords(corpus, vocabSize = 2)
      .collect().map(r => r.getString(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    // aaab: "aa" wins at pos 1 (aaa/aaab unranked), then "ab".
    assert(got("aaab") == ((2, "aa|ab")), got)
    assert(got("ab") == ((1, "ab")), got)
    // No vocab gram applies to azb — pure single-char fallback.
    assert(got("azb") == ((3, "a|z|b")), got)
    // A 1-char word never even enters the gram stage.
    assert(got("z") == ((1, "z")), got)
  }

  test("fertility: per-doc rollup counts word OCCURRENCES, not types") {
    val got = Tokenizer.fertility(corpus, vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getDouble(3)))
    // 6 word occurrences; subwords 3×2 (aaab) + 1 + 1 + 3 = 11.
    assert(got.toSeq == Seq((0L, 6, 11, round11over6)), got.toSeq)
  }
  private val round11over6 =
    BigDecimal(11.0 / 6.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("coverage: subwords concatenate back to the word on real data") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = Tokenizer.tokenizeWords(docs)
      .withColumn("rebuilt", regexp_replace(col("subwords"), "\\|", ""))
      .filter(col("rebuilt") =!= col("word"))
      .count()
    assert(bad == 0L, "every word must be exactly covered by its subwords")
    // And fertility is always >= 1 (a word is at least one subword) with
    // longest-match never exceeding per-char splitting.
    val f = Tokenizer.fertility(docs)
      .agg(min(col("fertility")).as("mn")).collect().head.getDouble(0)
    assert(f >= 1.0)
  }
}
