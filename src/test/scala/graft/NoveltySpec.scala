package graft

import graft.pipeline.Novelty
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom-prefiltered novelty operator: exactness under any fpp
  * (the filter only relocates work), planted-duplicate behavior, and
  * gate parity with the plain anti-join.
  */
class NoveltySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fpDf(rows: Seq[(Long, String)]) =
    rows.toDF("id", "fp")

  test("planted duplicates: exactly the non-overlapping batch survives") {
    val corpus = fpDf((0L until 200L).map(i => (i, s"fp$i")))
    val batch = fpDf((0L until 50L).map(i =>
      (1000L + i, if (i % 5 == 0) s"fp${i * 4}" else s"new$i")))
    val got = Novelty.novelAgainst(batch, corpus, "fp", 200L, 4096L)
      .select(col("id")).as[Long].collect().toSet
    val want = (0L until 50L).filter(_ % 5 != 0).map(1000L + _).toSet
    assert(got == want)
  }

  test("a deliberately tiny filter (fpp ~ 1) still yields the exact set") {
    val corpus = fpDf((0L until 500L).map(i => (i, s"fp$i")))
    val batch = fpDf((0L until 100L).map(i =>
      (2000L + i, if (i < 30) s"fp${i * 16}" else s"fresh$i")))
    // 64 bits for 500 items: nearly every probe says "maybe", so the
    // whole batch takes the exact-verify path — the answer must not move.
    val tiny = Novelty.novelAgainst(batch, corpus, "fp", 500L, 64L)
      .select(col("id")).as[Long].collect().toSet
    val roomy = Novelty.novelAgainst(batch, corpus, "fp", 500L, 65536L)
      .select(col("id")).as[Long].collect().toSet
    val exact = batch.join(corpus, Seq("fp"), "left_anti")
      .select(col("id")).as[Long].collect().toSet
    assert(tiny == exact && roomy == exact)
  }

  test("gate parity with the plain anti-join on the corpus tables") {
    val sf = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, sf)
      .withColumn("fp",
        md5(substring(lower(trim(col("text"))), 1, 40).cast("binary")))
    val batch = docs.filter(col("source") === "src7")
    val corpus = docs.filter(col("source") =!= "src7")
    val got = graft.queries.PipelineQueries.d22BloomNovelty(spark, sf)
      .as[Long].collect().toSet
    val exact = batch.join(corpus.select(col("fp")).distinct(),
        Seq("fp"), "left_anti")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(got == exact)
    assert(got.nonEmpty, "fixture must leave some novel docs")
  }
}
