package graft

import graft.operators.GlobalRank
import graft.pipeline.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-pass distributed global rank and its sorted-neighborhood
  * consumer. The DuckDB gate (d26_snm_dedup) pins the end-to-end result;
  * these pin the operator's contract directly: rank equals the
  * single-partition window's answer under any input layout, and the SNM
  * candidate generator sees exactly the rank-adjacent pairs.
  */
class GlobalRankSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("global rank equals single-partition row_number under shuffled layout") {
    val df = spark.range(1, 1001)
      .select((col("id") * 2654435761L % 1000003L).as("key"), col("id"))
      .repartition(17) // adversarial layout: ranks must not depend on it
    val got = GlobalRank.rowNumber(df, Seq(col("key"), col("id")))
      .select(col("key"), col("id"), col("rn"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = df.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(identity).zipWithIndex
      .map { case ((k, i), rk) => (k, i, rk + 1L) }.toSet
    assert(got == want)
  }

  test("ranks are dense 1..n with no gaps or duplicates") {
    val df = spark.range(500).select(col("id"), (col("id") % 7).as("key"))
    val rn = GlobalRank.rowNumber(df, Seq(col("key"), col("id")))
      .select("rn").as[Long].collect().sorted
    assert(rn.toSeq == (1L to 500L))
  }

  test("sorted-neighborhood finds a planted near-dup that hash blocking misses") {
    // Same prefix, one-word edit: sorts adjacent, exact-hash distinct.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappaX"),
      (3L, "completely different content with no overlap whatsoever here"),
      (4L, "another unrelated document body for padding the sort order"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sortedNeighborhood(docs,
        substring(lower(col("text")), 1, 24), window = 2, threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("SNM window bounds candidates: distant ranks never pair") {
    // Ten identical docs: all 45 unordered pairs are true dups, but a
    // window of 3 may only ever emit rank gaps 1..3 -> 9+8+7 = 24 pairs.
    val docs = (1L to 10L).map(i => (i, "same words in every document"))
      .toDF("doc_id", "text")
    val got = Dedup.sortedNeighborhood(docs, lit("k"), window = 3,
      threshold = 0.8).collect()
    assert(got.length == 24)
    got.foreach(r => assert(r.getLong(1) - r.getLong(0) <= 3))
  }
}
