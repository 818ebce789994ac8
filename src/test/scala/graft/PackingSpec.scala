package graft

import graft.pipeline.Packing
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed two-pass prefix-sum packing against the naive
  * global-cumsum definition on randomized corpora — bucket boundaries
  * must be invisible in the result — plus the structural properties
  * (shards contiguous from 0, assignment order-deterministic).
  */
class PackingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("two-pass packing matches the global-cumsum definition") {
    val rnd = new scala.util.Random(777)
    for (trial <- 0 until 3) {
      // Sparse, shuffled ids; token counts 1..40 via texts of n words.
      val docs = rnd.shuffle((0 until 120).toList)
        .map(i => (i * (trial + 2) + rnd.nextInt(trial + 1), // gaps, dups none
          Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
        .distinctBy(_._1)
      val df = docs.map { case (id, t) => (id.toLong, t) }
        .toDF("doc_id", "text")
      val budget = 64L
      val got = Packing.tokenShards(df, budget, buckets = 5)
        .as[(Long, Long, Long)].collect().toSeq

      var prefix = 0L
      val want = docs.sortBy(_._1).map { case (id, t) =>
        val toks = t.split("\\s+").length.toLong
        val shard = prefix / budget
        prefix += toks
        (shard, toks)
      }.groupBy(_._1).view
        .mapValues(v => (v.size.toLong, v.map(_._2).sum)).toSeq
        .map { case (s, (n, tot)) => (s, n, tot) }.sortBy(_._1)
      assert(got == want, s"trial $trial diverged from global cumsum")
      assert(got.map(_._1) == got.indices.map(_.toLong),
        "shard ids must be contiguous from 0")
    }
  }
}
