package graft

import graft.graph.GraphAlgos
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the degree-ordered triangle counter: closed-form graphs,
  * brute-force parity fuzz, input normalization, and the no-cartesian
  * plan property.
  */
class GraphAlgosSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    GraphAlgos.triangleCounts(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("K5: every node sits in C(4,2)=6 triangles") {
    val k5 = for (a <- 0L until 5L; b <- (a + 1) until 5L) yield (a, b)
    val got = counts(k5)
    assert(got == (0L until 5L).map(_ -> 6L).toMap)
  }

  test("bipartite graphs are triangle-free") {
    val bip = for (a <- 0L until 4L; b <- 10L until 14L) yield (a, b)
    assert(counts(bip).isEmpty)
  }

  test("duplicates, self-loops, and reversed orientations normalize away") {
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(counts(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("fuzz: parity with brute-force triangle enumeration") {
    val rnd = new scala.util.Random(909)
    for (_ <- 0 until 4) {
      val n = 12
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.4
      } yield (a, b)).toSeq
      val es = edges.toSet
      val want = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        c <- (b + 1) until n.toLong
        if es((a, b)) && es((b, c)) && es((a, c))
      } yield Seq(a, b, c)).flatten
        .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      assert(counts(edges) == want, "diverged from brute force")
    }
  }

  test("plan: three hash joins, no cartesian or nested loop") {
    val plan = GraphAlgos.triangleCounts(
        Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct")
      && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
