package graft

import graft.graph.Traverse
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the recursion operator (SURVEY.md §5 plan):
  * depth monotonicity and bag-semantics path counting on random DAGs.
  * Raw ScalaCheck generators sampled with a fixed seed (no scalatestplus
  * bridge in the offline dependency set); each case spins Spark jobs, so
  * the sample count is small but the cases are re-derivable.
  */
class TraversePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Random DAG: edges only go from lower to higher node id — acyclic by
  // construction, so brute-force path enumeration terminates.
  private val dagGen: Gen[List[(String, String)]] = for {
    n <- Gen.choose(2, 8)
    edges <- Gen.listOf(for {
      a <- Gen.choose(0, n - 2)
      b <- Gen.choose(a + 1, n - 1)
    } yield (s"v$a", s"v$b"))
  } yield edges.distinct

  private def samples(count: Int): Seq[List[(String, String)]] =
    (0 until count).flatMap(i =>
      dagGen(Gen.Parameters.default, Seed(42L + i))).filter(_.nonEmpty)

  test("depth monotonicity: result(d) rows are identical within result(d+1)") {
    samples(8).foreach { edges =>
      val e = edges.toDF("parent", "child")
      val seed = Seq("v0").toDF("node")
      val d = 1 + edges.size % 4
      def counts(depth: Int) =
        Traverse.expand(seed, e, depth).groupBy("node", "lvl").count()
          .as[(String, Int, Long)].collect()
          .map(r => (r._1, r._2) -> r._3).toMap
      val rd = counts(d)
      val rd1 = counts(d + 1)
      rd.foreach { case (k, c) =>
        assert(rd1.getOrElse(k, 0L) == c,
          s"depth-$d rows must persist in depth-${d + 1} run (edges=$edges)")
      }
    }
  }

  test("expectTinyFrontier hint never changes results on random DAGs") {
    samples(6).foreach { edges =>
      val e = edges.toDF("parent", "child")
      val seed = Seq("v0").toDF("node")
      def rows(hint: Boolean) =
        Traverse.expand(seed, e, maxDepth = 6, expectTinyFrontier = hint)
          .as[(String, Int)].collect().sorted.toSeq
      assert(rows(hint = true) == rows(hint = false), s"edges=$edges")
      graft.CacheRegistry.releaseAll()
    }
  }

  test("path counts on random DAGs equal brute-force enumeration") {
    samples(8).foreach { edges =>
      val e = edges.toDF("parent", "child")
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      def paths(from: String, depth: Int): Long =
        if (depth == 0) 0L
        else adj.getOrElse(from, Nil).map(n => 1L + paths(n, depth - 1)).sum
      val expected = paths("v0", 8)
      val got = Traverse.expand(Seq("v0").toDF("node"), e, 8).count()
      assert(got == expected, s"edges=$edges")
    }
  }

  test("multi-seed carry columns partition the bag per origin") {
    // The ABAC shape: several seeds with a carry column. Each origin's
    // slice of the output must equal a single-seed run from that origin.
    samples(6).foreach { edges =>
      val e = edges.toDF("parent", "child")
      val seeds = Seq(("o0", "v0"), ("o1", "v1")).toDF("origin", "node")
      val multi = Traverse.expand(seeds, e, 6)
        .select("origin", "node", "lvl").as[(String, String, Int)]
        .collect().groupBy(_._1).view
        .mapValues(_.map(r => (r._2, r._3)).sorted.toSeq).toMap
      Seq("o0" -> "v0", "o1" -> "v1").foreach { case (origin, root) =>
        val single = Traverse.expand(Seq(root).toDF("node"), e, 6)
          .select("node", "lvl").as[(String, Int)].collect().sorted.toSeq
        assert(multi.getOrElse(origin, Nil) == single,
          s"origin $origin diverged (edges=$edges)")
      }
      graft.CacheRegistry.releaseAll()
    }
  }

  test("keepPaths materializes exactly the brute-force path strings") {
    samples(6).foreach { edges =>
      val e = edges.toDF("parent", "child")
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      def walk(prefix: String, from: String, depth: Int): Seq[String] =
        if (depth == 0) Nil
        else adj.getOrElse(from, Nil).flatMap { n =>
          val p = s"$prefix->$n"
          p +: walk(p, n, depth - 1)
        }
      val expected = walk("v0", "v0", 5).sorted
      val got = Traverse.expand(Seq("v0").toDF("node"), e, 5, keepPaths = true)
        .select("path").as[String].collect().sorted.toSeq
      assert(got == expected, s"edges=$edges")
      graft.CacheRegistry.releaseAll()
    }
  }
}
