package graft

import graft.functions.MisraGries
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the mergeable Misra-Gries summary: the formal guarantee on
  * adversarial and random streams, merge associativity with the bound
  * preserved, and behavior through the actual Dataset aggregation path.
  */
class MisraGriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def summarize(k: Int, items: Seq[String]): Map[String, Long] = {
    val mg = new MisraGries(k)
    items.foldLeft(mg.zero)(mg.reduce)
  }

  private def checkGuarantee(k: Int, items: Seq[String],
      sketch: Map[String, Long]): Unit = {
    val exact = items.groupBy(identity).map { case (x, v) => x -> v.size.toLong }
    val bound = items.size.toDouble / (k + 1)
    exact.foreach { case (x, c) =>
      if (c > bound)
        assert(sketch.contains(x), s"heavy item $x (count $c) missing")
      sketch.get(x).foreach { est =>
        assert(est <= c, s"$x overestimated: $est > $c")
        assert(c - est <= bound, s"$x undercounted past the bound")
      }
    }
    // Sketch never stores phantom items.
    sketch.keys.foreach(x => assert(exact.contains(x)))
    assert(sketch.size <= k)
  }

  test("guarantee holds on a skewed stream") {
    val items = Seq.fill(500)("hot") ++
      (0 until 400).map(i => s"cold$i") ++ Seq.fill(120)("warm")
    checkGuarantee(8, items, summarize(8, items))
  }

  test("guarantee holds under random merges of partial summaries") {
    val rnd = new scala.util.Random(515)
    val mg = new MisraGries(10)
    for (_ <- 0 until 5) {
      val items = Seq.tabulate(2000)(_ =>
        if (rnd.nextDouble() < 0.4) s"h${rnd.nextInt(3)}"
        else s"t${rnd.nextInt(300)}")
      // Split into uneven partitions, summarize each, merge pairwise.
      val parts = items.grouped(rnd.nextInt(400) + 100)
        .map(p => p.foldLeft(mg.zero)(mg.reduce)).toSeq
      val merged = parts.reduce(mg.merge)
      checkGuarantee(10, items, merged)
    }
  }

  test("exact when capacity covers the vocabulary") {
    val items = Seq("a", "b", "a", "c", "a", "b")
    assert(summarize(10, items) == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("runs through the Dataset aggregation path with partition merges") {
    import spark.implicits._
    val items = (Seq.fill(300)("hot") ++ (0 until 200).map(i => s"c$i"))
    val ds = spark.createDataset(new scala.util.Random(99).shuffle(items))
      .repartition(8)
    val out = ds.select(new MisraGries(5).toColumn.name("sk"))
      .head().toMap
    checkGuarantee(5, items, out)
    assert(out.contains("hot"))
  }
}
