package graft

import graft.state.Snapshot
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz of the snapshot mutation algebra (SURVEY.md §2.8):
  * random op sequences applied both through [[Snapshot]] and through a
  * driver-side Map/Set model must converge to the same state. The oracle
  * gates pin fixed mutation schedules; this pins the algebra itself.
  * Raw ScalaCheck generators with fixed seeds, like TraversePropertySpec.
  */
class SnapshotPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private sealed trait Op
  private case class Upsert(rows: Map[Long, Long]) extends Op
  private case class Delete(keys: Set[Long]) extends Op
  private case class Update(mod: Long, add: Long) extends Op

  private val opGen: Gen[Op] = Gen.oneOf(
    Gen.mapOf(Gen.zip(Gen.choose(0L, 19L), Gen.choose(0L, 99L))).map(Upsert),
    Gen.containerOf[Set, Long](Gen.choose(0L, 19L)).map(Delete),
    Gen.zip(Gen.choose(2L, 5L), Gen.choose(100L, 900L))
      .map { case (m, a) => Update(m, a) })

  private def opSeq(seed: Long): List[Op] =
    Gen.listOfN(8, opGen)(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  test("random mutation sequences match the driver-side model") {
    (1 to 6).foreach { case i =>
      var model = Map[Long, Long](1L -> 10L, 2L -> 20L, 3L -> 30L)
      var df = model.toSeq.toDF("k", "v")
      opSeq(42L + i).foreach {
        case Upsert(rows) =>
          model = model ++ rows
          if (rows.nonEmpty)
            df = Snapshot.upsert(df, rows.toSeq.toDF("k", "v"), Seq("k"))
        case Delete(keys) =>
          model = model -- keys
          df = Snapshot.delete(df, col("k").isin(keys.toSeq: _*))
        case Update(mod, add) =>
          model = model.map { case (k, v) =>
            k -> (if (k % mod == 0) v + add else v) }
          df = Snapshot.updateWhere(df, col("k") % mod === 0,
            Map("v" -> (col("v") + add)))
      }
      // USING-joins reorder output columns (join keys first) — read by name
      val got = df.select("k", "v").as[(Long, Long)].collect().toMap
      assert(got == model, s"case $i diverged")
    }
  }

  test("random rewire sequences match the driver-side edge model") {
    (1 to 6).foreach { case i =>
      var model = Set[(Long, Long)](1L -> 2L, 2L -> 3L, 3L -> 4L)
      var df = model.toSeq.toDF("parent", "child")
      val gen = Gen.listOfN(6,
        Gen.zip(Gen.containerOf[Set, Long](Gen.choose(0L, 9L)),
          Gen.mapOf(Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))))
      gen(Gen.Parameters.default, Seed(7L + i)).getOrElse(Nil).foreach {
        case (targets, newEdges) =>
          // drop all edges INTO the targets, append the replacements
          model = model.filterNot { case (_, c) => targets.contains(c) } ++
            newEdges.toSet
          df = Snapshot.rewire(df,
            targets.toSeq.toDF("child"),
            newEdges.toSeq.toDF("parent", "child"))
      }
      val got = df.select("parent", "child").as[(Long, Long)].collect().toSet
      assert(got == model, s"case $i diverged")
    }
  }
}
