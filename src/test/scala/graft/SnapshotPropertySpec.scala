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

  test("three-clause merge covers all four row classes") {
    // target: 1..4; source updates 2, deletes 3 (deleteWhen), inserts 9,
    // leaves 1 and 4 untouched; extra source columns are dropped.
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val source = Seq((2L, "B", false), (3L, "dead", true), (9L, "I", false))
      .toDF("k", "v", "del")
    val got = Snapshot.merge(target, source, Seq("k"), col("del"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B", 4L -> "d", 9L -> "I"))
    assert(Snapshot.merge(target, source, Seq("k"), col("del"))
      .columns.toSeq == Seq("k", "v"), "merge must keep target column order")
  }

  test("merge deleteWhen nulls read as keep, and empty source is identity") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val source = Seq((2L, "B")).toDF("k", "v")
    val nullCond = when(lit(false), lit(true)) // evaluates to null everywhere
    val got = Snapshot.merge(target, source, Seq("k"), nullCond)
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "B"))
    val empty = Snapshot.merge(target, source.limit(0), Seq("k"), lit(true))
      .as[(Long, String)].collect().toMap
    assert(empty == Map(1L -> "a", 2L -> "b"))
  }

  test("random merge batches match the driver-side model") {
    (1 to 6).foreach { i =>
      var model = Map[Long, Long](1L -> 10L, 2L -> 20L, 3L -> 30L)
      var df = model.toSeq.toDF("k", "v")
      val gen = Gen.listOfN(5,
        Gen.mapOf(Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 99L))))
      gen(Gen.Parameters.default, Seed(99L + i)).getOrElse(Nil).foreach { batch =>
        // deleteWhen (source v divisible by 10) only applies to MATCHED
        // rows; an unmatched delete-flagged row still takes the
        // unconditional NOT MATCHED INSERT * clause.
        model = batch.foldLeft(model) { case (m, (k, v)) =>
          if (v % 10 == 0 && m.contains(k)) m - k else m + (k -> v)
        }
        if (batch.nonEmpty)
          df = Snapshot.merge(df, batch.toSeq.toDF("k", "v"), Seq("k"),
            col("v") % 10 === 0)
      }
      val got = df.select("k", "v").as[(Long, Long)].collect().toMap
      assert(got == model, s"case $i diverged")
    }
  }

  test("diff classifies all four statuses; nulls compare null-safely") {
    val before = Seq(
      (1L, Option("a"), Option(10L)),   // unchanged
      (2L, None: Option[String], Option(20L)), // unchanged incl. NULL field
      (3L, Option("c"), Option(30L)),   // changed (value)
      (4L, Option("d"), None: Option[Long]), // changed (null -> value)
      (5L, Option("e"), Option(50L)))   // removed
      .toDF("k", "s", "v")
    val after = Seq(
      (1L, Option("a"), Option(10L)),
      (2L, None: Option[String], Option(20L)),
      (3L, Option("c"), Option(31L)),
      (4L, Option("d"), Option(40L)),
      (6L, Option("f"), Option(60L)))   // added
      .toDF("k", "s", "v")
    val got = Snapshot.diff(before, after, Seq("k")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "changed", 5L -> "removed", 6L -> "added"))
    // A NULL payload field must not poison the comparison: row 2 has
    // s = NULL on BOTH sides and classifies unchanged, not changed.
    intercept[IllegalArgumentException] {
      Snapshot.diff(before, after.select("k", "v", "s"), Seq("k"))
    }
  }

  test("diff fuzz: status classification matches a per-key model") {
    val rnd = new scala.util.Random(4711)
    for (round <- 1 to 5) {
      val baseKeys = (1L to 60L).filter(_ => rnd.nextBoolean())
      val before = baseKeys.map(k =>
        (k, if (rnd.nextInt(5) == 0) None else Some(s"v$k-${rnd.nextInt(3)}"),
          Option(rnd.nextInt(100).toLong)))
      // Mutate each key independently; add some fresh keys.
      val mutated = before.flatMap { case (k, s, v) =>
        rnd.nextInt(4) match {
          case 0 => None                                   // removed
          case 1 => Some((k, s, v, "unchanged"))
          case 2 => Some((k, s, v.map(_ + 1).orElse(Some(0L)), "changed"))
          case _ => Some((k,
            if (s.isEmpty) Some("was-null") else None, v, "changed"))
        }
      }
      val added = (100L to 110L).filter(_ => rnd.nextBoolean())
        .map(k => (k, Some(s"n$k"), Some(k), "added"))
      val expect =
        before.map(_._1).toSet.diff(mutated.map(_._1).toSet)
          .map(_ -> "removed").toMap ++
        mutated.map(t => t._1 -> t._4).toMap ++
        added.map(t => t._1 -> t._4).toMap
      val beforeDf = before.toDF("k", "s", "v")
      val afterDf = (mutated.map(t => (t._1, t._2, t._3)) ++
        added.map(t => (t._1, t._2, t._3))).toDF("k", "s", "v")
      val got = Snapshot.diff(beforeDf, afterDf, Seq("k")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == expect, s"round $round: diff diverged from the model")
    }
  }
}
