package graft

import graft.streaming.CdcStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based fuzz of the CDC micro-batch merge (SURVEY.md §2.8 M8 /
  * §2.10): random change batches — duplicate keys in one batch,
  * out-of-order timestamps, create/update/delete interleavings — applied
  * through [[CdcStream.mergeCdcBatch]] must converge to a driver-side
  * last-writer-wins model keyed on (ts_ms desc, seq desc).
  */
class CdcPropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (id, name, op, ts_ms, seq)
  private case class Ev(id: Long, name: String, op: String, ts: Long, seq: Long)

  private val evGen: Gen[Ev] = for {
    id <- Gen.choose(0L, 9L)
    n <- Gen.choose(0, 99)
    op <- Gen.oneOf("c", "u", "d", "r")
    ts <- Gen.choose(0L, 5L) // narrow range forces ts collisions
  } yield Ev(id, s"n$n", op, ts, 0L)

  private def batches(seed: Long): List[List[Ev]] =
    Gen.listOfN(5, Gen.listOfN(12, evGen))(Gen.Parameters.default, Seed(seed))
      .getOrElse(Nil)
      // a global seq disambiguates like a source offset would
      .map(_.zipWithIndex.map { case (e, i) => e.copy(seq = i.toLong) })

  test("random CDC batch sequences match the last-writer-wins model") {
    (1 to 6).foreach { i =>
      var model = Map[Long, String](1L -> "init1", 2L -> "init2")
      var snap = model.toSeq.toDF("id", "name")
      batches(1000L + i).foreach { b =>
        // model: the winner per id is max by (ts, seq); d removes the key
        b.groupBy(_.id).foreach { case (id, evs) =>
          val w = evs.maxBy(e => (e.ts, e.seq))
          model = if (w.op == "d") model - id else model + (id -> w.name)
        }
        val bdf = b.map(e => (e.id, e.name, e.op, e.ts, e.seq))
          .toDF("id", "name", "op", "ts_ms", "seq")
        snap = CdcStream.mergeCdcBatch(snap, bdf)
          .localCheckpoint(true) // the sink materializes per micro-batch
      }
      val got = snap.select("id", "name").as[(Long, String)].collect().toMap
      assert(got == model, s"case $i diverged")
    }
  }
}
