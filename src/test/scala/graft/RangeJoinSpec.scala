package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the bucketed range join: inclusive endpoints, no duplicate
  * pairs from the two-bucket replication, brute-force parity fuzz, and
  * the load-bearing plan property — the join the optimizer executes is
  * an EQUI-join, not the nested-loop plan raw inequality predicates get.
  */
class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val epoch = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
  private def ts(plusMs: Long) = new java.sql.Timestamp(epoch.getTime + plusMs)

  test("inclusive window, both endpoints, across bucket boundaries") {
    val left = Seq((1L, ts(10000L), "L")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, ts(5000L), "in_lo"),    // exactly at ts - before
      (1L, ts(10000L), "in_hi"),   // exactly at ts (after = 0)
      (1L, ts(4999L), "out_lo"),
      (1L, ts(10001L), "out_hi")).toDF("k", "ts", "rv")
    val got = RangeJoin.inner(left, right, Seq("k"), "ts", "ts",
      beforeMs = 5000L, afterMs = 0L)
      .select("range_rv").as[String].collect().toSet
    assert(got == Set("in_lo", "in_hi"))
  }

  test("two-bucket replication never duplicates a matched pair") {
    // Window 10s; right rows sit near bucket edges so each is replicated
    // into two buckets — every matched pair must still appear exactly once.
    val left = Seq((1L, ts(9999L), 0L), (1L, ts(10001L), 1L))
      .toDF("k", "ts", "lid")
    val right = (0L until 40L).map(i => (1L, ts(i * 500L), i))
      .toDF("k", "ts", "rid")
    val got = RangeJoin.inner(left, right, Seq("k"), "ts", "ts",
      beforeMs = 10000L, afterMs = 0L)
      .select("lid", "range_rid").as[(Long, Long)].collect()
    assert(got.length == got.distinct.length, "duplicate matched pairs")
  }

  test("fuzz: parity with brute-force interval filtering") {
    val rnd = new scala.util.Random(1313)
    for (_ <- 0 until 5) {
      val left = Seq.tabulate(50)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(100000).toLong, i.toLong))
      val right = Seq.tabulate(70)(i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(100000).toLong, 1000L + i))
      val lDf = left.map { case (k, ms, id) => (k, ts(ms), id) }
        .toDF("k", "ts", "lid")
      val rDf = right.map { case (k, ms, id) => (k, ts(ms), id) }
        .toDF("k", "ts", "rid")
      val (before, after) = (7000L, 3000L)
      val got = RangeJoin.inner(lDf, rDf, Seq("k"), "ts", "ts", before, after)
        .select("lid", "range_rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (lk, lms, lid) <- left
        (rk, rms, rid) <- right
        if lk == rk && rms >= lms - before && rms <= lms + after
      } yield (lid, rid)).toSet
      assert(got == want, "range join diverged from brute force")
    }
  }

  test("containment is exact at microsecond precision") {
    def tsUs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1704067200L, us * 1000L))
    val left = Seq((1L, tsUs(10000000L), "L")).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, tsUs(5000000L), "in_lo"),   // exactly at ts - before
      (1L, tsUs(4999500L), "out_lo"),  // 500µs outside (ms math keeps it)
      (1L, tsUs(10000500L), "out_hi")) // 500µs past ts (after = 0)
      .toDF("k", "ts", "rv")
    val got = RangeJoin.inner(left, right, Seq("k"), "ts", "ts",
      beforeMs = 5000L, afterMs = 0L)
      .select("range_rv").as[String].collect().toSet
    assert(got == Set("in_lo"))
  }

  test("dotted column names resolve literally, not as field access") {
    val left = Seq((1L, ts(1000L), "a")).toDF("k.x", "event.ts", "l.v")
    val right = Seq((1L, ts(500L), "r")).toDF("k.x", "event.ts", "r.v")
    val got = RangeJoin.inner(left, right, Seq("k.x"), "event.ts",
        "event.ts", beforeMs = 1000L, afterMs = 0L)
      .select(col("`l.v`"), col("`range_r.v`")).as[(String, String)]
      .collect().toSet
    assert(got == Set(("a", "r")))
  }

  test("plan: equi-join (hash/sort-merge), never nested-loop or cartesian") {
    val left = Seq((1L, ts(0L), "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, ts(0L), "r")).toDF("k", "ts", "rv")
    val plan = RangeJoin.inner(left, right, Seq("k"), "ts", "ts", 1000L, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"range join must stay an equi-join:\n$plan")
  }

  // ---- interval-overlap join ----

  private def iv(k: Long, sMs: Long, eMs: Long, id: Long) =
    (k, ts(sMs), ts(eMs), id)

  test("overlap fuzz: parity with brute-force interval intersection") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 5) {
      val left = Seq.tabulate(40) { i =>
        val s = rnd.nextInt(100000).toLong
        (rnd.nextInt(4).toLong, s, s + rnd.nextInt(20000), i.toLong)
      }
      val right = Seq.tabulate(60) { i =>
        val s = rnd.nextInt(100000).toLong
        (rnd.nextInt(4).toLong, s, s + rnd.nextInt(20000), 1000L + i)
      }
      val lDf = left.map { case (k, s, e, id) => iv(k, s, e, id) }
        .toDF("k", "s", "e", "lid")
      val rDf = right.map { case (k, s, e, id) => iv(k, s, e, id) }
        .toDF("k", "s", "e", "rid")
      val got = RangeJoin.overlap(lDf, rDf, Seq("k"), "s", "e", "s", "e",
        bucketMs = 5000L)
        .select("lid", "ov_rid").as[(Long, Long)].collect()
      assert(got.length == got.distinct.length,
        "multi-bucket replication duplicated a pair")
      val want = (for {
        (lk, ls, le, lid) <- left
        (rk, rs, re, rid) <- right
        if lk == rk && ls <= re && rs <= le
      } yield (lid, rid)).toSet
      assert(got.toSet == want, "overlap join diverged from brute force")
    }
  }

  test("overlap endpoints are inclusive: touching intervals match") {
    val lDf = Seq(iv(1L, 0L, 10000L, 1L)).toDF("k", "s", "e", "lid")
    val rDf = Seq(
      iv(1L, 10000L, 20000L, 10L),  // starts exactly at left end
      iv(1L, 10001L, 20000L, 11L),  // 1 ms past — no overlap
      iv(1L, -5000L, 0L, 12L),      // ends exactly at left start
      iv(1L, -5000L, -1L, 13L))     // 1 ms before — no overlap
      .toDF("k", "s", "e", "rid")
    val got = RangeJoin.overlap(lDf, rDf, Seq("k"), "s", "e", "s", "e",
      bucketMs = 4000L).select("ov_rid").as[Long].collect().toSet
    assert(got == Set(10L, 12L))
  }

  test("overlap emits long spanning intervals exactly once") {
    // One long left interval covering many buckets; rights scattered
    // inside it, each sharing several buckets with the left.
    val lDf = Seq(iv(1L, 0L, 50000L, 1L)).toDF("k", "s", "e", "lid")
    val rDf = (0L until 20L).map(i => iv(1L, i * 2000L, i * 2000L + 9000L, i))
      .toDF("k", "s", "e", "rid")
    val got = RangeJoin.overlap(lDf, rDf, Seq("k"), "s", "e", "s", "e",
      bucketMs = 3000L).select("lid", "ov_rid").as[(Long, Long)].collect()
    assert(got.length == 20 && got.distinct.length == 20)
  }

  test("overlap guards fail loudly: fan-out blowup and inverted intervals") {
    val lDf = Seq(iv(1L, 0L, 10000000L, 1L)).toDF("k", "s", "e", "lid")
    val rDf = Seq(iv(1L, 0L, 1000L, 2L)).toDF("k", "s", "e", "rid")
    val blown = intercept[Exception] {
      RangeJoin.overlap(lDf, rDf, Seq("k"), "s", "e", "s", "e",
        bucketMs = 1000L, maxReplicas = 16).count()
    }
    assert(blown.getMessage != null)
    val inverted = Seq(iv(1L, 10000L, 0L, 1L)).toDF("k", "s", "e", "lid")
    intercept[Exception] {
      RangeJoin.overlap(inverted, rDf, Seq("k"), "s", "e", "s", "e",
        bucketMs = 1000L).count()
    }
  }

  test("overlap plan: equi-join, never nested-loop or cartesian") {
    val lDf = Seq(iv(1L, 0L, 1000L, 1L)).toDF("k", "s", "e", "lid")
    val rDf = Seq(iv(1L, 0L, 1000L, 2L)).toDF("k", "s", "e", "rid")
    val plan = RangeJoin.overlap(lDf, rDf, Seq("k"), "s", "e", "s", "e",
      bucketMs = 1000L).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"),
      s"overlap join must stay an equi-join:\n$plan")
  }
}
