package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the as-of join sweep: inclusive tie matching,
  * whole-row payload propagation under genuine nulls, LEFT-outer
  * survival, deterministic duplicate resolution via tiebreak, and a
  * brute-force parity fuzz against the O(n·m) range-join + argmax
  * definition the operator exists to avoid.
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("backward join picks latest right row at-or-before, inclusive") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 6L, "r6"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
      .select("k", "ts", "lv", "asof_rv").as[(Long, Long, String, Option[String])]
      .collect().toSet
    assert(got == Set(
      (1L, 10L, "a", Some("r10")),  // exact tie matches (inclusive)
      (1L, 20L, "b", Some("r15")),  // latest preceding, not first
      (2L, 5L, "c", None)))         // right row is later -> no match
  }

  test("null payload fields do not stitch values from older right rows") {
    val left = Seq((1L, 30L)).toDF("k", "ts")
    val right = Seq((1L, 10L, Some("old"), Some(100L)),
      (1L, 20L, None, Some(200L))).toDF("k", "ts", "s", "n")
    val row = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
      .select("asof_s", "asof_n").as[(Option[String], Option[Long])]
      .head()
    // The matched row is ts=20 whose s IS NULL; a per-column sweep would
    // leak "old" from ts=10 into s while taking n=200 from ts=20.
    assert(row == (None, Some(200L)))
  }

  test("duplicate (key, ts) right rows resolve by tiebreak, last wins") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
      .toDF("k", "ts", "id")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      tiebreak = Some("id")).select("asof_id").as[Long].head()
    assert(got == 9L)
  }

  test("fuzz: parity with the brute-force range-join + argmax definition") {
    val rnd = new scala.util.Random(4242)
    for (_ <- 0 until 5) {
      val left = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
        .distinct.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, i.toLong) }
      val right = Seq.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
        .distinct.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 1000L + i) }
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "ts", "rid")
      val got = AsOfJoin.backward(lDf, rDf, Seq("k"), "ts", "ts")
        .select("lid", "asof_rid").as[(Long, Option[Long])]
        .collect().toMap
      val want = left.map { case (k, ts, lid) =>
        val cands = right.filter(r => r._1 == k && r._2 <= ts)
        lid -> (if (cands.isEmpty) None
                else Some(cands.maxBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want, "asof diverged from brute force")
    }
  }

  test("tolerance drops matches older than the window, keeps the row") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(t0.getTime + plusMs)
    val left = Seq((1L, ts(100000L), "a"), (1L, ts(200000L), "b"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, ts(95000L), "r1")).toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      toleranceMs = Some(30000L))
      .select("lv", "asof_rv").as[(String, Option[String])]
      .collect().toMap
    // "a" is 5s after r1 (inside 30s window); "b" is 105s after (outside).
    assert(got == Map("a" -> Some("r1"), "b" -> None))
  }

  test("null keys never match: right dropped, left survives unmatched") {
    val left = Seq((Option(1L), 10L, "a"), (None: Option[Long], 10L, "b"))
      .toDF("k", "ts", "lv")
    val right = Seq((Option(1L), 5L, "r1"), (None: Option[Long], 5L, "rnull"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
      .select("lv", "asof_rv").as[(String, Option[String])]
      .collect().toMap
    // A null-keyed left row must NOT pick up the null-keyed right row
    // (SQL equality: null = null is not true), but it stays in the output.
    assert(got == Map("a" -> Some("r1"), "b" -> None))
  }

  test("probe timestamp doubling as a key is rejected") {
    val df = Seq((1L, 10L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df, Seq("ts"), "ts", "k")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.backward(df, df, Seq("k", "ts"), "ts", "ts")
    }
  }

  test("dotted column names resolve literally, not as field access") {
    val left = Seq((1L, 10L, "a")).toDF("k.x", "event.ts", "l.v")
    val right = Seq((1L, 5L, "r")).toDF("k.x", "event.ts", "r.v")
    val got = AsOfJoin.backward(left, right, Seq("k.x"), "event.ts",
        "event.ts")
      .select(col("`l.v`"), col("`asof_r.v`")).as[(String, Option[String])]
      .head()
    assert(got == (("a", Some("r"))))
  }

  test("tolerance compares at microsecond precision") {
    def tsUs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(1704067200L, us * 1000L))
    // Match is 1000.5 ms older than the probe; an ms-truncated diff reads
    // 1000 and would keep it, the µs diff reads 1000500 µs > 1000 ms.
    val left = Seq((1L, tsUs(2000500L), "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, tsUs(1000000L), "r")).toDF("k", "ts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts",
      toleranceMs = Some(1000L))
      .select("asof_rv").as[Option[String]].head()
    assert(got.isEmpty, "match 500µs past tolerance must be dropped")
  }

  test("forward join picks earliest right row at-or-after, inclusive") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"),
      (2L, 9L, "d")).toDF("k", "ts", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 6L, "r6"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts")
      .select("k", "ts", "lv", "asof_rv")
      .as[(Long, Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 10L, "a", Some("r10")),  // exact tie matches (inclusive)
      (1L, 20L, "b", None),         // nothing later -> unmatched survives
      (2L, 5L, "c", Some("r6")),    // earliest following
      (2L, 9L, "d", None)))
  }

  test("forward duplicates resolve by tiebreak, FIRST wins; tol is lookahead") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L))
      .toDF("k", "ts", "id")
    val got = AsOfJoin.forward(left, right, Seq("k"), "ts", "ts",
      tiebreak = Some("id")).select("asof_id").as[Long].head()
    assert(got == 7L, "forward direction takes the tiebreak-smallest")

    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(t0.getTime + plusMs)
    val l2 = Seq((1L, ts(0L), "a"), (1L, ts(90000L), "b"))
      .toDF("k", "ts", "lv")
    val r2 = Seq((1L, ts(100000L), "r")).toDF("k", "ts", "rv")
    val got2 = AsOfJoin.forward(l2, r2, Seq("k"), "ts", "ts",
      toleranceMs = Some(30000L))
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    // "a" is 100s before r (outside 30s lookahead); "b" is 10s before.
    assert(got2 == Map("a" -> None, "b" -> Some("r")))
  }

  test("forward fuzz: parity with brute-force min-following definition") {
    val rnd = new scala.util.Random(77)
    for (_ <- 0 until 5) {
      val left = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
        .distinct.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, i.toLong) }
      val right = Seq.fill(40)((rnd.nextInt(5).toLong, rnd.nextInt(50).toLong))
        .distinct.zipWithIndex
        .map { case ((k, ts), i) => (k, ts, 1000L + i) }
      val got = AsOfJoin.forward(left.toDF("k", "ts", "lid"),
          right.toDF("k", "ts", "rid"), Seq("k"), "ts", "ts")
        .select("lid", "asof_rid").as[(Long, Option[Long])]
        .collect().toMap
      val want = left.map { case (k, ts, lid) =>
        val cands = right.filter(r => r._1 == k && r._2 >= ts)
        lid -> (if (cands.isEmpty) None
                else Some(cands.minBy(r => (r._2, r._3))._3))
      }.toMap
      assert(got == want, "forward asof diverged from brute force")
    }
  }

  test("nearest: min |gap| wins, backward breaks ties, tolerance both ways") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(plusMs: Long) = new java.sql.Timestamp(t0.getTime + plusMs)
    val left = Seq(
      (1L, ts(100L), "a"),   // back at 90 (gap 10), fwd at 130 (gap 30) -> back
      (1L, ts(125L), "b"),   // back at 90 (35), fwd at 130 (5) -> fwd
      (1L, ts(110L), "c"),   // equidistant 90/130 (20/20) -> BACKWARD wins
      (2L, ts(500L), "d"))   // no candidates -> null
      .toDF("k", "ts", "lv")
    val right = Seq((1L, ts(90L), "r90"), (1L, ts(130L), "r130"))
      .toDF("k", "ts", "rv")
    val got = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts")
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    assert(got == Map("a" -> Some("r90"), "b" -> Some("r130"),
      "c" -> Some("r90"), "d" -> None))
    // Tolerance prunes both directions independently.
    val gotTol = AsOfJoin.nearest(left, right, Seq("k"), "ts", "ts",
      toleranceMs = Some(7L))
      .select("lv", "asof_rv").as[(String, Option[String])].collect().toMap
    assert(gotTol == Map("a" -> None, "b" -> Some("r130"),
      "c" -> None, "d" -> None))
    // Exact tie on the timestamp is gap 0 through the backward frame.
    val tie = AsOfJoin.nearest(Seq((1L, ts(90L), "x")).toDF("k", "ts", "lv"),
      right, Seq("k"), "ts", "ts")
      .select("asof_rv").as[Option[String]].head()
    assert(tie.contains("r90"))
  }

  test("nearest fuzz: parity with brute-force min-abs-gap definition") {
    val t0 = 1704067200000L
    val rnd = new scala.util.Random(31)
    for (_ <- 0 until 3) {
      val left = Seq.fill(50)((rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
        .distinct.zipWithIndex.map { case ((k, s), i) => (k, s, i.toLong) }
      val right = Seq.fill(30)((rnd.nextInt(4).toLong, rnd.nextInt(40).toLong))
        .distinct.zipWithIndex.map { case ((k, s), i) => (k, s, 1000L + i) }
      def toTs(s: Long) = new java.sql.Timestamp(t0 + s * 1000L)
      val lDf = left.map(t => (t._1, toTs(t._2), t._3)).toDF("k", "ts", "lid")
      val rDf = right.map(t => (t._1, toTs(t._2), t._3)).toDF("k", "ts", "rid")
      val got = AsOfJoin.nearest(lDf, rDf, Seq("k"), "ts", "ts")
        .select("lid", "asof_rid").as[(Long, Option[Long])].collect().toMap
      val want = left.map { case (k, s, lid) =>
        val cands = right.filter(_._1 == k)
        lid -> (if (cands.isEmpty) None else {
          val best = cands.map { r =>
            val gap = math.abs(r._2 - s)
            // backward (r.ts <= s) wins ties over forward
            (gap, if (r._2 <= s) 0 else 1, r)
          }.minBy(t => (t._1, t._2, if (t._2 == 0) -t._3._2 else t._3._2))
          Some(best._3._3)
        })
      }.toMap
      assert(got == want, "nearest diverged from brute force")
    }
  }

  test("plan: one exchange on the key, no join node, no cartesian") {
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, 5L, "r")).toDF("k", "ts", "rv")
    val plan = AsOfJoin.backward(left, right, Seq("k"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin")
      && !plan.contains("BroadcastHashJoin"),
      s"asof should not plan a join:\n$plan")
  }
}
