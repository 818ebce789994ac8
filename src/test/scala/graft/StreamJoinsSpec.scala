package graft

import graft.streaming.StreamJoins
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives the stream-stream interval join through the real streaming
  * runtime (MemoryStream sources, append sink) and pins it against the
  * identical plan in batch mode — the batch-twin contract the w5 gate
  * hash-checks in DuckDB.
  */
class StreamJoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = java.sql.Timestamp.valueOf("2024-06-01 12:00:00")
  private def ts(plusMin: Long) =
    new java.sql.Timestamp(base.getTime + plusMin * 60000L)

  // (event_id, user_id, ts)
  private val purchases = Seq(
    (100L, 1L, ts(0)), (101L, 1L, ts(180)), (102L, 2L, ts(60)))
  private val clicks = Seq(
    (1L, ts(-60)),   // 1h before purchase 100 — in window
    (1L, ts(0)),     // exactly at purchase 100 — inclusive
    (1L, ts(70)),    // 110 min before purchase 101 — in its window
    (1L, ts(50)),    // 130 min before purchase 101 — outside the 2h window
    (1L, ts(-121)),  // 121 min before purchase 100 — outside 2h window
    (2L, ts(61)),    // 1 min AFTER purchase 102 — outside (backward only)
    (3L, ts(30)))    // different user — never matches

  test("stream-stream interval join matches its batch twin exactly") {
    implicit val sqlCtx = spark.sqlContext
    val pSrc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickContext(
      pSrc.toDF().toDF("event_id", "user_id", "ts"),
      cSrc.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("w5_join").start()
    try {
      pSrc.addData(purchases: _*)
      cSrc.addData(clicks: _*)
      q.processAllAvailable()
      val streamed = spark.table("w5_join")
        .select("event_id", "c_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      val batch = StreamJoins.clickContext(
        purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("user_id", "ts"))
        .select("event_id", "c_ts").as[(Long, java.sql.Timestamp)]
        .collect().toSet
      assert(streamed == batch, "streaming and batch twins diverged")
      // The expected pair set, by hand: inclusive at both window edges,
      // backward-only, per-user.
      val want = Set(100L -> ts(-60), 100L -> ts(0), 101L -> ts(70))
      assert(streamed == want)
    } finally q.stop()
  }

  test("left-outer stream join emits null rows only after watermark") {
    implicit val sqlCtx = spark.sqlContext
    val pSrc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickContextOuter(
      pSrc.toDF().toDF("event_id", "user_id", "ts"),
      cSrc.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("w6_join").start()
    try {
      pSrc.addData(purchases: _*)
      cSrc.addData(clicks: _*)
      q.processAllAvailable()
      val early = spark.table("w6_join")
        .filter(col("c_ts").isNull).count()
      assert(early == 0L,
        "null rows must NOT emit before the watermark proves no match")
      // Far-future flush rows on both sides advance both watermarks past
      // every open join window, forcing the unmatched purchase (102) out
      // with a null click.
      pSrc.addData((999L, 999L, ts(10000)))
      cSrc.addData((999L, ts(10000)))
      q.processAllAvailable()
      // A second even-later batch lets the engine finalize the previous
      // watermark advance (watermarks apply from the NEXT batch).
      pSrc.addData((998L, 998L, ts(20000)))
      cSrc.addData((998L, ts(20000)))
      q.processAllAvailable()
      val streamed = spark.table("w6_join")
        .filter(col("event_id") < 900)
        .select("event_id", "c_ts")
        .collect().map(r => (r.getLong(0),
          Option(r.getTimestamp(1)))).toSet
      val batch = StreamJoins.clickContextOuter(
        purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("user_id", "ts"))
        .select("event_id", "c_ts")
        .collect().map(r => (r.getLong(0),
          Option(r.getTimestamp(1)))).toSet
      assert(streamed == batch,
        "streaming left-outer and its batch twin diverged")
      assert(streamed.contains(102L -> None),
        "the unmatched purchase must emit with a null click")
    } finally q.stop()
  }

  test("full-outer stream join: unmatched rows from BOTH sides emit") {
    implicit val sqlCtx = spark.sqlContext
    val pSrc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickContextFull(
      pSrc.toDF().toDF("event_id", "user_id", "ts"),
      cSrc.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("w10_join").start()
    try {
      pSrc.addData(purchases: _*)
      cSrc.addData(clicks: _*)
      q.processAllAvailable()
      // Watermark flush from both sides (same protocol as the w6 test).
      pSrc.addData((999L, 999L, ts(10000)))
      cSrc.addData((999L, ts(10000)))
      q.processAllAvailable()
      pSrc.addData((998L, 998L, ts(20000)))
      cSrc.addData((998L, ts(20000)))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
          Option(r.getTimestamp(2)).map(_.getTime),
          Option(r.getTimestamp(3)).map(_.getTime))
      val streamed = spark.table("w10_join")
        .filter(col("user_id") < 900).collect().map(key).toSet
      val batch = StreamJoins.clickContextFull(
        purchases.toDF("event_id", "user_id", "ts"),
        clicks.toDF("user_id", "ts")).collect().map(key).toSet
      assert(streamed == batch,
        "streaming full-outer and its batch twin diverged")
      // Both unmatched directions present: purchase 102 with null click,
      // and user-3's click (matching no purchase) with null event_id.
      assert(streamed.exists(t => t._1 == 102L && t._4.isEmpty))
      assert(streamed.exists(t => t._1 == -1L && t._2 == 3L))
    } finally q.stop()
  }

  test("session gaps agree with session_window: same island count per user") {
    val sf = "/root/testdata/sf0.001"
    val fromGaps = graft.queries.StreamQueries
      .w11SessionGaps(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromWindows = graft.queries.StreamQueries
      .w2SessionWindow(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.length.toLong }
    assert(fromGaps == fromWindows,
      "the gap-count formulation must equal session_window's island count")
  }

  test("the streaming plan is a stream-stream join with watermarks") {
    implicit val sqlCtx = spark.sqlContext
    val pSrc = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val cSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoins.clickContext(
      pSrc.toDF().toDF("event_id", "user_id", "ts"),
      cSrc.toDF().toDF("user_id", "ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("w5_plan").start()
    try {
      pSrc.addData(purchases: _*); cSrc.addData(clicks: _*)
      q.processAllAvailable()
      val plan = q.lastProgress.sources.length
      assert(plan == 2, "join must read two streaming sources")
      assert(q.lastProgress.stateOperators.nonEmpty,
        "stream-stream join must hold join state")
    } finally q.stop()
  }

  test("stream-static enrichment matches batch and keeps no join state") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, 10), (2L, 20)) // user 3 misses the dimension
      .toDF("c_custkey", "c_nationkey")
    val events = Seq(
      (1L, ts(5)), (1L, ts(20)), (1L, ts(65)), // two in hour 12, one in 13
      (2L, ts(10)),
      (3L, ts(15))) // dropped: no dim row
    val eSrc = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamJoins.enrichedWindowCounts(
      eSrc.toDF().toDF("user_id", "ts"), dim)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("w8_enrich").start()
    try {
      eSrc.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.table("w8_enrich")
        .as[(Long, Int, Long)].collect().toSet
      val batch = StreamJoins.enrichedWindowCounts(
        events.toDF("user_id", "ts"), dim)
        .as[(Long, Int, Long)].collect().toSet
      assert(streamed == batch, "streaming and batch twins diverged")
      val h12 = base.getTime
      val h13 = base.getTime + 3600000L
      assert(streamed == Set((h12, 10, 2L), (h13, 10, 1L), (h12, 20, 1L)))
      // The ONLY stateful operator is the window aggregate — the static
      // side buffers nothing (one state op; a stream-stream join would
      // add its own).
      assert(q.lastProgress.stateOperators.length == 1,
        "static side must not hold join state")
      assert(q.lastProgress.sources.length == 1,
        "exactly one streaming source")
    } finally q.stop()
  }

  test("decontamination tags: streaming equals batch, one tag per doc, across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val eval_ = Seq((100L, "z e1 e2 e3 e4 e5 z2")).toDF("doc_id", "text")
    // Docs 0 and 2 touch the eval 5-gram (doc 2 TWICE — still one tag);
    // doc 1 is clean. Split across two micro-batches to prove the dedup
    // state spans batches.
    val batch1 = Seq(
      (0L, "x1 e1 e2 e3 e4 e5 x2"),
      (1L, "a b c d e f g"))
    val batch2 = Seq(
      (2L, "e1 e2 e3 e4 e5 w e1 e2 e3 e4 e5"),
      (0L, "x1 e1 e2 e3 e4 e5 x2")) // redelivery of doc 0 — no second tag
    val src = MemoryStream[(Long, String)]
    val out = StreamJoins.decontaminationTags(
      src.toDF().toDF("doc_id", "text"), eval_)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("w13_tags").start()
    try {
      src.addData(batch1: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
      val streamed = spark.table("w13_tags").as[Long].collect().sorted.toSeq
      val batch = StreamJoins.decontaminationTags(
        (batch1 ++ batch2).toDF("doc_id", "text"), eval_)
        .as[Long].collect().sorted.toSeq
      assert(streamed == Seq(0L, 2L), s"got $streamed")
      assert(streamed == batch, "streaming and batch twins diverged")
    } finally q.stop()
  }

  test("dynamic-gap session window: streaming equals batch, boundaries pinned") {
    implicit val sqlCtx = spark.sqlContext
    def sessionize(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(session_window(col("ts"),
        when(col("event_type") === "purchase", lit("45 minutes"))
          .otherwise(lit("20 minutes"))), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          col("session_window.start").as("s"),
          col("session_window.end").as("e"), col("n"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getTimestamp(1).getTime, r.getTimestamp(2).getTime,
        r.getLong(3))
    def min(m: Long) = base.getTime + m * 60000L
    def streamed(events: Seq[(Long, String, java.sql.Timestamp)],
        name: String): Set[(Long, Long, Long, Long)] = {
      val src = MemoryStream[(Long, String, java.sql.Timestamp)]
      val q = sessionize(src.toDF().toDF("user_id", "event_type", "ts"))
        .writeStream.outputMode("complete").format("memory")
        .queryName(name).start()
      try {
        src.addData(events: _*)
        q.processAllAvailable()
        assert(q.lastProgress.stateOperators.nonEmpty,
          "streaming session window must hold merge state")
        spark.table(name).collect().map(key).toSet
      } finally q.stop()
    }
    // Parity case (no exact-touch boundaries): click@0 opens [0,20);
    // purchase@15 merges and holds to 60; click@55 merges (55 < 60)
    // extending to 75; click@76 falls past the end — new session.
    // User 2: click@21 past click@0's end (new), purchase@39 merges
    // into the second session and stretches it to 84.
    val events = Seq(
      (1L, "click", ts(0)), (1L, "purchase", ts(15)),
      (1L, "click", ts(55)), (1L, "click", ts(76)),
      (2L, "click", ts(0)), (2L, "click", ts(21)),
      (2L, "purchase", ts(39)))
    val batch = sessionize(
      events.toDF("user_id", "event_type", "ts")).collect().map(key).toSet
    assert(streamed(events, "w12_stream") == batch,
      "streaming dynamic-gap sessions and their batch twin diverged")
    assert(batch == Set(
      (1L, min(0), min(75), 3L), (1L, min(76), min(96), 1L),
      (2L, min(0), min(20), 1L), (2L, min(21), min(84), 2L)))
    // Deliberately NOT pinned: an event at EXACTLY a session's end
    // (start == end, zero overlap). Building this test surfaced that
    // Spark's outcome there is PHYSICAL-LAYOUT-DEPENDENT — from the
    // same batch API in the same JVM, a 7-event dataset split the
    // touching pair while a 2-event dataset (and the streaming state
    // manager) merged it; the local pre-merge and final merge paths
    // disagree on the boundary. A spec must not pin unstable upstream
    // behavior, so the operator's documented contract is: exact-touch
    // behavior is UNSPECIFIED. The w12 gate is unaffected in practice —
    // probed both corpora (sf0.01 and sf1): zero events land on an
    // exact whole-ms session end (same latent class the long-green w2
    // fixed-gap gate carries).
  }

  test("windowed PSI: streaming equals batch, matching window reads zero, shifted window reads hot") {
    implicit val sqlCtx = spark.sqlContext
    val rnd = new scala.util.Random(7)
    // Static reference: 200 uniform draws in [0, 100).
    val refVals = Seq.fill(200)(rnd.nextDouble() * 100.0)
    val reference = refVals.map(v => (ts(0), v)).toDF("ts", "value")
    // Hour 1 re-samples the reference distribution (PSI ≈ 0); hour 2 is
    // shifted hard into [80, 100) (PSI large). Split mid-hour across
    // micro-batches so window state must merge across batches.
    // 600 draws per hour: sampling noise on a 10-bin PSI is ~(k−1)/n
    // per side ≈ 0.03 here, comfortably under the 0.1 calm line.
    val hour1 = (0 until 600).map(i =>
      (ts(i % 60), refVals(rnd.nextInt(refVals.length))))
    val hour2 = (0 until 600).map(i =>
      (ts(60 + i % 60), 80.0 + rnd.nextDouble() * 20.0))
    val all = hour1 ++ hour2
    val (b1, b2) = all.splitAt(750)
    val src = MemoryStream[(java.sql.Timestamp, Double)]
    val out = graft.streaming.Drift.windowedPsi(
      src.toDF().toDF("ts", "value"), reference)
    val q = out.writeStream.outputMode("complete")
      .format("memory").queryName("w14_psi").start()
    try {
      src.addData(b1: _*)
      q.processAllAvailable()
      src.addData(b2: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.nonEmpty,
        "the windowed PSI aggregate must be the one stateful operator")
      val streamed = spark.table("w14_psi")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      val batch = graft.streaming.Drift.windowedPsi(
        all.toDF("ts", "value"), reference)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
      assert(streamed == batch, s"streaming $streamed vs batch $batch")
      assert(streamed.map(_._2) == Seq(600L, 600L))
      val Seq(calm, hot) = streamed.map(_._3)
      // The standard PSI read: < 0.1 stable, > 0.25 action. The
      // re-sampled hour sits well under, the shifted hour far over.
      assert(calm < 0.1, s"re-sampled window should be calm, got $calm")
      assert(hot > 1.0, s"shifted window should scream, got $hot")
    } finally q.stop()
  }
}
