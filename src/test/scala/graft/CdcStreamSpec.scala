package graft

import graft.functions.Debezium
import graft.streaming.CdcStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end Structured Streaming CDC tests, mirroring the reference's
  * canonical sequences: the c→u→d sequence for one key leaves the target
  * empty (07_test_kafka_producer.py:44-71 + 06_postgres_cdc_sink.py:32-64).
  */
class CdcStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def env(op: String, id: Long, name: String, tsMs: Long): String = {
    val before = if (op == "c") "null" else s"""{"id":$id,"name":"old"}"""
    val after = if (op == "d") "null" else s"""{"id":$id,"name":"$name"}"""
    s"""{"payload":{"before":$before,"after":$after,"op":"$op","ts_ms":$tsMs,
       |"source":{"connector":"graft","db":"graftdb","table":"users"}}}"""
      .stripMargin.replace("\n", "")
  }

  test("canonical c->u->d sequence leaves the key absent; others persist") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val parsed = CdcStream.parse(source.toDF().withColumnRenamed("value", "value"))
    val state = new CdcStream.SnapshotHandle(spark)
    val q = CdcStream.start(parsed, state)

    source.addData(env("c", 1, "alice", 100), env("c", 2, "bob", 101))
    q.processAllAvailable()
    assert(state.snapshot.count() == 2)

    source.addData(env("u", 1, "alice2", 200))
    q.processAllAvailable()
    val afterU = state.snapshot.as[(Long, String)].collect().toMap
    assert(afterU(1L) == "alice2" && afterU(2L) == "bob")

    source.addData(env("d", 1, "", 300))
    q.processAllAvailable()
    q.stop()
    val fin = state.snapshot.as[(Long, String)].collect().toMap
    assert(fin == Map(2L -> "bob"), "c->u->d leaves only the untouched key")
  }

  test("within-batch ordering: last writer wins by ts_ms") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val state = new CdcStream.SnapshotHandle(spark)
    val q = CdcStream.start(CdcStream.parse(source.toDF()), state)
    // One micro-batch containing create+update+update for the same key.
    source.addData(env("c", 7, "v1", 100), env("u", 7, "v3", 300),
      env("u", 7, "v2", 200))
    q.processAllAvailable()
    q.stop()
    val fin = state.snapshot.as[(Long, String)].collect().toMap
    assert(fin == Map(7L -> "v3"))
  }

  test("idempotent replay: reprocessing the same batch is a no-op") {
    import spark.implicits._
    val batch = CdcStream.parse(
      Seq(env("c", 1, "a", 100), env("u", 1, "b", 200)).toDF("value"))
    val once = CdcStream.mergeCdcBatch(
      Seq((9L, "keep")).toDF("id", "name"), batch)
    val twice = CdcStream.mergeCdcBatch(once, batch)
    assert(once.orderBy("id").collect().sameElements(twice.orderBy("id").collect()))
  }

  test("debezium parse round-trips the envelope builder") {
    import spark.implicits._
    val df = Seq((1L, "x", 123L)).toDF("id", "name", "ms")
      .select(Debezium.envelope(Debezium.nullRow,
        struct(col("id"), col("name")), lit("c"), col("ms"), "users").as("value"))
    val flat = CdcStream.parse(df).as[(String, Long, Long, String)].collect()
    assert(flat.toSeq == Seq(("c", 123L, 1L, "x")))
  }

  test("replay stats batch the backlog in id order") {
    import spark.implicits._
    val buffer = (1L to 1050L).map(i => (i, s"p$i")).toDF("id", "payload")
    val stats = CdcStream.replayStats(buffer, 500)
      .as[(Long, Long, Long, Long)].collect()
    assert(stats.length == 3)
    assert(stats(0) == (0L, 500L, 1L, 500L))
    assert(stats(2) == (2L, 50L, 1001L, 1050L))
  }

  test("windowed throughput aggregates op counts in event-time windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val agg = CdcStream.windowedThroughput(CdcStream.parse(source.toDF()), 5)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("thr").start()
    source.addData(env("c", 1, "a", 1000), env("c", 2, "b", 2000),
      env("u", 1, "c", 7000))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("thr")
      .select(col("op"), col("n")).as[(String, Long)].collect().toMap
    assert(rows == Map("c" -> 2L, "u" -> 1L))
    spark.sql("DROP TABLE IF EXISTS thr")
  }

  test("stateful dedup drops replayed events across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[String]
    val deduped = CdcStream.statefulDedup(CdcStream.parse(source.toDF()))
    val q = deduped.toDF("op", "ts_ms", "id", "name").writeStream
      .outputMode("append").format("memory").queryName("dedup").start()
    source.addData(env("c", 1, "a", 100), env("u", 1, "b", 200))
    q.processAllAvailable()
    // Replay the same events (at-least-once source) plus one genuinely new.
    source.addData(env("c", 1, "a", 100), env("u", 1, "b", 200),
      env("u", 1, "c", 300))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("dedup").as[(String, Long, Long, String)]
      .collect().sortBy(_._2)
    assert(rows.map(_._2).toSeq == Seq(100L, 200L, 300L),
      s"replayed ts must be dropped, got: ${rows.toSeq}")
    spark.sql("DROP TABLE IF EXISTS dedup")
  }

  test("checkpoint recovery: crash mid-stream, restart redelivers the failed batch, merge converges exactly-once") {
    // The HARD half of the s6_checkpoint_resume gate (which stops
    // gracefully between batches): here the query CRASHES inside batch 2
    // — after the source committed its offset plan but before the batch's
    // work completed — and the checkpoint restart must REDELIVER that
    // batch (no loss) while the first incarnation's committed batches are
    // not re-merged (no duplication visible through the idempotent keyed
    // merge). MemoryStream is not fault-tolerant across restarts, so the
    // source is a real file source, the thing production runs.
    val base = new java.io.File(
      s"target/spec_ckpt_${System.nanoTime()}")
    val watch = new java.io.File(base, "in")
    watch.mkdirs()
    val ckpt = new java.io.File(base, "ckpt").getPath
    (0 until 4).foreach { i =>
      val f = new java.io.File(watch, s"b$i.txt")
      java.nio.file.Files.writeString(f.toPath,
        env("c", i * 10L, s"n$i", 1000L + i) + "\n" +
          env("c", i * 10L + 1, s"m$i", 2000L + i) + "\n")
    }
    val state = new CdcStream.SnapshotHandle(spark)
    @volatile var crashed = false
    def startQ() = CdcStream.parse(
        spark.readStream.option("maxFilesPerTrigger", 1).text(watch.getPath))
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        // Crash BEFORE any merge work on the batch's second delivery
        // target: the restart must re-run this batch id with the same
        // data or the events in file b2 are lost.
        if (!crashed && id == 2) {
          crashed = true
          throw new RuntimeException("injected crash")
        }
        state.set(CdcStream.mergeCdcBatch(state.get(batch.sparkSession), batch))
      }.start()
    val q1 = startQ()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(failed.getMessage.contains("injected crash") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected crash")))
    assert(crashed)
    val q2 = startQ() // same checkpoint: resume at batch 2, not batch 0
    q2.processAllAvailable()
    q2.stop()
    val got = state.snapshot.select(col("id"), col("name"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = (0 until 4).flatMap(i =>
      Seq(i * 10L -> s"n$i", i * 10L + 1 -> s"m$i")).toMap
    assert(got == want,
      s"post-recovery snapshot must hold every event exactly once: $got")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(base)
  }

  test("latency segments are non-negative and ordered") {
    import spark.implicits._
    val parsed = CdcStream.parse(
      Seq(env("c", 1, "a", System.currentTimeMillis() - 50)).toDF("value"))
      .withColumn("broker_ts_ms", col("ts_ms") + 10)
    val r = CdcStream.latencySegments(parsed)
      .select("lat_capture_to_broker", "lat_broker_to_apply", "lat_e2e")
      .head()
    assert(r.getLong(0) == 10)
    assert(r.getLong(1) >= 0)
    assert(r.getLong(2) >= r.getLong(0))
  }

  test("rate limiter: streaming micro-batches == batch fold; state carries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Per-key events at 0,30,61,150,600s; rate 1 token/60s, burst 2.
    // Expected per key: t0 admit (tok 2->1), t30 admit (1.5->0.5),
    // t61 reject (~1.0167... wait: 0.5+31/60=1.0167 -> admit!), so
    // compute via the operator's own batch mode and just assert
    // streaming equivalence + a hand-checked prefix.
    def ev(k: Long, s: Long, id: Long) = (k, s * 1000000L, id)
    val all = Seq(ev(1, 0, 1), ev(1, 30, 2), ev(1, 61, 3), ev(1, 150, 4),
      ev(1, 600, 5), ev(2, 0, 6), ev(2, 1, 7), ev(2, 2, 8), ev(2, 3, 9))
    val batch = graft.streaming.RateLimiter
      .admit(all.toDF("k", "t", "i"), ratePerSec = 1.0 / 60.0, burst = 2.0)
      .collect().toSet
    // Hand check key 2: burst 2 admits ids 6,7 (refill negligible),
    // then 8,9 rejected.
    assert(batch.filter(_._1 == 2L).map(_._2) == Set(6L, 7L))

    val source = MemoryStream[(Long, Long, Long)]
    val admitted = graft.streaming.RateLimiter
      .admit(source.toDF(), ratePerSec = 1.0 / 60.0, burst = 2.0)
    val q = admitted.writeStream.format("memory")
      .queryName("rl_out").outputMode("append").start()
    // ts-ordered micro-batches split MID-KEY so state must carry.
    source.addData(all.filter(_._2 <= 30000000L): _*)
    q.processAllAvailable()
    source.addData(all.filter(_._2 > 30000000L): _*)
    q.processAllAvailable()
    val streamed = spark.table("rl_out").as[(Long, Long)].collect().toSet
    q.stop()
    assert(streamed == batch,
      s"streaming $streamed must equal batch $batch across batch splits")
  }
}
