package graft

import graft.streaming.CdcStream
import org.scalatest.funsuite.AnyFunSuite

/** Transport wiring for the CDC pipeline: the config-selected source must
  * reach the real `format("kafka")` reader when configured (provable even
  * broker-less: Spark names the missing connector, which means the branch
  * was genuinely taken), and the file fallback must drive the full
  * parse→merge pipeline with identical downstream semantics.
  */
class KafkaWiringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def env(op: String, id: Long, name: String, tsMs: Long): String = {
    val before = if (op == "c") "null" else s"""{"id":$id,"name":"old"}"""
    val after = if (op == "d") "null" else s"""{"id":$id,"name":"$name"}"""
    s"""{"payload":{"before":$before,"after":$after,"op":"$op","ts_ms":$tsMs,
       |"source":{"connector":"graft","db":"graftdb","table":"users"}}}"""
      .stripMargin.replace("\n", "")
  }

  test("config parses the CDC transport block with reference defaults") {
    val cfg = GraftConfig.parse(
      """{"cdc_source":"kafka","kafka_bootstrap":"broker1:9092,broker2:9092",
        |"kafka_topic":"sqlite-cdc"}""".stripMargin)
    assert(cfg.cdcSource == "kafka")
    assert(cfg.kafkaBootstrap == "broker1:9092,broker2:9092")
    assert(cfg.kafkaTopic == "sqlite-cdc")
    assert(GraftConfig.parse("{}").cdcSource == "memory")
  }

  test("kafka branch invokes the kafka data source") {
    // The sandbox ships no spark-sql-kafka connector, so reaching the real
    // reader surfaces as DATA_SOURCE_NOT_FOUND naming "kafka" — which is
    // exactly the proof the config-switched path builds a kafka scan and
    // not a silent fallback. With the connector on the classpath the same
    // call returns the streaming DataFrame.
    val cfg = GraftConfig.parse("""{"cdc_source":"kafka"}""")
    val e = intercept[Exception] { CdcStream.source(spark, cfg) }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("kafka sink invokes the kafka data source") {
    import spark.implicits._
    val envelopes = Seq(env("c", 1, "alpha", 100)).toDF("value")
    val e = intercept[Exception] {
      // Batch DF lacks writeStream; route through a memory-less check of
      // the writer format instead: format resolution happens on start.
      CdcStream.toKafka(
        spark.readStream.format("rate").load()
          .selectExpr("CAST(value AS STRING) AS value"),
        "localhost:9092", "sqlite-cdc",
        java.nio.file.Files.createTempDirectory("ckpt").toString)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
    assert(envelopes.count() == 1)
  }

  test("file source drives the full parse->merge pipeline") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_files")
    java.nio.file.Files.write(dir.resolve("batch0.txt"),
      (Seq(env("c", 1, "alice", 100), env("c", 2, "bob", 101),
        env("u", 1, "alice2", 200), env("d", 2, "", 300))
        .mkString("\n") + "\n").getBytes("UTF-8"))
    val cfg = GraftConfig.parse(
      s"""{"cdc_source":"file","cdc_source_path":"$dir"}""")
    val parsed = CdcStream.parse(CdcStream.source(spark, cfg))
    val state = new CdcStream.SnapshotHandle(spark)
    val q = CdcStream.start(parsed, state)
    q.processAllAvailable()
    q.stop()
    import spark.implicits._
    val fin = state.snapshot.as[(Long, String)].collect().toMap
    assert(fin == Map(1L -> "alice2"), "upsert applied, delete applied")
  }
}
