package graft

import graft.functions.JsonCanon
import graft.functions.JsonCanon._

/** Typed benchmark/workload configuration (SURVEY.md §2.1 S8) — the Spark
  * twin of the reference's JSON-file config loader
  * (demo_did_graph/common/load_config.py:20-69): node counts, scale-up
  * list, traversal depths, iteration counts, mutation chunk size, seed.
  * Parsed with the engine's own JSON parser; unknown keys are ignored,
  * missing keys take the reference's defaults (load_config.py:56-67).
  */
final case class GraftConfig(
    headquartersId: String = "HQ1",
    scaleUpNodes: Seq[Int] = Seq(100, 500, 1000),
    depths: Seq[Int] = Seq(2, 4, 6, 8),
    iterations: Int = 100,
    chunkSize: Int = 500,
    randomSeed: Long = 42L,
    // CDC transport (reference: demo_sqlite_cdc/01_unit_test/
    // 07_test_kafka_producer.py:39-41 — KAFKA_BOOTSTRAP/TOPIC env pair).
    // "kafka" reads/writes the broker; "file" tails a directory of
    // envelope lines; "memory" is the in-process test source.
    cdcSource: String = "memory",
    kafkaBootstrap: String = "localhost:9092",
    kafkaTopic: String = "cdc-events",
    cdcSourcePath: String = "",
    // 0 = process all available files per micro-batch; >0 bounds each
    // micro-batch (the file-source twin of Kafka's maxOffsetsPerTrigger).
    cdcMaxFilesPerTrigger: Int = 0)

object GraftConfig {

  def parse(json: String): GraftConfig = {
    val JObj(fields) = JsonCanon.parse(json): @unchecked
    val m = fields.toMap
    def ints(k: String, d: Seq[Int]) = m.get(k) match {
      case Some(JArr(xs)) => xs.collect { case JInt(n) => n.toInt }
      case _ => d
    }
    def int(k: String, d: Int) = m.get(k) match {
      case Some(JInt(n)) => n.toInt
      case _ => d
    }
    def str(k: String, d: String) = m.get(k) match {
      case Some(JStr(s)) => s
      case _ => d
    }
    GraftConfig(
      headquartersId = str("headquarters_id", "HQ1"),
      scaleUpNodes = ints("scale_up_nodes", Seq(100, 500, 1000)),
      depths = ints("depths", Seq(2, 4, 6, 8)),
      iterations = int("iterations", 100),
      chunkSize = int("chunk_size", 500),
      randomSeed = int("random_seed", 42).toLong,
      cdcSource = str("cdc_source", "memory"),
      kafkaBootstrap = str("kafka_bootstrap", "localhost:9092"),
      kafkaTopic = str("kafka_topic", "cdc-events"),
      cdcSourcePath = str("cdc_source_path", ""),
      cdcMaxFilesPerTrigger = int("cdc_max_files_per_trigger", 0))
  }

  def load(path: String): GraftConfig =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))
}
