package graft.queries

import graft.scenario.DynamicReplay
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Gate queries for the dynamic-topology scenario replay
  * ([[graft.scenario.DynamicReplay]]) with DuckDB oracles that apply the
  * SAME deterministic mutation schedule via stacked CASE rewrites, then run
  * the same depth-bounded recursive chain — so the interleaved
  * mutate→query→mutate loop is hash-checked end to end, not just its
  * individual operators.
  */
object ScenarioQueries {

  def dynTurnTaking(spark: SparkSession, d: String): DataFrame =
    DynamicReplay.turnTaking(spark, d)

  def dynChainChurn(spark: SparkSession, d: String): DataFrame =
    DynamicReplay.chainChurn(spark, d)

  def dynPartition(spark: SparkSession, d: String): DataFrame =
    DynamicReplay.partitionReconcile(spark, d)

  /** Rewire-mechanic twin of [[dynTurnTaking]] — same schedule through
    * M3 delete+create instead of M2 UPDATE, so it shares the oracle: hash
    * equality proves both mutation styles produce the same post-state.
    */
  def dynRewire(spark: SparkSession, d: String): DataFrame =
    DynamicReplay.rewireReplay(spark, d)

  // ── Oracle SQL generators (mirror DynamicReplay's constants) ──────────

  private val fanout = DynamicReplay.DefaultFanout
  private val modulo = DynamicReplay.DefaultModulo

  /** The deterministic delegation forest over customer keys. */
  private val baseCte =
    s"""base AS (
       |  SELECT c_custkey AS drone_id,
       |    CASE WHEN c_custkey < $fanout THEN 'HQ'
       |         ELSE CAST(c_custkey - $fanout AS VARCHAR) END AS hq_id
       |  FROM customer)""".stripMargin

  /** Snapshot after cumulative turn-taking steps 1..t. */
  private def delCte(name: String, t: Int) =
    s"""$name AS (
       |  SELECT drone_id,
       |    CASE WHEN drone_id % $modulo BETWEEN 1 AND $t THEN 'HQ'
       |         ELSE hq_id END AS hq_id
       |  FROM base)""".stripMargin

  /** Depth-bounded recursive chain over one snapshot CTE. */
  private def chainCte(name: String, del: String, depth: Int,
      root: String = "HQ") =
    s"""$name(drone_id, lvl) AS (
       |  SELECT drone_id, 1 FROM $del WHERE hq_id = '$root'
       |  UNION ALL
       |  SELECT d.drone_id, c.lvl + 1 FROM $del d JOIN $name c
       |    ON d.hq_id = CAST(c.drone_id AS VARCHAR)
       |  WHERE c.lvl < $depth)""".stripMargin

  private def stepsOracle(depths: Seq[Int]): String = {
    val dels = depths.indices.map(i => delCte(s"del${i + 1}", i + 1))
    val chains = depths.zipWithIndex.map { case (depth, i) =>
      chainCte(s"chain${i + 1}", s"del${i + 1}", depth)
    }
    val selects = depths.zipWithIndex.map { case (depth, i) =>
      s"SELECT ${i + 1} AS step, $depth AS depth, count(*) AS n FROM chain${i + 1}"
    }
    s"""WITH RECURSIVE
       |$baseCte,
       |${(dels ++ chains).mkString(",\n")}
       |${selects.mkString("\nUNION ALL ")}
       |ORDER BY step""".stripMargin
  }

  private def partitionOracle(depth: Int): String = {
    val boundary = fanout / 2
    val splitCte =
      s"""split AS (
         |  SELECT drone_id,
         |    CASE WHEN drone_id < $boundary THEN 'HQA'
         |         WHEN drone_id < $fanout THEN 'HQB'
         |         ELSE hq_id END AS hq_id
         |  FROM base)""".stripMargin
    s"""WITH RECURSIVE
       |$baseCte,
       |$splitCte,
       |${chainCte("chain_a", "split", depth, "HQA")},
       |${chainCte("chain_b", "split", depth, "HQB")},
       |${chainCte("chain_r", "base", depth, "HQ")}
       |SELECT 'split_a' AS phase, $depth AS depth, count(*) AS n FROM chain_a
       |UNION ALL SELECT 'split_b', $depth, count(*) FROM chain_b
       |UNION ALL SELECT 'reconciled', $depth, count(*) FROM chain_r
       |ORDER BY phase""".stripMargin
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dyn_turn_taking" -> dynTurnTaking,
    "dyn_chain_churn" -> dynChainChurn,
    "dyn_partition" -> dynPartition,
    "dyn_rewire" -> dynRewire)

  val oracles: Map[String, String] = Map(
    "dyn_turn_taking" -> stepsOracle(DynamicReplay.DefaultDepths),
    "dyn_chain_churn" -> stepsOracle(DynamicReplay.DefaultCycle),
    "dyn_partition" -> partitionOracle(8),
    "dyn_rewire" -> stepsOracle(DynamicReplay.DefaultDepths))
}
