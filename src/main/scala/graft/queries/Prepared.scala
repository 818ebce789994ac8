package graft.queries

import graft.graph.GraphData
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parameterized prepared-query surface (reference:
  * demo_did_graph/05_abac/benchmark_scenario_b.py:264-299 — a recursive
  * CTE prepared once with `%(client)s` / `%(length)s` / `%(anchor)s`
  * placeholders, then executed per binding inside the benchmark loop).
  *
  * Spark-native twin: `spark.sql(text, args)` named-parameter binding.
  * Values bind as literals (injection-safe, like the psycopg parameter
  * dict — never string interpolation), the statement text is stable across
  * bindings so repeated executions hit the session's parse/plan cache, and
  * the recursion depth bound rides as a parameter exactly like the
  * reference's `%(length)s`.
  */
object Prepared {

  /** A prepared statement closed over a session: `bind` executes with a
    * fresh parameter map.
    */
  final case class PreparedQuery(spark: SparkSession, sql: String) {
    def bind(args: Map[String, Any]): DataFrame = spark.sql(sql, args)
  }

  /** The reference's parameterized WoT reachability count: how many trust
    * paths from `:client` reach `:anchor` within `:length` hops (native
    * recursive CTE — Spark 4.x; same bag semantics as
    * [[graft.graph.Traverse.expand]], seeded at the client's children).
    */
  def wotPathCount(spark: SparkSession, sfDir: String): PreparedQuery = {
    // Materialized (NOT merely cached) behind the view: UnionLoop's
    // per-step re-plan bypasses cache substitution, so a .cache() here
    // is silently ignored and every binding re-pays the customer
    // self-join per recursion level — the Traverse.materializeForRcte
    // scaladoc and PLANS.md carry the plan-dump evidence. The checkpoint
    // is memoized per content key, which is exactly the prepared-
    // statement contract: prepare once, bind many.
    graft.graph.Traverse.materializeForRcte(
        GraphData.trustChain(spark, sfDir))
      .createOrReplaceTempView("web_trust")
    PreparedQuery(spark,
      """WITH RECURSIVE path(node, lvl) AS (
        |  SELECT child, 1 FROM web_trust WHERE parent = :client
        |  UNION ALL
        |  SELECT /*+ BROADCAST(p) */ w.child, p.lvl + 1 FROM path p
        |  JOIN web_trust w ON w.parent = p.node
        |  WHERE p.lvl < :length
        |) SELECT count(*) AS n_paths FROM path WHERE node = :anchor""".stripMargin)
  }
}
