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
    * fresh parameter map. `validate` runs against every binding BEFORE
    * execution — driver-side, so it fires even under plans where column
    * pruning would eliminate an in-SQL guard expression (a bare
    * `.count()` prunes unused projections, raise_error included).
    */
  final case class PreparedQuery(spark: SparkSession, sql: String,
      validate: Map[String, Any] => Unit = _ => ()) {
    def bind(args: Map[String, Any]): DataFrame = {
      validate(args)
      spark.sql(sql, args)
    }
  }

  /** The reference's parameterized WoT reachability count: how many trust
    * paths from `:client` reach `:anchor` within `:length` hops.
    *
    * Prepare-time heavy lifting, bind-time point probe: preparation
    * materializes the ≤`maxDepth`-hop bag closure of the trust graph
    * ([[graft.graph.Closure.closureAuto]] — memoized per content key, so
    * re-preparing the same graph is a cache hit), and each bind is a
    * three-predicate filter + sum over the cached artifact. This is what
    * a prepared statement IS — the reference's psycopg PREPARE parses and
    * plans once so EXECUTE is cheap — where the previous rCTE body
    * re-paid the UnionLoop's per-step job scheduling on every bind
    * (~1.9 s on a 20-step one-row-frontier chain; measured in PLANS.md).
    * Bind stays the named-parameter protocol (`spark.sql(text, args)`,
    * literal-bound, injection-safe) exactly like the reference's
    * parameter dict.
    *
    * A bind with `:length > maxDepth` raises (the closure only covers
    * `maxDepth` hops — silently undercounting is the one wrong answer).
    * Falls back to the native recursive CTE when the graph exceeds the
    * distributed-closure cap (then it is a fact table, not a dimension).
    */
  def wotPathCount(spark: SparkSession, sfDir: String,
      maxDepth: Int = 20): PreparedQuery =
    graft.graph.Closure.closureAuto(
        GraphData.trustChain(spark, sfDir), maxDepth) match {
      case Some(closure) =>
        closure.createOrReplaceTempView("wot_closure")
        PreparedQuery(spark,
          s"""SELECT cast(coalesce(sum(n_paths), 0) as bigint) AS n_paths
             |FROM wot_closure
             |WHERE src = :client AND dst = :anchor AND lvl <= :length""".stripMargin,
          validate = args => args.get("length").foreach {
            case n: Int => require(n <= maxDepth,
              s"bind length $n exceeds prepared maxDepth $maxDepth")
            case n: Long => require(n <= maxDepth,
              s"bind length $n exceeds prepared maxDepth $maxDepth")
            case _ => ()
          })
      case None => wotPathCountRcte(spark, sfDir)
    }

  /** Native recursive-CTE form — the fallback when the graph is too large
    * to materialize a closure, and the surface that exercises Spark's
    * UnionLoop bind protocol directly (kept under test; the
    * r1_chain_levels_rcte gate pins the same executor).
    */
  def wotPathCountRcte(spark: SparkSession, sfDir: String): PreparedQuery = {
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
