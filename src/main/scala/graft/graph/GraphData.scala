package graft.graph

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph encodings of the driver test tables, mirroring the reference's
  * fixture shapes (see /root/repo/FIXTURES.md) over the TPC-H-ish star
  * schema so every traversal query has a DuckDB-SQL oracle on the same
  * parquet inputs.
  *
  * - Command hierarchy (F1): the natural FK chain
  *   `region -> nation -> customer -> orders -> lineitem` plays the role of
  *   `HQ -> Regional -> Unit -> Squad -> Drone` (reference DDL:
  *   demo_did_graph/01_multi_layer/setup_scenario_a.py:51-63). Node ids are
  *   prefixed (`R0`, `N3`, `C42`, `O7`, `L7_1`) so keys from different
  *   tables never collide.
  * - Web-of-trust chain (F6): a linear chain over customers
  *   (`E<k> -> E<k+1>`), like the reference's linear entity chain
  *   (demo_did_graph/04_web_of_trust/setup_scenario_a.py:85-90).
  * - ABAC (F7): users = customers, groups = nations (membership via
  *   `c_nationkey`), linear subgroup chain over groups, permissions granted
  *   on the top group only (demo_did_graph/04_web_of_trust/setup_scenario_a.py:94-121).
  *
  * Scale design: every builder is a pure projection/union over the base
  * scans — no shuffle, no collect. The prefixed-id concat columns are
  * codegen'd string exprs; at 100 TB these edge sets would be written once
  * as parquet bucketed by `parent` so the per-level traversal joins
  * (Traverse.expand) co-locate without reshuffling the edge side.
  */
object GraphData {

  private def pid(prefix: String, c: org.apache.spark.sql.Column) =
    concat(lit(prefix), c.cast("string"))

  /** 4-level hierarchy edges: (parent, child, child_type). */
  def hierarchyEdges(spark: SparkSession, sfDir: String): DataFrame = {
    val nation = Tables.nation(spark, sfDir)
    val customer = Tables.customer(spark, sfDir)
    val orders = Tables.orders(spark, sfDir)
    val lineitem = Tables.lineitem(spark, sfDir)
    nation.select(
        pid("R", col("n_regionkey")).as("parent"),
        pid("N", col("n_nationkey")).as("child"),
        lit("Nation").as("child_type"))
      .union(customer.select(
        pid("N", col("c_nationkey")).as("parent"),
        pid("C", col("c_custkey")).as("child"),
        lit("Customer").as("child_type")))
      .union(orders.select(
        pid("C", col("o_custkey")).as("parent"),
        pid("O", col("o_orderkey")).as("child"),
        lit("Order").as("child_type")))
      .union(lineitem.select(
        pid("O", col("l_orderkey")).as("parent"),
        concat(lit("L"), col("l_orderkey").cast("string"),
               lit("_"), col("l_linenumber").cast("string")).as("child"),
        lit("Line").as("child_type")))
  }

  /** Linear trust chain over customers: E<k> -> E<k+1> (exists iff both
    * endpoints exist — expressed as a self-join so no max() subquery is
    * needed and the SQL oracle is identical).
    */
  def trustChain(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.customer(spark, sfDir)
    val a = c.select(col("c_custkey").as("k"))
    val b = c.select(col("c_custkey").as("k2"))
    a.join(b, col("k2") === col("k") + 1)
      .select(pid("E", col("k")).as("parent"), pid("E", col("k2")).as("child"))
  }

  /** ABAC membership edges: user C<custkey> -> group G<nationkey>. */
  def abacMember(spark: SparkSession, sfDir: String): DataFrame =
    Tables.customer(spark, sfDir).select(
      pid("C", col("c_custkey")).as("user_id"),
      pid("G", col("c_nationkey")).as("group_id"))

  /** ABAC subgroup edges: linear chain G<k> -> G<k+1> over nations. */
  def abacSubgroup(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val a = n.select(col("n_nationkey").as("k"))
    val b = n.select(col("n_nationkey").as("k2"))
    a.join(b, col("k2") === col("k") + 1)
      .select(pid("G", col("k")).as("parent"), pid("G", col("k2")).as("child"))
  }

  /** Permission rows: only the top group (max nation key) may access each
    * resource RES<regionkey> — like the reference granting perms on the top
    * group of the subgroup chain.
    */
  def abacPermission(spark: SparkSession, sfDir: String): DataFrame = {
    val n = Tables.nation(spark, sfDir)
    val top = n.agg(max(col("n_nationkey")).as("topk"))
    Tables.region(spark, sfDir)
      .crossJoin(top)
      .select(pid("G", col("topk")).as("group_id"),
              pid("RES", col("r_regionkey")).as("resource_id"))
  }
}
