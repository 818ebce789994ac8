package graft.queries

import graft.Tables
import graft.state.Snapshot
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mutation-operator family (SURVEY.md §2.8) exercised as snapshot rewrites
  * over the driver test tables, plus the remaining small relational ops
  * (P8 cast predicate, P9 JSON cross-field check, M6 bulk generator).
  *
  * The "delegation" snapshot analog is `customer`: drone_id = c_custkey,
  * hq_id = 'N' || c_nationkey (FIXTURES.md F2).
  */
object MutQueries {

  private def delegation(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d).select(
      col("c_custkey").as("drone_id"),
      concat(lit("N"), col("c_nationkey").cast("string")).as("hq_id"))

  /** M1: keyed upsert — rewire every 10th drone to N0, insert one new
    * drone id -1 (reference: INSERT ... ON CONFLICT DO UPDATE,
    * demo_did_graph/02_topology_dynamic/setup_scenario_a.py:64-71).
    */
  def m1Upsert(spark: SparkSession, d: String): DataFrame = {
    val snap = delegation(spark, d)
    val updates = snap.filter(col("drone_id") % 10 === 0)
      .select(col("drone_id"), lit("N0").as("hq_id"))
      .union(spark.range(1).select(lit(-1L).as("drone_id"), lit("N99").as("hq_id")))
    Snapshot.upsert(snap, updates, Seq("drone_id")).orderBy(col("drone_id"))
  }

  /** M2: batched UPDATE — `UPDATE delegation SET hq_id='N1' WHERE drone_id
    * = ANY(batch)` (reference: demo_did_graph/03_equalization/
    * benchmark_scenario_a.py:62-69; batch = ids ending in 3).
    */
  def m2UpdateWhere(spark: SparkSession, d: String): DataFrame =
    Snapshot.updateWhere(delegation(spark, d),
        col("drone_id") % 10 === 3, Map("hq_id" -> lit("N1")))
      .orderBy(col("drone_id"))

  /** M3: edge rewire — DELETE all DELEGATES edges into the batch of drones
    * (orders with key % 100 == 7), CREATE edges from the new parent C0
    * (reference: demo_did_graph/02_topology_dynamic/benchmark_scenario_c.py:50-65).
    * Output: the post-rewire edge rows for the affected children.
    */
  def m3Rewire(spark: SparkSession, d: String): DataFrame = {
    val edges = Tables.orders(spark, d).select(
      concat(lit("C"), col("o_custkey").cast("string")).as("parent"),
      concat(lit("O"), col("o_orderkey").cast("string")).as("child"))
    val batch = Tables.orders(spark, d)
      .filter(col("o_orderkey") % 100 === 7)
      .select(concat(lit("O"), col("o_orderkey").cast("string")).as("child"))
    val newEdges = batch.select(lit("C0").as("parent"), col("child"))
    Snapshot.rewire(edges, batch, newEdges)
      .join(batch, Seq("child"), "left_semi")
      .orderBy(col("child"))
      .select(col("parent"), col("child"))
  }

  /** M4: DELETE by key set (reference: DELETE FROM delegation WHERE
    * drone_id = ANY(%s), demo_did_graph/05_abac/benchmark_scenario_a.py:74-80).
    */
  def m4Delete(spark: SparkSession, d: String): DataFrame =
    Snapshot.delete(delegation(spark, d), col("drone_id") % 7 === 0)
      .orderBy(col("drone_id"))

  /** M6: deterministic bulk hierarchy generator — the reference's id
    * grammar `R%03d / U%04d` with round-robin parent assignment
    * (demo_did_graph/01_multi_layer/setup_scenario_a.py:87-121), as a pure
    * `spark.range` + column exprs generator: no input, no shuffle.
    */
  def m6Generate(spark: SparkSession, d: String): DataFrame =
    spark.range(0, 200).select(
      format_string("U%04d", col("id")).as("child_id"),
      format_string("R%03d", pmod(col("id"), lit(5))).as("parent_id"),
      lit("Unit").as("child_type"))
      .orderBy(col("child_id"))

  /** M8: CDC apply — keyed last-writer-wins merge. The events table plays
    * the change log: signup ⇒ c, error ⇒ d, anything else ⇒ u; final state
    * per user = latest event, deleted users absent
    * (reference: demo_sqlite_cdc/01_unit_test/06_postgres_cdc_sink.py:32-64).
    */
  def m8CdcApply(spark: SparkSession, d: String): DataFrame = {
    val ops = Tables.events(spark, d).withColumn("op",
      when(col("event_type") === "error", "d")
        .when(col("event_type") === "signup", "c")
        .otherwise("u"))
    Snapshot.applyCdc(ops, Seq("user_id"),
        Seq(col("ts"), col("event_id")))
      .select(col("user_id"), col("op").as("last_op"), col("value"))
      .orderBy(col("user_id"))
  }

  /** P8: type cast inside a predicate (reference: `c.drone_id::TEXT`,
    * demo_did_graph/common/bench_utils.py:29).
    */
  def p8CastPredicate(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .filter(col("c_custkey").cast("string").like("%7"))
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** P9: cross-field structural check after JSON parse (reference:
    * issuer/subject equality on parsed VC JSON,
    * demo_did_graph/scripts/traversal_verify.py:83-86,130-137). Parses the
    * `props` JSON payload schema-on-read and filters on the extracted field.
    */
  def p9JsonField(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .withColumn("k", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k"))
      .filter(col("k") > 80)
      .select(col("event_id"), col("k"))
      .orderBy(col("event_id"))

  /** M10: incremental aggregate maintenance
    * ([[graft.operators.AggMerge]]) — the per-user (count, sum) view
    * updated from partial aggregates only: base aggregate + insert-batch
    * aggregate + retraction of the deleted rows' aggregate, merged in one
    * union+sum shuffle. The oracle recomputes the final state from
    * scratch, so hash equality IS the incremental-maintenance contract
    * (delta-merge ≡ recompute) — at 100 TB the merge touches only the
    * delta and the k-row aggregate, never the base data. Sums ride
    * DECIMAL so retraction is exact (float retraction drifts).
    */
  def m10AggMerge(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))
    val e = Tables.events(spark, d)
    def aggOf(df: DataFrame): DataFrame = df.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(dec(col("value"))).as("sum_value"))
    val base = e.filter(col("event_id") % 5 =!= 0)
    val inserts = e.filter(col("event_id") % 5 === 0)
    val deletes = base.filter(col("event_type") === "error")
    graft.operators.AggMerge.merge(
        Seq(aggOf(base), aggOf(inserts),
          graft.operators.AggMerge.retract(aggOf(deletes), Seq("user_id"))),
        Seq("user_id"), countCol = "n")
      .select(col("user_id"), col("n"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("user_id"))
  }

  /** M12: incremental maintenance of a JOIN view — the m10 pattern
    * extended through a dimension join, the shape every materialized
    * "fact ⋈ dim → rollup" view needs under CDC. The view is
    * orders ⋈ customer grouped by segment; a deterministic slice of
    * orders plays the arriving delta. Maintenance computes
    * agg(Δorders ⋈ customer) — the DELTA join, |Δ| × broadcast-dim
    * work, never a rescan of the base fact — and merges it into the
    * base aggregate with [[graft.operators.AggMerge.merge]]. The
    * oracle full-recomputes over ALL orders: hash equality IS the
    * delta-join algebra (Δ(A⋈B) = ΔA⋈B when only A changed).
    */
  def m12JoinDelta(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(18, 2))
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    def viewOf(orders: DataFrame): DataFrame = orders
      .join(c, orders("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(dec(col("o_totalprice"))).as("rev"))
    val base = o.filter(col("o_orderkey") % 97 =!= 0)
    val delta = o.filter(col("o_orderkey") % 97 === 0)
    graft.operators.AggMerge.merge(
        Seq(viewOf(base), viewOf(delta)),
        Seq("c_mktsegment"), countCol = "n")
      .select(col("c_mktsegment"), col("n"),
        col("rev").cast("double").as("rev"))
      .orderBy(col("c_mktsegment"))
  }

  /** M13: full three-clause MERGE over the delegation snapshot
    * ([[Snapshot.merge]]): the change batch updates every third drone to a
    * new command `M<k%5>`, except batch rows landing on `M0` (k%15==0)
    * which are matched DELETEs, plus three brand-new drones (`+1000000`
    * keys) that take the INSERT clause. The oracle recomputes the merged
    * state as the three disjoint clause outputs unioned — hash equality
    * pins all four row classes (untouched / updated / deleted / inserted)
    * in one gate.
    */
  def m13MergeFull(spark: SparkSession, d: String): DataFrame = {
    val snap = delegation(spark, d)
    val c = Tables.customer(spark, d)
    val src = c.filter(col("c_custkey") % 3 === 0)
      .select(col("c_custkey").as("drone_id"),
        concat(lit("M"), (col("c_custkey") % 5).cast("string")).as("hq_id"))
      .unionByName(c.filter(col("c_custkey") % 500 === 0)
        .select((col("c_custkey") + 1000000L).as("drone_id"),
          lit("NEW").as("hq_id")))
    Snapshot.merge(snap, src, Seq("drone_id"), col("hq_id") === "M0")
      .orderBy(col("drone_id"))
  }

  /** M14: snapshot reconciliation — [[graft.state.Snapshot.diff]] between
    * orders and a deterministically mutated v2 (delete keys %17, bump
    * price on keys %5, re-insert keys %23 under shifted ids), counted
    * per diff status: the change-data-feed/replication-audit shape. The
    * full-outer join is the operator's shuffle optimum (m13's argument);
    * the status comes from ONE null-safe struct equality.
    */
  def m14SnapshotDiff(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val v2 = o.filter(col("o_orderkey") % 17 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0))
          .otherwise(col("o_totalprice")))
      .unionByName(o.filter(col("o_orderkey") % 23 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L)))
    graft.state.Snapshot.diff(o, v2, Seq("o_orderkey"))
      .groupBy(col("diff_status")).agg(count(lit(1)).as("n"))
      .orderBy(col("diff_status"))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m14_snapshot_diff" -> m14SnapshotDiff,
    "m13_merge_full" -> m13MergeFull,
    "m10_agg_merge" -> m10AggMerge,
    "m12_join_delta" -> m12JoinDelta,
    "m1_upsert" -> m1Upsert,
    "m2_update_where" -> m2UpdateWhere,
    "m3_rewire" -> m3Rewire,
    "m4_delete" -> m4Delete,
    "m6_generate" -> m6Generate,
    "m8_cdc_apply" -> m8CdcApply,
    "p8_cast_predicate" -> p8CastPredicate,
    "p9_json_field" -> p9JsonField)

  val oracles: Map[String, String] = Map(
    "m14_snapshot_diff" ->
      """WITH v2 AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
        |         ELSE o_totalprice END AS o_totalprice,
        |    o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 17 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |    o_totalprice, o_orderdate, o_orderpriority
        |  FROM orders WHERE o_orderkey % 23 = 0),
        |d AS (
        |  SELECT CASE
        |      WHEN b.o_orderkey IS NULL THEN 'added'
        |      WHEN a.o_orderkey IS NULL THEN 'removed'
        |      WHEN b.o_custkey = a.o_custkey
        |        AND b.o_orderstatus = a.o_orderstatus
        |        AND b.o_totalprice = a.o_totalprice
        |        AND b.o_orderdate = a.o_orderdate
        |        AND b.o_orderpriority = a.o_orderpriority
        |        THEN 'unchanged'
        |      ELSE 'changed' END AS diff_status
        |  FROM orders b FULL JOIN v2 a ON b.o_orderkey = a.o_orderkey)
        |SELECT diff_status, count(*) AS n FROM d
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "m13_merge_full" ->
      """WITH delegation AS (
        |  SELECT c_custkey AS drone_id, 'N' || c_nationkey AS hq_id FROM customer
        |), src AS (
        |  SELECT c_custkey AS drone_id, 'M' || (c_custkey % 5) AS hq_id
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'NEW' FROM customer WHERE c_custkey % 500 = 0
        |)
        |SELECT d.drone_id, d.hq_id FROM delegation d
        |  LEFT JOIN src s ON d.drone_id = s.drone_id WHERE s.drone_id IS NULL
        |UNION ALL
        |SELECT s.drone_id, s.hq_id FROM src s
        |  JOIN delegation d ON d.drone_id = s.drone_id WHERE s.hq_id <> 'M0'
        |UNION ALL
        |SELECT s.drone_id, s.hq_id FROM src s
        |  LEFT JOIN delegation d ON d.drone_id = s.drone_id WHERE d.drone_id IS NULL
        |ORDER BY drone_id""".stripMargin,
    "m12_join_delta" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "m10_agg_merge" ->
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE (event_id % 5 <> 0 AND event_type <> 'error')
        |   OR event_id % 5 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "m1_upsert" ->
      """WITH delegation AS (
        |  SELECT c_custkey AS drone_id, 'N' || c_nationkey AS hq_id FROM customer
        |), updates AS (
        |  SELECT drone_id, 'N0' AS hq_id FROM delegation WHERE drone_id % 10 = 0
        |  UNION ALL SELECT -1, 'N99'
        |)
        |SELECT drone_id, hq_id FROM delegation
        |WHERE drone_id NOT IN (SELECT drone_id FROM updates)
        |UNION ALL SELECT drone_id, hq_id FROM updates
        |ORDER BY drone_id""".stripMargin,
    "m2_update_where" ->
      """SELECT c_custkey AS drone_id,
        |  CASE WHEN c_custkey % 10 = 3 THEN 'N1' ELSE 'N' || c_nationkey END AS hq_id
        |FROM customer ORDER BY drone_id""".stripMargin,
    "m3_rewire" ->
      """SELECT 'C0' AS parent, 'O' || o_orderkey AS child
        |FROM orders WHERE o_orderkey % 100 = 7
        |ORDER BY child""".stripMargin,
    "m4_delete" ->
      """SELECT c_custkey AS drone_id, 'N' || c_nationkey AS hq_id
        |FROM customer WHERE c_custkey % 7 <> 0
        |ORDER BY drone_id""".stripMargin,
    "m6_generate" ->
      """SELECT printf('U%04d', i) AS child_id, printf('R%03d', i % 5) AS parent_id,
        |  'Unit' AS child_type
        |FROM range(0, 200) t(i) ORDER BY child_id""".stripMargin,
    "m8_cdc_apply" ->
      """SELECT user_id, op AS last_op, value FROM (
        |  SELECT user_id, value,
        |    CASE WHEN event_type = 'error' THEN 'd'
        |         WHEN event_type = 'signup' THEN 'c' ELSE 'u' END AS op,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |) WHERE rn = 1 AND op <> 'd' ORDER BY user_id""".stripMargin,
    "p8_cast_predicate" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE CAST(c_custkey AS VARCHAR) LIKE '%7'
        |ORDER BY c_custkey""".stripMargin,
    "p9_json_field" ->
      """SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k FROM events
        |WHERE CAST(props->>'$.k' AS INTEGER) > 80
        |ORDER BY event_id""".stripMargin)
}
