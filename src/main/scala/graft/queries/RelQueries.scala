package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator family (SURVEY.md §2.1-2.4, 2.6-2.7) exercised over
  * the driver test tables, each with a DuckDB oracle.
  *
  * Determinism rules (oracle hash-matches across engines):
  *   - Money aggregates are summed as DECIMAL(18,2) (exact, order
  *     independent) and cast back to DOUBLE at the end; plain double sums
  *     differ across summation orders.
  *   - Every query ends in an ORDER BY on a unique key so row order is
  *     engine-independent.
  */
object RelQueries {

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** S1+P1+P2+P3: filtered projection, pushed into the parquet scan. */
  def s1ScanFilter(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** P6: DISTINCT (reference: SELECT DISTINCT from_did FROM web_trust). */
  def p6Distinct(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment"))

  /** P7: set membership (reference: drone_id = ANY(%s)). */
  def p7SetMembership(spark: SparkSession, d: String): DataFrame =
    Tables.customer(spark, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))

  /** P10: UNWIND — the Cypher list-to-rows operator the reference leans on
    * to create edges from an id list (`UNWIND list AS id`,
    * 02_topology_dynamic/benchmark_scenario_c.py:52-57; SURVEY §2.11 maps
    * it to `explode`). `posexplode` additionally carries the 1-based list
    * ordinal — the property Cypher guarantees (UNWIND preserves list
    * order) that a bare `explode` would lose. The generator runs inside
    * the scan stage (whole-stage codegen'd, zero shuffle); fan-out is
    * list-length-proportional and map-side, so the shape is
    * scale-independent.
    */
  def p10Unwind(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .select(col("p_partkey"),
        posexplode(split(col("p_name"), " ")).as(Seq("pos0", "word")))
      .select(col("p_partkey"), col("word"),
        (col("pos0") + 1).cast("long").as("pos"))
      .orderBy(col("p_partkey"), col("pos"))

  /** A1: global COUNT(*). */
  def a1Count(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d).agg(count(lit(1)).as("n"))

  /** A2-ish + the only GROUP-BY-shaped agg: per-flag rollup of lineitem
    * (partial+final HashAggregate; map-side combine at scale).
    */
  def q1Agg(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3 (TPC-H shipping-priority shape): top-10 open orders of one
    * segment by in-flight revenue — segment filter pushed into the
    * customer scan, date filters into orders/lineitem scans, broadcast
    * dimension join, exact DECIMAL revenue (q1 discipline), and the
    * final top-k is a TakeOrderedAndProject over (revenue desc,
    * orderkey) — only 10 rows survive the ordering at any scale.
    */
  def q3ShippingPriority(spark: SparkSession, d: String): DataFrame = {
    val cut = lit("1996-07-01").cast("timestamp")
    val c = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val o = Tables.orders(spark, d).filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = Tables.lineitem(spark, d).filter(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderkey"),
        to_date(col("o_orderdate")).cast("string").as("order_date"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Q5 (TPC-H local-supplier-volume shape): revenue per nation where
    * the customer and the supplier sit in the SAME nation — the classic
    * 6-table join (region→nation→customer→orders→lineitem→supplier).
    * Every dimension side broadcasts; the only big-side work is the
    * orders⋈lineitem fact join; revenue stays exact DECIMAL until one
    * final cast. The co-location predicate (c_nationkey = s_nationkey)
    * lands as a post-join filter on broadcast columns — no extra
    * exchange.
    */
  def q5NationVolume(spark: SparkSession, d: String): DataFrame = {
    val n = Tables.nation(spark, d)
    val r = Tables.region(spark, d)
    val nat = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(col("r_name") === "AMERICA" || col("r_name") === "ASIA")
      .select(col("n_nationkey"), col("n_name"))
    val c = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val s = Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val o = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_extendedprice"), col("l_discount"))
    o.join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
          (lit(1) - dec(col("l_discount")))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** J3: join + filter + count (reference: mission count under hierarchy). */
  def j3JoinFilterCount(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .filter(col("c_mktsegment") === "BUILDING")
      .agg(count(lit(1)).as("n"))
  }

  /** J5: 3-way FK join (lineitem ⋈ orders ⋈ customer), dims broadcast. */
  def j5ThreeWayJoin(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    val c = Tables.customer(spark, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** A4/A6: latency-stats shape — exact percentiles + moments. stddev is
    * computed from exact integer-valued sums (not `stddev()`, whose
    * float accumulation order differs across engines).
    */
  def a4Percentiles(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
    l.agg(
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.95)).as("p95"),
        percentile(col("l_quantity"), lit(0.99)).as("p99"),
        min(col("l_quantity")).as("qmin"),
        max(col("l_quantity")).as("qmax"),
        sum(col("l_quantity")).as("s1"),
        sum(col("l_quantity") * col("l_quantity")).as("s2"),
        count(lit(1)).as("n"))
      .select(
        col("p50"), col("p95"), col("p99"), col("qmin"), col("qmax"),
        (col("s1") / col("n")).as("mean"),
        sqrt((col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1))
          .as("sd"),
        col("n"))
  }

  /** O1/O2: full ordering by key (CDC drain order analog). */
  def o1OrderBy(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy(col("event_id"))

  /** O3: adjacent-gap latency series — the reference's only
    * window-function-shaped computation (client-side diff at
    * demo_sqlite_cdc/02_benchmark/01_local_cdc_capture.py:111-117) as
    * `lag` over an ordered window. A single global window does not scale —
    * noted: at 100 TB this would be windowed per shard/day; here it mirrors
    * the reference's single ordered log.
    */
  def o3LagGaps(spark: SparkSession, d: String): DataFrame = {
    val w = Window.orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_id"), col("ts"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .select(col("event_id"),
        (unix_millis(col("ts")) - col("prev_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  /** O3 at scale: the sharded default form of [[o3LagGaps]] — gaps are
    * computed within a shard (the event's day), so the window exchange is
    * `hashpartitioning(day)` instead of a single task holding the whole
    * log. At 100 TB the day (or producer shard) is also the parquet
    * partition key, so the sort feeding each window is partition-local.
    * Cross-shard boundary gaps are not emitted — at scale nobody diffs
    * the last event of one shard against the first of another.
    */
  def o3LagGapsSharded(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("day")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_id"), col("ts"), to_date(col("ts")).as("day"))
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .filter(col("prev_ms").isNotNull)
      .select(col("event_id"),
        (unix_millis(col("ts")) - col("prev_ms")).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  /** §2.7: UNION ALL (the only set op in the reference). */
  def setUnionAll(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val a = e.filter(col("event_type") === "signup").select(col("user_id"))
    val b = e.filter(col("event_type") === "click").select(col("user_id"))
    a.union(b)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("user_id"))
  }

  /** §2.7+: INTERSECT — users present in BOTH event populations, distinct
    * semantics. Spark plans set intersection as a left-semi hash join over
    * per-side distinct aggregates: two map-side-combined distincts + one
    * key shuffle, output bounded by the smaller distinct set — no row
    * explosion at any scale.
    */
  def setIntersect(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    e.filter(col("event_type") === "signup").select(col("user_id"))
      .intersect(
        e.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** §2.7+: EXCEPT — users with a high-value click but no high-value
    * purchase (distinct semantics; the complement probe of
    * [[setIntersect]], planned as a left-anti hash join over the
    * distincts). The `value` filters keep the difference non-empty in the
    * dense synthetic data — an always-empty gate would hash-match
    * trivially and pin nothing.
    */
  def setExcept(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d).filter(col("value") > 95)
    e.filter(col("event_type") === "click").select(col("user_id"))
      .except(
        e.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  /** J14: anti join — customers with no URGENT-priority order
    * (NOT EXISTS). `left_anti` is a hash join whose build side only needs
    * the filtered FK column: at 100 TB both sides shuffle on the key (or
    * the pruned orders key projection broadcasts), never a nested loop,
    * and the probe emits at most one row per customer. The priority
    * filter keeps the result non-empty (every customer has SOME order in
    * the synthetic data — an empty gate would pin nothing).
    */
  def j14AntiJoin(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d)
    val o = Tables.orders(spark, d)
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** J15: semi join — parts with at least one near-capacity shipment
    * (EXISTS). `left_semi` short-circuits inside the join: a part row is
    * emitted once no matter how many lineitems match, so the output never
    * multiplies — the property that makes EXISTS safe on a fact table
    * where an inner join + distinct would shuffle the multiplied rows
    * first.
    */
  def j15SemiJoin(spark: SparkSession, d: String): DataFrame = {
    val p = Tables.part(spark, d)
    val l = Tables.lineitem(spark, d).filter(col("l_quantity") >= 49)
    p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_brand"))
      .orderBy(col("p_partkey"))
  }

  /** O5: top-k per group — the 3 highest-value orders per priority class.
    * The rank-filter shape Catalyst rewrites to WindowGroupLimit: each
    * map task keeps only its local top-3 per group BEFORE the window
    * exchange, so the shuffle carries O(groups × k) rows instead of the
    * table. Ties break on the unique key for engine-independent output.
    */
  /** O21: ROLLUP aggregate — revenue and order counts at every level of
    * the region → nation hierarchy plus the grand total, in ONE pass:
    * Spark's `rollup` expands to grouping sets inside a single
    * hash-aggregate (Expand + partial agg — map-side combined, one
    * shuffle), exactly the OLAP subtotal cube a reporting layer asks
    * for. `lvl` = grouping_id() (0 = leaf, 1 = nation rolled, 3 = grand
    * total — the same bitmask DuckDB's GROUPING returns) disambiguates
    * rolled-up NULLs from data NULLs. Decimal-sum contract as q1.
    */
  def o21RollupRevenue(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .join(Tables.customer(spark, d),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, d),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, d),
        col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"),
        grouping_id().as("lvl"))
      .orderBy(col("lvl"), col("r_name"), col("n_name"))


  def o5TopkPerGroup(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_orderpriority"), col("rk"))
  }

  /** J12: as-of attribution — every purchase matched to the user's latest
    * click at-or-before the purchase instant ([[graft.operators.AsOfJoin]]:
    * tagged union → one key shuffle → running `last` sweep; no range
    * explosion). The click side is pre-aggregated to one row per
    * (user, ts) with the max event id so duplicate-timestamp resolution
    * is engine-independent — DuckDB's ASOF picks an arbitrary row among
    * exact-tie duplicates, and a gate must not hash-compare an arbitrary
    * choice. Unmatched purchases survive with null click/gap (LEFT).
    */
  def j12AsofAttribution(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
    graft.operators.AsOfJoin
      .backward(purchases, clicks, Seq("user_id"), "ts", "ts",
        rightPrefix = "c_")
      .select(col("event_id"), col("user_id"), col("c_click_id").as("click_id"),
        (unix_millis(col("ts")) - unix_millis(col("c_ts"))).as("gap_ms"))
      .orderBy(col("event_id"))
  }

  /** J21: forward as-of — time-to-conversion: for every click, the NEXT
    * purchase by the same user within 24 h ([[graft.operators.AsOfJoin]]
    * `forward` — the mirrored one-shuffle sweep, `first(ignoreNulls)`
    * over the following frame; clicks past the tolerance or with no
    * later purchase survive with nulls). The right side is
    * pre-aggregated on (user, ts) so duplicate resolution is
    * engine-independent, same discipline as j12.
    */
  def j21AsofForward(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    graft.operators.AsOfJoin
      .forward(clicks, purchases, Seq("user_id"), "ts", "ts",
        rightPrefix = "p_", toleranceMs = Some(86400000L))
      .select(col("event_id"), col("user_id"),
        col("p_purchase_id").as("purchase_id"),
        (unix_millis(col("p_ts")) - unix_millis(col("ts"))).as("wait_ms"))
      .orderBy(col("event_id"))
  }

  /** J22: nearest as-of — for every click, the closest purchase by the
    * same user in EITHER direction within 12 h
    * ([[graft.operators.AsOfJoin]] `nearest`: both candidates from one
    * WindowExec pass, min |gap| with backward winning ties). `gap_us`
    * is signed (negative = purchase before the click), so the gate also
    * pins which direction won every row. Oracle: two DuckDB ASOF joins
    * + the same tolerance/tie CASE.
    */
  def j22AsofNearest(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("purchase_id"))
    graft.operators.AsOfJoin
      .nearest(clicks, purchases, Seq("user_id"), "ts", "ts",
        rightPrefix = "p_", toleranceMs = Some(43200000L))
      .select(col("event_id"), col("user_id"),
        col("p_purchase_id").as("purchase_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** J13: range-join context count — for every purchase, how many clicks
    * the same user made in the preceding two hours
    * ([[graft.operators.RangeJoin]]: interval bucketing turns the
    * inequality join into an equi-join on (user, bucket) with ≤2 replicas
    * per click — never the nested-loop plan Spark picks for raw
    * inequality predicates). Inner matches are aggregated then
    * left-joined back so every purchase reports, zero included.
    */
  def j13RangeCount(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"))
    val matched = graft.operators.RangeJoin
      .inner(purchases, clicks, Seq("user_id"), "ts", "ts",
        beforeMs = 7200000L, afterMs = 0L, rightPrefix = "c_")
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"))
    purchases.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"))
      .orderBy(col("event_id"))
  }

  /** A8: CUBE grouping sets over the q1 keys — all four strata
    * ((flag,status), (flag), (status), ()) in one pass; like ROLLUP,
    * Spark expands the grouping sets before the aggregate and the plan
    * stays a single map-side-combined shuffle.
    */
  def a8Cube(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** A9: HAVING over a scalar subquery — priority classes holding more
    * than a 1/5 share of all orders. The scalar total is a 1-row
    * broadcast joined under every group (the decorrelated plan every
    * engine lowers HAVING-vs-total to); scale-free threshold so the gate
    * stays non-trivial at every sf.
    */
  def a9Having(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val tot = o.agg(count(lit(1)).as("__tot"))
    o.groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      .join(broadcast(tot))
      .filter(col("n") > col("__tot") / 5.0)
      .select(col("o_orderpriority"), col("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** A10: correlated scalar subquery, decorrelated — orders priced above
    * their own customer's average order value. The comparison is done as
    * `price × n > sum` in DECIMAL so both engines decide each row
    * exactly (a decimal `avg` rounds at engine-specific scale; the
    * cross-multiplied form never divides). Spark's plan is the
    * decorrelation every optimizer applies: per-customer aggregate +
    * equi-join, one shuffle, no per-row subquery execution.
    */
  def a10CorrSubquery(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val byCust = o.groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("__sum"),
        count(lit(1)).as("__n"))
    o.join(byCust, "o_custkey")
      .filter(dec(col("o_totalprice")) * col("__n") > col("__sum"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** A11: GROUPING flags — cube output disambiguated: `grouping(col)`
    * distinguishes a stratum's aggregate-null from a data null (the
    * correctness trap in every grouping-sets consumer). Still the single
    * expanded-grouping-sets shuffle of a8.
    */
  def a11GroupingId(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_flag"),
        grouping(col("l_linestatus")).cast("int").as("g_status"),
        count(lit(1)).as("n"))
      .orderBy(col("g_flag"), col("g_status"),
        col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** A12: grouped exact percentiles — the a4 latency-stats shape per
    * group (per-flag quantiles): one hash shuffle on the group key, the
    * per-group sorted-quantile state never global.
    */
  def a12GroupedPercentiles(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .groupBy(col("l_returnflag"))
      .agg(percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.95)).as("p95"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** A13: argmax — the highest-value order per priority class via
    * `max_by` with a (price, key) struct so exact-price ties resolve
    * deterministically (the generated sf1 decade replicates prices 10×,
    * so ties are guaranteed there, not hypothetical). The oracle answers
    * through an independent formulation — a row_number window with the
    * same composite ordering — pinning Spark's struct-ordered max_by
    * against DuckDB's QUALIFY top-1. One map-side-combinable aggregate,
    * no window shuffle on the engine side.
    */
  def a13Argmax(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .groupBy(col("o_orderpriority"))
      .agg(max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("top_order"),
        max(col("o_totalprice")).as("top_price"))
      .orderBy(col("o_orderpriority"))

  /** O6: NTILE quartiles — every order bucketed into totalprice
    * quartiles within its priority class (equal-size buckets, remainder
    * to the leading buckets — the semantics Spark and DuckDB share).
    * Ordering ties break on the unique key so bucket assignment is
    * engine-independent; same WindowGroupLimit-family shuffle shape as
    * o5 but without the rank filter (all rows emit).
    */
  def o6Ntile(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .orderBy(col("o_orderkey"))
  }

  /** §2.7+: UNION DISTINCT — completes the set-op family
    * (union_all / intersect / except / union): distinct union of the two
    * user populations, one hash-distinct shuffle over the concatenation.
    */
  def setUnionDistinct(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    e.filter(col("event_type") === "signup").select(col("user_id"))
      .union(e.filter(col("event_type") === "purchase").select(col("user_id")))
      .distinct()
      .orderBy(col("user_id"))
  }

  /** A15: grouped correlation — corr(quantity, price) per return flag,
    * computed from EXACT sufficient statistics (integer-valued and
    * DECIMAL sums; the a4 stddev pattern): `corr()` itself accumulates
    * floats in partition order and never hash-matches across engines,
    * while the derived form is deterministic double arithmetic over
    * exact inputs. Sufficient statistics are also the mergeable/
    * map-side-combinable form the sketch-and-merge world wants.
    */
  def a15GroupedCorr(spark: SparkSession, d: String): DataFrame =
    // Every power sum exact (BIGINT x, DECIMAL money): the original form
    // summed qty·price as DOUBLE, whose accumulation order leaks into the
    // 10th significant digit at sf1 through the n·sxy − sx·sy
    // cancellation (caught by the regenerated-sf1 replay; a17_regr hit
    // the identical defect). Width choreography as in a17: ≥19-digit
    // operands keep DuckDB in int128, small enough widths keep Spark's
    // 38-precision cap from truncating scale.
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("q"),
        floor(col("l_quantity")).cast(DecimalType(9, 0)).as("qd"),
        dec(col("l_extendedprice")).as("y"))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("qd") * col("y")).as("sxy"),
        sum(col("q") * col("q")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .selectExpr("l_returnflag", "n",
        "CAST(n AS DECIMAL(19,0)) AS nd",
        "CAST(n AS DECIMAL(10,0)) AS n2",
        "CAST(sx AS DECIMAL(19,0)) AS sxd",
        "CAST(sy AS DECIMAL(19,2)) AS syd",
        "CAST(sxy AS DECIMAL(18,2)) AS sxyd",
        "CAST(sxx AS DECIMAL(18,0)) AS sxxd",
        "CAST(syy AS DECIMAL(22,4)) AS syyd")
      .selectExpr("l_returnflag", "n",
        "CAST(nd * sxyd - sxd * syd AS DOUBLE) /" +
          " (sqrt(CAST(nd * sxxd - sxd * sxd AS DOUBLE))" +
          " * sqrt(CAST(n2 * syyd - syd * syd AS DOUBLE)))" +
          " AS corr_qty_price")
      .orderBy(col("l_returnflag"))

  /** H1: value histogram — `width_bucket` over the event value domain
    * (20 equal buckets plus the standard under/overflow buckets 0 and
    * 21), one map-side-combined hash aggregate; the profiling pass every
    * ingestion pipeline runs before choosing filters.
    */
  def h1ValueHistogram(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(width_bucket(col("value"), lit(0.0), lit(500.0), lit(20))
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))

  /** A14: salted two-phase aggregation — q1's aggregate computed through
    * an explicit skew-safe plan: partial aggregate on (keys, salt) so ANY
    * hot key splits across 32 reducers, then [[graft.operators.AggMerge]]
    * combines the partials per key. Spark's map-side combine usually
    * absorbs group-by skew, but when per-task pre-shuffle cardinality
    * stays huge (high-cardinality agg buffers, combine-hostile
    * aggregates) explicit salting bounds any one reducer's share at
    * 1/salts of the hot key. The oracle is q1's own SQL — hash equality
    * proves the salted decomposition is exact (sums reassociate; DECIMAL
    * money paths keep it bit-stable).
    */
  def a14SaltedAgg(spark: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(spark, d)
    val partial = l
      .withColumn("__salt",
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(32)))
      .groupBy(col("l_returnflag"), col("l_linestatus"), col("__salt"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        sum(dec(col("l_extendedprice"))).as("__price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .as("__rev"),
        count(lit(1)).as("n"))
      .drop("__salt")
    graft.operators.AggMerge
      .merge(Seq(partial), Seq("l_returnflag", "l_linestatus"), "n")
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"),
        col("__price").cast("double").as("sum_price"),
        col("__rev").cast("double").as("revenue"), col("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** J16: interval-overlap join — for every purchase, how many click
    * activity spans `[click, click + 30 min]` intersect the purchase's
    * preceding-hour window `[purchase − 1 h, purchase]`
    * ([[graft.operators.RangeJoin.overlap]]: both interval sides
    * replicate over covering buckets, the pair is kept only in the
    * bucket holding the overlap start — one equi-join shuffle, emitted
    * exactly once, never the nested-loop plan raw `s ≤ e` predicates
    * get). Inner matches aggregate then left-join back so every
    * purchase reports, zero included.
    */
  def j16IntervalOverlap(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        (col("ts") - expr("INTERVAL 1 HOUR")).as("s"), col("ts").as("e"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("s"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("e"))
    val matched = graft.operators.RangeJoin
      .overlap(purchases, clicks, Seq("user_id"), "s", "e", "s", "e",
        bucketMs = 1800000L)
      .groupBy(col("event_id")).agg(count(lit(1)).as("n_overlaps"))
    purchases.select(col("event_id"))
      .join(matched, Seq("event_id"), "left")
      .select(col("event_id"),
        coalesce(col("n_overlaps"), lit(0L)).as("n_overlaps"))
      .orderBy(col("event_id"))
  }

  /** J18: SCD2 point-in-time lookup — every purchase resolves the user's
    * dimension version (the m11 'view' stream) active at purchase time.
    * THE most common warehouse lookup, and deliberately implemented by
    * REUSING [[graft.operators.AsOfJoin.backward]]: a contiguous
    * version chain makes "valid_from ≤ ts < valid_to" equivalent to
    * "latest valid_from ≤ ts", which the as-of sweep answers in one
    * exchange of |facts|+|versions| rows — no interval fan-out at all.
    * Left-outer: purchases before the user's first version emit nulls.
    * Version ties on (user, ts) break by version_id, mirrored in the
    * oracle's row_number ordering.
    */
  def j18Scd2Lookup(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val versions = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("valid_from"),
        col("event_id").as("version_id"), col("value").as("vval"))
    val facts = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    graft.operators.AsOfJoin.backward(facts, versions,
        keys = Seq("user_id"), leftTs = "ts", rightTs = "valid_from",
        rightPrefix = "v_", tiebreak = Some("version_id"))
      .select(col("event_id"),
        unix_millis(col("v_valid_from")).as("version_from_ms"),
        col("v_version_id").as("version_id"),
        col("v_vval").as("version_value"))
      .orderBy(col("event_id"))
  }

  /** SK1: HyperLogLog++ distinct-user sketch per event type, gated the
    * honest way for an approximate operator (the ann_*_recall pattern):
    * the gate emits whether the worst per-group relative error against
    * the exact distinct count stays within 5% — the sketch value itself
    * is engine-specific and is not hash-compared. At 100 TB the sketch
    * IS the operator: approx_count_distinct merges fixed-size HLL
    * registers map-side instead of shuffling a distinct set.
    */
  def sk1HllBound(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx"),
        countDistinct(col("user_id")).as("exact"))
      .agg(max(abs(col("approx") - col("exact")) /
        col("exact").cast("double")).as("worst_err"))
      .select((col("worst_err") <= 0.05).as("within_bound"))

  /** SK2: quantile sketch (Spark's Greenwald-Khanna
    * `approx_percentile`) — gated by rank containment: the approximate
    * median must land between the exact 0.49 and 0.51 quantiles, i.e.
    * within 1% rank error at accuracy 10000.
    */
  def sk2QuantileBound(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .agg(expr("approx_percentile(l_quantity, 0.5, 10000)").as("ap"),
        expr("percentile(l_quantity, 0.49)").as("lo"),
        expr("percentile(l_quantity, 0.51)").as("hi"))
      .select((col("ap") >= col("lo") && col("ap") <= col("hi"))
        .as("within_bound"))

  /** SK3: Bloom-filter membership sketch over the orders fact's customer
    * FK — the build is `df.stat.bloomFilter`, whose aggregation ORs
    * fixed-size bit arrays map-side (the row set never moves; this is
    * exactly how a broadcast-join runtime filter is built on a dim side
    * and shipped to prune a 100 TB fact scan). The probe side broadcasts
    * the filter and tests distributedly — via a UDF because OSS Spark
    * exposes no public Column-level `might_contain` (probed: unresolved
    * in the 4.1 registry; the Expression is internal to runtime
    * filtering). Gated the honest approximate way (sk1/sk2 pattern):
    * zero false negatives over every inserted key, and a false-positive
    * rate over 50k guaranteed-absent keys within 3x the configured fpp.
    */
  def sk3BloomBound(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val orders = Tables.orders(spark, d)
    val keys = orders.select(col("o_custkey")).distinct()
    val nKeys = keys.count()
    val fpp = 0.03
    val bf = orders.stat.bloomFilter("o_custkey", math.max(nKeys, 1000L), fpp)
    val bc = spark.sparkContext.broadcast(bf)
    val might = udf((k: Long) => bc.value.mightContainLong(k))
    val falseNegs = keys.filter(!might(col("o_custkey"))).count()
    // 1-row scalar probe (capability-probe class): the absent-key range
    // starts just past the live key domain.
    val maxKey = keys.agg(max(col("o_custkey"))).head().getLong(0)
    val nProbe = 50000L
    val fps = spark.range(1, nProbe + 1)
      .select((col("id") + maxKey).as("k"))
      .filter(might(col("k"))).count()
    Seq(falseNegs == 0L && fps.toDouble / nProbe <= 3 * fpp)
      .toDF("within_bound")
  }

  /** SK4: Count-Min frequency sketch over the event stream's user key —
    * `df.stat.countMinSketch` merges fixed-width count matrices map-side
    * (the mergeable-summary property that makes it a 100 TB operator,
    * same class as sk1's HLL registers and t10's Misra-Gries maps).
    * Gate: for the five heaviest users, the estimate must sit in the
    * CMS guarantee band [exact, exact + eps*N] — never under (CMS only
    * overestimates), never past the additive error bound. The 5-key
    * probe reads the driver-held sketch directly (5 boxed lookups, not
    * a data-path collect); seed fixed so the gate is deterministic.
    */
  /** SK5: mergeable HLL sketch rollup — THE 100 TB distinct-count
    * pattern. A per-(event_type, day) sketch table is built once
    * (`hll_sketch_agg`, Datasketches binary blobs — what you would
    * persist as a daily rollup at scale), then per-type totals come
    * from `hll_union_agg` over the blobs WITHOUT touching the fact
    * table again: re-aggregation cost is O(groups × sketch bytes),
    * not O(rows). The gate proves the algebra is lossless where it
    * must be (union of daily sketches == one-shot sketch over the
    * raw rows, bit-identical estimates) and that the estimate lands
    * within 5% of the exact per-type distinct — the sk1 derived-bound
    * pattern extended from one-shot approximation to the mergeable
    * rollup form.
    */
  def sk5HllMerge(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    // The daily rollup table: one row per (event_type, day), sketch blob.
    val daily = e.groupBy(col("event_type"),
        to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
    // Re-aggregate from blobs only.
    val merged = daily.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    // One-shot sketch + exact, straight off the fact table.
    val direct = e.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
          .as("est_direct"),
        countDistinct(col("user_id")).as("exact"))
    merged.join(direct, "event_type")
      .agg(
        max(when(col("est") =!= col("est_direct"), 1L).otherwise(0L))
          .as("lossy"),
        max(abs(col("est") - col("exact")) / col("exact").cast("double"))
          .as("worst_err"))
      .select((col("lossy") === 0L && col("worst_err") <= 0.05)
        .as("within_bound"))
  }

  /** Z1: Morton/Z-order clustering key over the lineitem (part, supplier)
    * pair — [[graft.functions.ZOrder.zorder2]], the layout primitive for
    * multi-dimensional scan pruning (see the `ScaleLayoutSpec` proof that
    * a z-sorted layout bounds file overlap on the non-leading dimension
    * where a linear sort reads everything). The oracle rebuilds the
    * identical 16-bit interleave with DuckDB shift/mask arithmetic, so
    * the gate pins every bit of the expression tree.
    */
  def z1ZorderKey(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.ZOrder.zorder2(
          pmod(col("l_partkey"), lit(65536)),
          pmod(col("l_suppkey"), lit(65536))).as("zkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private def z1Oracle: String = {
    // Joined on ONE line: a "\n    | " separator would be eaten by the
    // enclosing stripMargin.
    val terms = (0 until 16).map { j =>
      s"(((px >> $j) & 1) << ${2 * j}) | (((sx >> $j) & 1) << ${2 * j + 1})"
    }.mkString(" | ")
    s"""WITH b AS (
       |  SELECT l_orderkey, l_linenumber,
       |    CAST(l_partkey % 65536 AS BIGINT) AS px,
       |    CAST(l_suppkey % 65536 AS BIGINT) AS sx
       |  FROM lineitem)
       |SELECT l_orderkey, l_linenumber,
       |    $terms
       |  AS zkey
       |FROM b ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** SK6: sketch-algebra set intersection — |clickers ∩ purchasers|
    * estimated by inclusion–exclusion over three HLL estimates
    * (est_A + est_B − est_union), never materializing either user set:
    * the audience-overlap question answered from the same persisted
    * per-segment sketches sk5 rolls up, at O(sketch bytes) instead of a
    * distinct-join. Inclusion–exclusion AMPLIFIES relative error (three
    * ±0.8% estimates differencing into a smaller quantity), which is
    * why the gate's bound is 10% where sk1's one-sketch bound is 5% —
    * the honest cost of sketch-side set algebra, stated rather than
    * hidden. Exact twin: one user-keyed distinct aggregate.
    */
  def sk6HllIntersect(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
    val per = e.groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .as("est"))
      .agg(max(when(col("event_type") === "click", col("est"))).as("ea"),
        max(when(col("event_type") === "purchase", col("est"))).as("eb"))
    val both = e.agg(
      expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))").as("eu"))
    val exact = e.groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("nt"))
      .filter(col("nt") === 2)
      .agg(count(lit(1)).as("exact"))
    per.crossJoin(broadcast(both)).crossJoin(broadcast(exact))
      .select((abs(col("ea") + col("eb") - col("eu") - col("exact")) /
        col("exact").cast("double") <= 0.10).as("within_bound"))
  }

  /** J20: null-safe equality join (`<=>` / IS NOT DISTINCT FROM) — the
    * semantics class regular equi-joins silently get wrong on nullable
    * dimension keys: NULL must match the dimension's NULL row instead
    * of dropping. The 100 TB point is the PLAN: Spark's EqualNullSafe
    * is still a hashable join key (spec-asserted: no nested loop),
    * where the naive `a = b OR (a IS NULL AND b IS NULL)` rewrite
    * degenerates to BroadcastNestedLoopJoin. Keys derive as
    * nullif(l_returnflag, 'N'), so a third of the fact rows carry NULL.
    */
  def j20NullSafeJoin(spark: SparkSession, d: String): DataFrame = {
    val facts = Tables.lineitem(spark, d)
      .select(nullif(col("l_returnflag"), lit("N")).as("k"))
    val dim = facts.distinct().withColumnRenamed("k", "dk")
    facts.join(dim, col("k") <=> col("dk"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k"))
  }

  def sk4CmsBound(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val e = Tables.events(spark, d)
    val eps = 0.0005
    val n = e.count()
    val cms = e.stat.countMinSketch("user_id", eps, 0.99, 42)
    val top = e.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("user_id")).limit(5).collect()
    val slack = math.ceil(eps * n).toLong
    val ok = top.forall { r =>
      val est = cms.estimateCount(r.getLong(0))
      est >= r.getLong(1) && est <= r.getLong(1) + slack
    }
    Seq(ok).toDF("within_bound")
  }

  /** SK7: sampling-based join-cardinality estimation — the optimizer
    * statistic behind join planning: |clicks ⋈ purchases on user| is
    * estimated from the 25% KEY-correlated sample (keep a user iff its
    * content hash lands under the threshold — both sides keep the SAME
    * keys, so per-key contributions survive intact and the estimator is
    * unbiased with a single 1/p scale-up; row-independent Bernoulli
    * sampling would need 1/p² and explode the variance). At 100 TB only
    * the sampled branch runs — a pushed hash filter then small aggs;
    * the exact branch here exists for the gate. Deterministic sha2
    * bucketing (the d7 sampler), so both engines compute the identical
    * estimate — a hash pin, not a tolerance gate; the spec asserts the
    * estimate lands within 2× of exact on this corpus.
    */
  def sk7JoinSizeSample(spark: SparkSession, d: String): DataFrame = {
    def sizeOf(events: DataFrame) = {
      val cc = events.filter(col("event_type") === "click")
        .groupBy(col("user_id")).agg(count(lit(1)).as("nc"))
      val pp = events.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      cc.join(pp, "user_id")
        .agg(coalesce(sum(col("nc") * col("np")), lit(0L)))
    }
    val e = Tables.events(spark, d)
    val exact = sizeOf(e).toDF("exact")
    val sampled = sizeOf(e.filter(
      graft.pipeline.Sampling.hashBucket(col("user_id").cast("string"))
        % 10000 < 2500)).toDF("sampled")
    exact.crossJoin(broadcast(sampled))
      .select(col("exact"), col("sampled"),
        (col("sampled") * 4).as("estimate"),
        round(col("sampled").cast("double") * 4 / col("exact"), 4)
          .as("ratio"))
  }

  /** O4: pivot — day × event-type count matrix via `groupBy().pivot()`
    * with an explicit value list (no extra distinct-values job; the plan
    * is one hash aggregate over (day), each cell a conditional count —
    * map-side combinable, one shuffle). Absent cells fill 0 to match the
    * oracle's `count(*) FILTER` semantics.
    */
  def o4PivotCounts(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("day"))

  /** A2+: ROLLUP grouping sets over the q1 keys — one pass computes the
    * (flag, status), (flag), and grand-total strata (Spark expands the
    * grouping sets before the aggregate; still a single shuffle).
    */
  def a2Rollup(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_scan_filter" -> s1ScanFilter,
    "j12_asof_attribution" -> j12AsofAttribution,
    "j21_asof_forward" -> j21AsofForward,
    "j22_asof_nearest" -> j22AsofNearest,
    "j13_range_count" -> j13RangeCount,
    "j18_scd2_lookup" -> j18Scd2Lookup,
    "sk1_hll_bound" -> sk1HllBound,
    "sk2_quantile_bound" -> sk2QuantileBound,
    "sk3_bloom_bound" -> sk3BloomBound,
    "sk4_cms_bound" -> sk4CmsBound,
    "sk5_hll_merge" -> sk5HllMerge,
    "sk7_join_size_sample" -> sk7JoinSizeSample,
    "z1_zorder_key" -> z1ZorderKey,
    "sk6_hll_intersect" -> sk6HllIntersect,
    "j20_null_safe_join" -> j20NullSafeJoin,
    "o4_pivot_counts" -> o4PivotCounts,
    "a2_rollup" -> a2Rollup,
    "p6_distinct" -> p6Distinct,
    "p7_set_membership" -> p7SetMembership,
    "p10_unwind" -> p10Unwind,
    "a1_count" -> a1Count,
    "q1_agg" -> q1Agg,
    "q3_shipping_priority" -> q3ShippingPriority,
    "q5_nation_volume" -> q5NationVolume,
    "j3_join_filter_count" -> j3JoinFilterCount,
    "j5_three_way_join" -> j5ThreeWayJoin,
    "a4_percentiles" -> a4Percentiles,
    "o1_order_by" -> o1OrderBy,
    "o3_lag_gaps" -> o3LagGaps,
    "o3_lag_gaps_sharded" -> o3LagGapsSharded,
    "set_union_all" -> setUnionAll,
    "set_intersect" -> setIntersect,
    "set_except" -> setExcept,
    "j14_anti_join" -> j14AntiJoin,
    "j15_semi_join" -> j15SemiJoin,
    "o5_topk_per_group" -> o5TopkPerGroup,
    "o21_rollup_revenue" -> o21RollupRevenue,
    "j16_interval_overlap" -> j16IntervalOverlap,
    "a8_cube" -> a8Cube,
    "a9_having" -> a9Having,
    "a10_corr_subquery" -> a10CorrSubquery,
    "o6_ntile" -> o6Ntile,
    "set_union_distinct" -> setUnionDistinct,
    "a11_grouping_id" -> a11GroupingId,
    "a14_salted_agg" -> a14SaltedAgg,
    "a15_grouped_corr" -> a15GroupedCorr,
    "h1_value_histogram" -> h1ValueHistogram,
    "a12_grouped_percentiles" -> a12GroupedPercentiles,
    "a13_argmax" -> a13Argmax)

  val oracles: Map[String, String] = Map(
    "j12_asof_attribution" ->
      """WITH c AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
        |), p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, c.click_id,
        |  epoch_ms(CAST(p.ts AS TIMESTAMP)) -
        |    epoch_ms(CAST(c.ts AS TIMESTAMP)) AS gap_ms
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,
    "j22_asof_nearest" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), b AS (
        |  SELECT c.event_id, p.purchase_id AS bid,
        |    epoch_us(CAST(c.ts AS TIMESTAMP))
        |      - epoch_us(CAST(p.ts AS TIMESTAMP)) AS bgap
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.ts >= p.ts
        |), f AS (
        |  SELECT c.event_id, p.purchase_id AS fid,
        |    epoch_us(CAST(p.ts AS TIMESTAMP))
        |      - epoch_us(CAST(c.ts AS TIMESTAMP)) AS fgap
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.ts <= p.ts
        |), j AS (
        |  SELECT c.event_id, c.user_id, b.bid, b.bgap, f.fid, f.fgap
        |  FROM c LEFT JOIN b USING (event_id) LEFT JOIN f USING (event_id))
        |SELECT event_id, user_id,
        |  CASE WHEN bid IS NOT NULL AND bgap <= 43200000000
        |        AND (fid IS NULL OR fgap > 43200000000 OR bgap <= fgap)
        |      THEN bid
        |    WHEN fid IS NOT NULL AND fgap <= 43200000000 THEN fid
        |  END AS purchase_id,
        |  CASE WHEN bid IS NOT NULL AND bgap <= 43200000000
        |        AND (fid IS NULL OR fgap > 43200000000 OR bgap <= fgap)
        |      THEN -bgap
        |    WHEN fid IS NOT NULL AND fgap <= 43200000000 THEN fgap
        |  END AS gap_us
        |FROM j ORDER BY event_id""".stripMargin,
    "j21_asof_forward" ->
      """WITH c AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, max(event_id) AS purchase_id
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
        |), j AS (
        |  SELECT c.event_id, c.user_id, p.purchase_id,
        |    epoch_us(CAST(p.ts AS TIMESTAMP))
        |      - epoch_us(CAST(c.ts AS TIMESTAMP)) AS gap_us,
        |    epoch_ms(CAST(p.ts AS TIMESTAMP))
        |      - epoch_ms(CAST(c.ts AS TIMESTAMP)) AS gap_ms
        |  FROM c ASOF LEFT JOIN p
        |    ON c.user_id = p.user_id AND c.ts <= p.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN gap_us <= 86400000000 THEN purchase_id END
        |    AS purchase_id,
        |  CASE WHEN gap_us <= 86400000000 THEN gap_ms END AS wait_ms
        |FROM j ORDER BY event_id""".stripMargin,
    "j18_scd2_lookup" ->
      """WITH versions AS (
        |  SELECT user_id, ts AS valid_from, event_id AS version_id,
        |    value AS vval
        |  FROM events WHERE event_type = 'view'),
        |facts AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |ranked AS (
        |  SELECT f.event_id, v.valid_from, v.version_id, v.vval,
        |    row_number() OVER (PARTITION BY f.event_id
        |      ORDER BY v.valid_from DESC, v.version_id DESC) AS rk
        |  FROM facts f JOIN versions v
        |    ON v.user_id = f.user_id AND v.valid_from <= f.ts)
        |SELECT f.event_id,
        |  epoch_ms(CAST(r.valid_from AS TIMESTAMP)) AS version_from_ms,
        |  r.version_id, r.vval AS version_value
        |FROM facts f LEFT JOIN ranked r
        |  ON r.event_id = f.event_id AND r.rk = 1
        |ORDER BY f.event_id""".stripMargin,
    "sk1_hll_bound" -> "SELECT TRUE AS within_bound",
    "sk2_quantile_bound" -> "SELECT TRUE AS within_bound",
    "sk3_bloom_bound" -> "SELECT TRUE AS within_bound",
    "sk4_cms_bound" -> "SELECT TRUE AS within_bound",
    "sk5_hll_merge" -> "SELECT TRUE AS within_bound",
    "z1_zorder_key" -> z1Oracle,
    "sk6_hll_intersect" -> "SELECT TRUE AS within_bound",
    "j20_null_safe_join" ->
      """WITH f AS (SELECT nullif(l_returnflag, 'N') AS k FROM lineitem),
        |d AS (SELECT DISTINCT k AS dk FROM f)
        |SELECT k, count(*)::BIGINT AS n
        |FROM f JOIN d ON k IS NOT DISTINCT FROM dk
        |GROUP BY k ORDER BY k""".stripMargin,
    "o4_pivot_counts" ->
      """SELECT CAST(ts AS DATE) AS day,
        |  count(*) FILTER (event_type = 'click') AS click,
        |  count(*) FILTER (event_type = 'error') AS error,
        |  count(*) FILTER (event_type = 'purchase') AS purchase,
        |  count(*) FILTER (event_type = 'signup') AS signup,
        |  count(*) FILTER (event_type = 'view') AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "a2_rollup" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "j13_range_count" ->
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, count(c.ts) AS n_clicks
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 2 HOUR AND c.ts <= p.ts
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin,
    "s1_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 45 AND l_shipdate < TIMESTAMP '1997-01-01'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p6_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "p7_set_membership" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_mktsegment IN ('BUILDING','MACHINERY')
        |ORDER BY c_custkey""".stripMargin,
    "p10_unwind" ->
      """SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word,
        |  CAST(generate_subscripts(string_split(p_name, ' '), 1) AS BIGINT)
        |    AS pos
        |FROM part ORDER BY p_partkey, pos""".stripMargin,
    "a1_count" -> "SELECT count(*) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "sk7_join_size_sample" ->
      """WITH cc AS (
        |  SELECT user_id, count(*) AS nc FROM events
        |  WHERE event_type = 'click' GROUP BY 1),
        |pp AS (
        |  SELECT user_id, count(*) AS np FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |ex AS (
        |  SELECT COALESCE(sum(nc * np), 0) AS exact
        |  FROM cc JOIN pp USING (user_id)),
        |sc AS (
        |  SELECT user_id, count(*) AS nc FROM events
        |  WHERE event_type = 'click'
        |    AND ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 10000 < 2500
        |  GROUP BY 1),
        |sp AS (
        |  SELECT user_id, count(*) AS np FROM events
        |  WHERE event_type = 'purchase'
        |    AND ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 8))
        |      ::BIGINT % 10000 < 2500
        |  GROUP BY 1),
        |sm AS (
        |  SELECT COALESCE(sum(nc * np), 0) AS sampled
        |  FROM sc JOIN sp USING (user_id))
        |SELECT CAST(exact AS BIGINT) AS exact,
        |  CAST(sampled AS BIGINT) AS sampled,
        |  CAST(sampled * 4 AS BIGINT) AS estimate,
        |  round(CAST(sampled AS DOUBLE) * 4 / exact, 4) AS ratio
        |FROM ex CROSS JOIN sm""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY o_orderkey, order_date
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q5_nation_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
        |    AS revenue
        |FROM orders
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE c_nationkey = s_nationkey
        |  AND r_name IN ('AMERICA', 'ASIA')
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "j3_join_filter_count" ->
      """SELECT count(*) AS n FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "j5_three_way_join" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "a4_percentiles" ->
      """SELECT p50, p95, p99, qmin, qmax, s1 / n AS mean,
        |  sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd, n
        |FROM (SELECT
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.95) AS p95,
        |  quantile_cont(l_quantity, 0.99) AS p99,
        |  min(l_quantity) AS qmin, max(l_quantity) AS qmax,
        |  sum(l_quantity) AS s1,
        |  sum(l_quantity * l_quantity) AS s2,
        |  count(*) AS n
        |FROM lineitem)""".stripMargin,
    "o1_order_by" ->
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_id""".stripMargin,
    "o3_lag_gaps" ->
      """SELECT event_id, ms - lag(ms) OVER (ORDER BY ts, event_id) AS gap_ms
        |FROM (SELECT event_id, ts, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events)
        |QUALIFY gap_ms IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "o3_lag_gaps_sharded" ->
      """SELECT event_id, ms - lag(ms) OVER (
        |    PARTITION BY CAST(ts AS DATE) ORDER BY ts, event_id) AS gap_ms
        |FROM (SELECT event_id, ts, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events)
        |QUALIFY gap_ms IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "set_union_all" ->
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT user_id FROM events WHERE event_type = 'click'
        |) GROUP BY user_id ORDER BY user_id""".stripMargin,
    "set_intersect" ->
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "set_except" ->
      """SELECT user_id FROM events
        |WHERE event_type = 'click' AND value > 95
        |EXCEPT
        |SELECT user_id FROM events
        |WHERE event_type = 'purchase' AND value > 95
        |ORDER BY user_id""".stripMargin,
    "j14_anti_join" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "j15_semi_join" ->
      """SELECT p_partkey, p_brand FROM part p
        |WHERE EXISTS (
        |  SELECT 1 FROM lineitem l
        |  WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49)
        |ORDER BY p_partkey""".stripMargin,
    // o21: GROUPING() bitmask is identical in Spark (grouping_id)
    // and DuckDB (GROUPING(a, b)); counts cast per the HUGEINT rule.
    "o21_rollup_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*)::BIGINT AS n_orders,
        |  GROUPING(r_name, n_name)::BIGINT AS lvl
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY lvl, r_name, n_name""".stripMargin,
    "o5_topk_per_group" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(row_number() OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rk
        |FROM orders
        |QUALIFY rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,
    "a8_cube" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "a9_having" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |GROUP BY o_orderpriority
        |HAVING count(*) > (SELECT count(*) FROM orders) / 5.0
        |ORDER BY o_orderpriority""".stripMargin,
    "a10_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |  > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |     FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "o6_ntile" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(ntile(4) OVER (
        |    PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
        |FROM orders
        |ORDER BY o_orderkey""".stripMargin,
    "set_union_distinct" ->
      """SELECT user_id FROM events WHERE event_type = 'signup'
        |UNION
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,
    "a15_grouped_corr" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(floor(l_quantity) AS BIGINT)) AS sx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
        |    sum(CAST(floor(l_quantity) AS DECIMAL(9,0))
        |        * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy,
        |    sum(CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)) AS sxx,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_extendedprice AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY l_returnflag),
        |c AS (
        |  SELECT l_returnflag, n,
        |    CAST(n AS DECIMAL(19,0)) AS nd,
        |    CAST(n AS DECIMAL(10,0)) AS n2,
        |    CAST(sx AS DECIMAL(19,0)) AS sxd,
        |    CAST(sy AS DECIMAL(19,2)) AS syd,
        |    CAST(sxy AS DECIMAL(18,2)) AS sxyd,
        |    CAST(sxx AS DECIMAL(18,0)) AS sxxd,
        |    CAST(syy AS DECIMAL(22,4)) AS syyd
        |  FROM s)
        |SELECT l_returnflag, n,
        |  CAST(nd * sxyd - sxd * syd AS DOUBLE) /
        |    (sqrt(CAST(nd * sxxd - sxd * sxd AS DOUBLE)) *
        |     sqrt(CAST(n2 * syyd - syd * syd AS DOUBLE))) AS corr_qty_price
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "h1_value_histogram" ->
      """SELECT CAST(CASE WHEN value < 0 THEN 0
        |    WHEN value >= 500 THEN 21
        |    ELSE floor(value / 25.0) + 1 END AS BIGINT) AS bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a14_salted_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a11_grouping_id" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST,
        |  l_linestatus NULLS FIRST""".stripMargin,
    "a12_grouped_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS p50,
        |  quantile_cont(l_quantity, 0.95) AS p95,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "a13_argmax" ->
      """SELECT o_orderpriority, o_orderkey AS top_order,
        |  o_totalprice AS top_price
        |FROM orders
        |QUALIFY row_number() OVER (
        |  PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey DESC) = 1
        |ORDER BY o_orderpriority""".stripMargin,
    "j16_interval_overlap" ->
      """WITH p AS (
        |  SELECT event_id, user_id,
        |    ts - INTERVAL 1 HOUR AS s, ts AS e
        |  FROM events WHERE event_type = 'purchase'
        |), c AS (
        |  SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e
        |  FROM events WHERE event_type = 'click'
        |)
        |SELECT p.event_id, count(c.s) AS n_overlaps
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND p.s <= c.e AND c.s <= p.e
        |GROUP BY p.event_id
        |ORDER BY p.event_id""".stripMargin)
}
