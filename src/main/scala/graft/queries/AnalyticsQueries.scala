package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-analytics family — the standard product-analytics shapes (time
  * series gap-fill, conversion funnel, cohort retention) a team replacing
  * the reference's harness with this engine would reach for next. Each is
  * a fixed number of keyed shuffles with map-side combine; nothing holds
  * per-user state on the driver or windows over the global log.
  */
object AnalyticsQueries {

  /** O7: time-series gap-fill — per-user hourly event counts with the
    * missing hours materialized as explicit zeros between that user's
    * first and last hour (resampling; downstream models need the zeros).
    * The hour axis is generated per user with `sequence` + `explode` —
    * fan-out is span-proportional and map-side — then left-joined to the
    * observed hourly counts: two keyed shuffles total ((user) agg for the
    * span, (user, hour) join), no global calendar table, no driver loop.
    */
  def o7GapFill(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val span = e.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = span.select(col("user_id"),
      explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val cnt = e.groupBy(col("user_id"),
        date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
    hours.join(cnt, Seq("user_id", "h"), "left")
      .select(col("user_id"), unix_millis(col("h")).as("h_ms"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("user_id"), col("h_ms"))
  }

  /** F1: conversion funnel — per user: first signup, then the first
    * high-value click AFTER it, then the first high-value purchase after
    * THAT (strictly ordered steps; `value > 80` keeps the funnel
    * selective — 150 → 137 → 101 users at sf0.01 — rather than
    * everyone trivially completing). Each step is one aggregate + one
    * equi-join on user_id; no window over the event log.
    */
  def f1Funnel(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val s1 = e.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val c2 = e.filter(col("event_type") === "click" && col("value") > 80)
      .join(s1, "user_id").filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val p3 = e.filter(col("event_type") === "purchase" && col("value") > 80)
      .join(c2, "user_id").filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.join(c2, Seq("user_id"), "left").join(p3, Seq("user_id"), "left")
      .select(col("user_id"), unix_millis(col("t1")).as("t1_ms"),
        unix_millis(col("t2")).as("t2_ms"), unix_millis(col("t3")).as("t3_ms"))
      .orderBy(col("user_id"))
  }

  /** C1: cohort retention — users grouped by first-activity day (the
    * cohort), counted on each subsequent active day as a day offset.
    * Two aggregates + one join, all keyed on user_id then
    * (cohort, offset); the classic retention triangle.
    */
  def c1CohortRetention(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val cohort = e.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val active = e.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    active.join(cohort, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  private def dec(c: org.apache.spark.sql.Column) =
    c.cast(DecimalType(18, 2))

  /** A16: grouped higher moments — skewness and excess kurtosis of
    * `l_quantity` per return flag, derived from exact BIGINT power sums
    * (quantity is integral in this corpus; `floor` + cast makes the
    * integrality assumption explicit and engine-agnostic — Spark CAST
    * truncates where DuckDB rounds). The map side combines four Long
    * sums per group — the same one-shuffle shape as q1 — and the moment
    * algebra runs on the tiny grouped result in DOUBLE with the
    * identical expression tree on both engines. `pow` is deliberately
    * avoided (libm pow is not correctly rounded; `v * sqrt(v)` is).
    */
  def a16Moments(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
      .selectExpr("l_returnflag", "n",
        "CAST(s1 AS DOUBLE) / n AS m",
        "CAST(s2 AS DOUBLE) / n AS p2",
        "CAST(s3 AS DOUBLE) / n AS p3",
        "CAST(s4 AS DOUBLE) / n AS p4")
      .selectExpr("l_returnflag", "n", "m AS mean_qty",
        "p2 - m * m AS v",
        "p3 - 3 * m * p2 + 2 * m * m * m AS c3",
        "p4 - 4 * m * p3 + 6 * m * m * p2 - 3 * m * m * m * m AS c4")
      .selectExpr("l_returnflag", "n", "mean_qty",
        "v AS var_qty",
        "c3 / (v * sqrt(v)) AS skew_qty",
        "c4 / (v * v) - 3 AS kurt_qty")
      .orderBy(col("l_returnflag"))

  /** A17: grouped simple linear regression (price on quantity) — slope,
    * intercept, r² per return flag. EVERY power sum is exact (BIGINT for
    * the integral x, DECIMAL for money — double sums are
    * accumulation-order-dependent and the `n·sxy − sx·sy` cancellation
    * amplifies that ~1e-16 noise into the 10th significant digit by
    * sf1, which is exactly where the cross-engine hash broke before
    * this form). The combining arithmetic stays in DECIMAL with small
    * declared widths (so no product exceeds precision 38 and nothing
    * gets scale-truncated), and only the final ratios drop to DOUBLE —
    * one identical expression tree on both engines. The regr_slope /
    * regr_intercept / regr_r2 family without trusting either engine's
    * float-accumulation order.
    */
  def a17Regr(spark: SparkSession, d: String): DataFrame =
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
        // Width choreography, load-bearing on BOTH engines: every
        // product needs ≥ one operand wider than DECIMAL(18) or DuckDB
        // multiplies in int64 and overflows on the sum-level magnitudes
        // (observed at sf0.01 already); but too-wide operands make
        // Spark's static decimal rules truncate scale at the 38 cap.
        // These exact widths keep every product ≤ precision 38 with
        // scale preserved (exact) on both engines, with headroom to
        // ~sf10 of this corpus; past that the decimal casts fail loud
        // rather than silently rounding.
        "CAST(n AS DECIMAL(19,0)) AS nd",
        "CAST(n AS DECIMAL(10,0)) AS n2",
        "CAST(sx AS DECIMAL(19,0)) AS sxd",
        "CAST(sy AS DECIMAL(19,2)) AS syd",
        "CAST(sxy AS DECIMAL(18,2)) AS sxyd",
        "CAST(sxx AS DECIMAL(18,0)) AS sxxd",
        "CAST(syy AS DECIMAL(22,4)) AS syyd")
      .selectExpr("l_returnflag", "n",
        "CAST(nd * sxyd - sxd * syd AS DOUBLE) AS num",
        "CAST(nd * sxxd - sxd * sxd AS DOUBLE) AS denx",
        "CAST(n2 * syyd - syd * syd AS DOUBLE) AS deny",
        "CAST(sxd AS DOUBLE) AS sxdd", "CAST(syd AS DOUBLE) AS sydd")
      .selectExpr("l_returnflag", "n",
        "num / denx AS slope",
        "(sydd - num / denx * sxdd) / n AS intercept",
        "(num * num) / (denx * deny) AS r2")
      .orderBy(col("l_returnflag"))

  /** A18: deterministic grouped mode — the most frequent nation per
    * market segment, ties broken by the smaller nation key (mode is
    * nondeterministic across engines without an explicit tie-break; the
    * count + row_number formulation makes the tie-break part of the
    * semantics). One hash aggregate + one k-row window.
    */
  def a18Mode(spark: SparkSession, d: String): DataFrame = {
    val cnt = Tables.customer(spark, d)
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("n").desc, col("c_nationkey").asc)
    cnt.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("c_mktsegment"), col("c_nationkey").as("modal_nation"),
        col("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** O8: relative-rank windows — percent_rank and cume_dist of order
    * value within each priority class. Pure rank arithmetic (ratios of
    * identical integers) so the doubles are engine-identical; ties in
    * `o_totalprice` are frame-independent for both functions.
    */
  def o8PercentRank(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"))
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .orderBy(col("o_orderkey"))
  }

  /** O9: trailing time-RANGE window — per-event count and exact DECIMAL
    * sum of `value` over that user's trailing hour, the RANGE-frame
    * sibling of w4's tumbling/sliding windows. Ordering on
    * `unix_micros(ts)` keeps the frame arithmetic integral and makes
    * peer-row (tie) semantics identical across engines; one shuffle on
    * user_id, frame evaluation is a per-partition sliding scan, nothing
    * global.
    */
  def o9TrailingWindow(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_1h"),
        sum(dec(col("value"))).over(w).cast("double").as("v_1h"))
      .orderBy(col("event_id"))
  }

  /** J17: full outer join — per-customer URGENT vs LOW order counts
    * stitched with COALESCE so customers active in only one priority
    * class surface with explicit zeros. The key is deliberately
    * high-cardinality (o_custkey, not a 25-value dimension key): with
    * ~10 orders per customer over 5 priorities, a constant fraction of
    * customers lacks each class at EVERY scale factor, so both null
    * directions of the join stay exercised at sf0.001 through sf1 —
    * a bounded key would saturate and silently degrade the gate to an
    * inner join. Completes the join-type inventory next to j14 anti /
    * j15 semi / left joins elsewhere; both sides shuffle once on the
    * same key, so the outer join itself is a co-partitioned merge.
    */
  def j17FullOuter(spark: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(spark, d)
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
    val low = o.filter(col("o_orderpriority") === "5-LOW")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_low"))
    urgent.join(low, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"),
        coalesce(col("n_low"), lit(0L)).as("n_low"))
      .orderBy(col("o_custkey"))
  }

  /** M11: SCD-2 interval construction — each user's 'view' stream becomes
    * versioned rows with [valid_from, valid_to) ranges and an is_current
    * flag via `lead` over (ts, event_id) (the event_id tie-break makes
    * same-timestamp versions deterministic). The standard warehouse
    * dimension-versioning shape: one shuffle on the entity key, then a
    * per-partition ordered scan.
    */
  def m11Scd2(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        unix_millis(col("ts")).as("valid_from_ms"),
        unix_millis(col("valid_to")).as("valid_to_ms"),
        col("valid_to").isNull.as("is_current"),
        col("value"))
      .orderBy(col("user_id"), col("valid_from_ms"), col("event_id"))
  }

  /** O10: frame-bound window functions — first_value / last_value /
    * nth_value over the FULL partition frame (ROWS BETWEEN UNBOUNDED
    * PRECEDING AND UNBOUNDED FOLLOWING; last_value under the default
    * frame is the famous current-row trap, so the explicit frame IS the
    * semantics being pinned). Ordering on the unique o_orderkey makes
    * every value deterministic; values pass through untouched, so the
    * doubles are engine-identical.
    */
  def o10FrameBounds(spark: SparkSession, d: String): DataFrame = {
    val full = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        first(col("o_totalprice")).over(full).as("fv"),
        last(col("o_totalprice")).over(full).as("lv"),
        nth_value(col("o_totalprice"), 3).over(full).as("nv"))
      .orderBy(col("o_orderkey"))
  }

  /** H2: column profiling — the schema-audit pass every ingestion
    * pipeline runs before choosing filters: per column, row count, null
    * count, exact distinct count, min and max (rendered as strings so
    * heterogeneous columns stack into one result). One aggregate scan
    * computes every stat (count/countDistinct are map-side combined);
    * the stack to rows happens on the single result row.
    */
  def h2Profile(spark: SparkSession, d: String): DataFrame =
    Tables.orders(spark, d)
      .agg(count(lit(1)).as("n"),
        count(col("o_totalprice")).as("nn_price"),
        countDistinct(col("o_totalprice")).as("ndv_price"),
        min(col("o_totalprice")).cast("string").as("min_price"),
        max(col("o_totalprice")).cast("string").as("max_price"),
        count(col("o_orderstatus")).as("nn_status"),
        countDistinct(col("o_orderstatus")).as("ndv_status"),
        min(col("o_orderstatus")).as("min_status"),
        max(col("o_orderstatus")).as("max_status"),
        count(col("o_orderdate")).as("nn_date"),
        countDistinct(col("o_orderdate")).as("ndv_date"),
        min(to_date(col("o_orderdate"))).cast("string").as("min_date"),
        max(to_date(col("o_orderdate"))).cast("string").as("max_date"))
      .selectExpr(
        """stack(3,
          |  'o_totalprice', n, n - nn_price, ndv_price, min_price, max_price,
          |  'o_orderstatus', n, n - nn_status, ndv_status, min_status, max_status,
          |  'o_orderdate', n, n - nn_date, ndv_date, min_date, max_date)
          |AS (col_name, n, n_null, ndv, min_s, max_s)""".stripMargin)
      .orderBy(col("col_name"))

  /** A32: PSI drift monitor (population stability index — the standard
    * production check for "has this source's distribution moved away
    * from the reference?"): decile bins come from the src0 REFERENCE
    * block's exact n_chars quantiles (the d9/d35/d40 split), every
    * source's length distribution is binned against them, and
    * PSI = Σ (q_i − p_i)·ln(q_i / p_i) per source. Counts smooth by
    * +0.5 per bin (n + 5 per source) so an empty bin contributes a
    * finite term instead of ln(0) — deterministic, engine-identical,
    * and src0 vs itself reads exactly 0. Conventional read: <0.1
    * stable, 0.1–0.25 drifting, >0.25 shifted.
    *
    * Scale shape: ONE exact-percentile aggregate over the reference
    * (the a4 idiom) produces 9 boundaries broadcast as a 1-row array;
    * binning is a scan-stage `filter(bs, b -> b <= x)` count; the rest
    * is a (source × 10)-key count with map-side combine joined to a
    * sources × bins scaffold — nothing data-sized moves after the
    * first aggregate.
    */
  def a32PsiDrift(spark: SparkSession, d: String): DataFrame =
    psiDrift(Tables.documents(spark, d)).orderBy(col("source"))

  /** The a32 operator body over any (source, n_chars) frame —
    * `refSource` is the reference block whose deciles define the bins.
    */
  def psiDrift(docs: DataFrame, refSource: String = "src0"): DataFrame = {
    val bs = docs.filter(col("source") === refSource)
      .agg(percentile(col("n_chars"), typedlit(
        (1 to 9).map(_ / 10.0))).as("bs"))
    val binned = docs.crossJoin(broadcast(bs))
      .select(col("source"),
        (size(expr("filter(bs, b -> b <= n_chars)")) + 1).as("bin"))
    // Cached: sources × 10 rows — totals and the scaffold derive from
    // it, so the corpus is binned exactly once (uncached, each consumer
    // re-ran the scan+bin pass).
    val cnts = graft.CacheRegistry.register(
      binned.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).as("c")).cache())
    val tots = cnts.groupBy(col("source")).agg(sum(col("c")).as("n"))
    val scaffold = tots
      .select(col("source"), col("n"),
        explode(expr("sequence(1, 10)")).as("bin"))
    val filled = scaffold.join(cnts, Seq("source", "bin"), "left")
      .select(col("source"), col("bin"),
        ((coalesce(col("c"), lit(0L)).cast("double") + lit(0.5)) /
          (col("n").cast("double") + lit(5.0))).as("q"))
    val ref = filled.filter(col("source") === refSource)
      .select(col("bin"), col("q").as("p"))
    filled.join(broadcast(ref), "bin")
      .groupBy(col("source"))
      .agg(round(sum((col("q") - col("p")) * log(col("q") / col("p"))), 6)
        .as("psi"))
  }

  /** H3: declarative constraint audit (the Deequ/Great-Expectations
    * shape) — one row per data-quality rule with exact checked/violation
    * counts: range, null, domain-membership, consistency, and key-
    * uniqueness rules over `events`/`documents`, plus a referential-
    * integrity probe (events.user_id → customer). Per table the rules
    * collapse into ONE map-side-combined aggregate scan (conditional
    * BIGINT sums — Spark never shuffles the rows, only the handful of
    * counters); uniqueness adds the unavoidable exact-distinct shuffle;
    * the FK probe is a broadcast left-join null-count, never a
    * per-row IN. All outputs are exact integers — no cross-engine float
    * risk — and the `value` range rule is deliberately non-vacuous
    * (~13% of events fall outside [0,100]) so the gate pins real
    * violation arithmetic, not a column of zeros.
    */
  def h3Constraints(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val doc = Tables.documents(spark, d)
    val ev = e.agg(count(lit(1)).as("n"),
        sum(when(col("value") < 0 || col("value") > 100, 1L)
          .otherwise(0L)).as("v_range"),
        sum(when(col("ts").isNull, 1L).otherwise(0L)).as("v_ts"),
        countDistinct(col("event_id")).as("ndv_id"))
      .selectExpr(
        """stack(3,
          |  'ev_value_in_0_100', n, v_range,
          |  'ev_ts_not_null', n, v_ts,
          |  'ev_event_id_unique', n, n - ndv_id)
          |AS (rule, checked, violations)""".stripMargin)
    val dc = doc.agg(count(lit(1)).as("n"),
        sum(when(!col("lang").isin("de", "en", "es", "fr", "zh"), 1L)
          .otherwise(0L)).as("v_lang"),
        sum(when(col("n_chars") =!= length(col("text")), 1L)
          .otherwise(0L)).as("v_len"),
        countDistinct(col("doc_id")).as("ndv_id"))
      .selectExpr(
        """stack(3,
          |  'doc_lang_known', n, v_lang,
          |  'doc_nchars_consistent', n, v_len,
          |  'doc_id_unique', n, n - ndv_id)
          |AS (rule, checked, violations)""".stripMargin)
    val fk = e.join(
        broadcast(Tables.customer(spark, d)
          .select(col("c_custkey").as("user_id"), lit(1L).as("__hit"))),
        Seq("user_id"), "left")
      .agg(count(lit(1)).as("checked"),
        sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("violations"))
      .select(lit("ev_user_fk_customer").as("rule"), col("checked"),
        col("violations"))
    ev.unionByName(dc).unionByName(fk).orderBy(col("rule"))
  }

  /** O17: exact rolling median — per-user median of `value` over the
    * trailing 10 events (ties broken by event_id so the frame is total).
    * Spark has no exact `median` window function, so the bounded frame is
    * materialized per row (`collect_list` over ROWS BETWEEN 9 PRECEDING)
    * and the median taken positionally on the sorted array — avg of the
    * two middles on even counts, exactly DuckDB's `quantile_cont(0.5)`
    * interpolation at the midpoint. Cost is O(w) state per row with
    * w = 10 FIXED by the frame — the work is frame-proportional, not
    * corpus-proportional, so the shape survives scale; `round(·, 4)`
    * absorbs the one legal fp divergence (DuckDB interpolates as
    * a + (b−a)·0.5, we average — ≤1 ulp apart on 2-decimal inputs).
    */
  def o17RollingMedian(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id")).rowsBetween(-9, 0)
    Tables.events(spark, d)
      .select(col("event_id"),
        sort_array(collect_list(col("value")).over(w)).as("vals"))
      .select(col("event_id"),
        round(expr("""(element_at(vals, int((size(vals) + 1) div 2))
          + element_at(vals, int(size(vals) div 2) + 1)) / 2"""), 4)
          .as("med"))
      .orderBy(col("event_id"))
  }

  /** O11: per-user exponential moving average (alpha 0.3) over the event
    * stream — the classic time-series smoothing feature. EWMA is a
    * left fold (s_i = a·x_i + (1−a)·s_{i−1}, seeded s_1 = x_1), which no
    * fixed window frame expresses, so the per-user sequence is assembled
    * once (`collect_list` of (ts, event_id, value) structs, `array_sort`
    * pinning the fold order totally — event_id breaks ts ties) and folded
    * with the higher-order `aggregate`, null-seeded so the first element
    * becomes the seed exactly like the oracle's `list_reduce`. Both
    * engines then execute the identical chain of double ops in the
    * identical order — bit-reproducible, no rounding needed. One keyed
    * shuffle; per-key state is events-per-user (bounded by the busiest
    * key, not the corpus — the same class as the r3 path list). At 100 TB
    * with pathological keys the same fold runs as a segmented scan:
    * repartition by user + sortWithinPartitions + mapPartitions carries
    * the accumulator row-to-row with O(1) state and zero collect.
    */
  def o11Ewma(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(
        unix_micros(col("ts")).as("t"), col("event_id").as("i"),
        col("value").as("v")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n_events"),
        aggregate(col("seq"), lit(null).cast("double"),
          (acc, x) => when(acc.isNull, x.getField("v"))
            .otherwise(lit(0.3) * x.getField("v") + lit(0.7) * acc))
          .as("ewma"))
      .orderBy(col("user_id"))

  /** A19: 2-D skyline (Pareto frontier) — lineitem points maximizing
    * both quantity and extended price; a point survives iff no other
    * point is ≥ in both dimensions and > in at least one. The textbook
    * formulation is an all-pairs NOT EXISTS anti-join (the oracle runs
    * exactly that) — quadratic, hopeless at scale. The engine instead
    * uses the monotone sweep: group to per-x max-y (one keyed shuffle,
    * map-side combined), then a running strict-prefix max over x
    * descending — a point's x-group survives iff its max-y strictly
    * exceeds every max-y at larger x (strictly: an equal y at larger x
    * dominates), and within the group exactly the max-y rows survive.
    * The global window orders |distinct x| rows (dimension-bounded,
    * ~50 here — never data-bounded), and the survivor set joins back
    * broadcast. Total cost: one data-sized aggregate; the all-pairs
    * compare is gone.
    */
  def a19Skyline(spark: SparkSession, d: String): DataFrame =
    skyline(Tables.lineitem(spark, d)
        .select(floor(col("l_quantity")).cast("long").as("x"),
          col("l_extendedprice").as("y")))
      .orderBy(col("x"))

  /** The monotone-sweep skyline over arbitrary (x, y) points (both
    * maximized): per-x max-y aggregate → strict-prefix running max over
    * x descending (|distinct x| rows) → broadcast survivor join.
    * Returns (x, y, n) — frontier points with multiplicity; equal
    * points do not dominate each other, so duplicates of a frontier
    * point all survive (n > 1), while an equal y at strictly larger x
    * DOES dominate (strict `>` against the prefix max).
    */
  def skyline(points: DataFrame): DataFrame = {
    val g = points.groupBy(col("x"), col("y")).agg(count(lit(1)).as("n"))
    val perX = g.groupBy(col("x")).agg(max(col("y")).as("maxy"))
    val sweep = Window.orderBy(col("x").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val sky = perX
      .withColumn("above", max(col("maxy")).over(sweep))
      .filter(col("above").isNull || col("maxy") > col("above"))
    g.join(broadcast(sky), "x")
      .filter(col("y") === col("maxy"))
      .select(col("x"), col("y"), col("n"))
  }

  /** O12: gap-fill with LINEAR INTERPOLATION — o7's hour axis, but the
    * missing hours get the straight line between the surrounding
    * observed hourly sums instead of zeros (resampling for models that
    * need a continuous signal, not a count). The hourly sums go through
    * exact DECIMAL(18,2) per the determinism discipline; each
    * interpolated value is then THREE double ops (sub, mul-by-ratio,
    * add) on exact inputs in an identical tree on both engines. The
    * neighbor lookup is `last/first(…, ignoreNulls)` over asymmetric
    * frames carrying (hour, value) in ONE struct — the AsOfJoin lesson:
    * per-column ignoreNulls would stitch fields from different rows.
    * Both window frames share one partitioning+ordering, so Spark plans
    * a single window exchange; span endpoints are observed by
    * construction, so no null survives.
    */
  def o12Interp(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val span = e.groupBy(col("user_id"))
      .agg(date_trunc("hour", min(col("ts"))).as("lo"),
        date_trunc("hour", max(col("ts"))).as("hi"))
    val hours = span.select(col("user_id"),
      explode(expr("sequence(lo, hi, interval 1 hour)")).as("h"))
    val obs = e.groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(dec(col("value"))).cast("double").as("v"))
    val axis = hours.join(obs, Seq("user_id", "h"), "left")
      .select(col("user_id"), unix_millis(col("h")).as("h_ms"), col("v"))
    val byHour = Window.partitionBy(col("user_id")).orderBy(col("h_ms"))
    val obsPoint =
      when(col("v").isNotNull, struct(col("h_ms").as("h"), col("v").as("v")))
    axis
      .withColumn("pv", last(obsPoint, ignoreNulls = true)
        .over(byHour.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("nv", first(obsPoint, ignoreNulls = true)
        .over(byHour.rowsBetween(1, Window.unboundedFollowing)))
      .select(col("user_id"), col("h_ms"),
        when(col("v").isNotNull, col("v")).otherwise(
          col("pv.v") + (col("nv.v") - col("pv.v")) *
            ((col("h_ms") - col("pv.h")) /
              (col("nv.h") - col("pv.h")).cast("double"))).as("v"))
      .orderBy(col("user_id"), col("h_ms"))
  }

  /** O13: sliding distinct count — per event, how many DISTINCT users
    * were active for this event type in the trailing hour. Distinct
    * aggregates have no incremental window form, so Spark evaluates
    * `size(collect_set)` over the range frame — O(frame) per row,
    * fine when frames are duration-bounded (an hour of one event
    * type); the 100 TB form for unbounded frames is the first-seen
    * flag + windowed sum decomposition. One window exchange keyed on
    * event_type; the frame is RANGE over epoch-micros so ts ties land
    * in every tied row's frame identically in both engines.
    */
  def o13WindowDistinct(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(unix_micros(col("ts")))
      .rangeBetween(-3600000000L, 0L)
    Tables.events(spark, d)
      .select(col("event_id"),
        size(collect_set(col("user_id")).over(w)).cast("long").as("n_dist"))
      .orderBy(col("event_id"))
  }

  /** A22: Welch two-sample t-statistic — is the mean `value` of clicks
    * different from purchases? The A/B-test primitive an analytics
    * engine owes its users. The per-group sums go through the exact-sum
    * discipline: value has 2 decimals, so `round(value·100)` is an
    * exact BIGINT and its sum/sum-of-squares are exact integers (one
    * map-side-combined aggregate scan, no joins); mean, variance, and
    * the t-statistic then derive in DOUBLE through an expression tree
    * identical on both engines — cross-engine bit-equality without any
    * rounding band, the a16/a17 discipline applied to inference.
    */
  def a22WelchT(spark: SparkSession, d: String): DataFrame = {
    val v100 = round(col("value") * 100).cast("long")
    Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(v100).as("s1"),
        sum(v100 * v100).as("s2"))
      .agg(
        max(when(col("event_type") === "click", col("n"))).as("n1"),
        max(when(col("event_type") === "purchase", col("n"))).as("n2"),
        max(when(col("event_type") === "click", col("s1"))).as("a1"),
        max(when(col("event_type") === "purchase", col("s1"))).as("b1"),
        max(when(col("event_type") === "click", col("s2"))).as("a2"),
        max(when(col("event_type") === "purchase", col("s2"))).as("b2"))
      .selectExpr("n1", "n2",
        "CAST(a1 AS DOUBLE)/n1/100 - CAST(b1 AS DOUBLE)/n2/100 AS mean_diff",
        """(CAST(a1 AS DOUBLE)/n1/100 - CAST(b1 AS DOUBLE)/n2/100) /
          |sqrt(((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE)*a1/n1)/(n1-1)/10000)/n1
          |   + ((CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE)*b1/n2)/(n2-1)/10000)/n2)
          |AS t_stat""".stripMargin)
  }

  /** A23: 2×2 chi-squared independence — does high value (>50) depend
    * on event type (click vs purchase)? The categorical counterpart to
    * a22's t-test, closing the basic-inference pair. The contingency
    * cells are exact BIGINT counts from ONE aggregate scan; the
    * statistic uses the closed 2×2 form N(ad−bc)²/((a+b)(c+d)(a+c)(b+d))
    * in DOUBLE through an identical tree on both engines — bit-equal.
    */
  def a23ChiSquared(spark: SparkSession, d: String): DataFrame = {
    def cell(t: String, hi: Boolean) = sum(
      when(col("event_type") === t &&
        (if (hi) col("value") > 50 else col("value") <= 50), 1L)
        .otherwise(0L))
    Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .agg(cell("click", hi = true).as("a"), cell("click", hi = false).as("b"),
        cell("purchase", hi = true).as("c"),
        cell("purchase", hi = false).as("d"))
      .selectExpr("a", "b", "c", "d",
        """CAST(a+b+c+d AS DOUBLE) * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c)
          |  * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c)
          |  / ((a+b) * CAST(c+d AS DOUBLE) * (a+c) * (b+d)) AS chi2""".stripMargin)
  }

  /** A24: mutual information between event type (click/purchase) and the
    * high-value indicator (>50) — the information-theoretic sibling of
    * a23's chi-squared over the same 2×2 contingency table. Cells are
    * exact BIGINT counts from ONE map-side-combined aggregate scan;
    * MI = Σ (n/N)·ln(n·N/(r·c)) is then written as four literal terms
    * in a fixed order, so the DOUBLE tree is identical on both engines
    * (ln ulp differences are absorbed by the gate's 10-significant-digit
    * normalization). Four scalars leave the executors; trivially
    * scale-safe.
    */
  def a24MutualInfo(spark: SparkSession, d: String): DataFrame = {
    def cell(t: String, hi: Boolean) = sum(
      when(col("event_type") === t &&
        (if (hi) col("value") > 50 else col("value") <= 50), 1L)
        .otherwise(0L))
    val term = (n: String, r: String, c: String) =>
      s"""CASE WHEN $n = 0 THEN 0.0 ELSE
         | (CAST($n AS DOUBLE) / nn)
         |   * ln(CAST($n AS DOUBLE) * nn / (CAST($r AS DOUBLE) * ($c)))
         | END""".stripMargin
    Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .agg(cell("click", hi = true).as("a"), cell("click", hi = false).as("b"),
        cell("purchase", hi = true).as("c"),
        cell("purchase", hi = false).as("d"))
      .selectExpr("a", "b", "c", "d", "CAST(a+b+c+d AS DOUBLE) AS nn")
      .selectExpr("a", "b", "c", "d",
        s"""${term("a", "a+b", "a+c")} + ${term("b", "a+b", "b+d")}
           | + ${term("c", "c+d", "a+c")} + ${term("d", "c+d", "b+d")}
           | AS mi""".stripMargin)
  }

  /** A29: entropy decomposition over the SAME 2×2 table as a24 — H(X),
    * H(X|Y), and the identity MI = H(X) − H(X|Y), so the gate pins not
    * one number but the information-theoretic algebra connecting it to
    * `a24_mutual_info` (both engines must land the identity on the same
    * exact integer cells). One conditional-sum scan; four BIGINTs leave
    * the executors; the DOUBLE tree is identical on both engines and
    * every log sits behind a zero-cell CASE guard.
    */
  def a29Entropy(spark: SparkSession, d: String): DataFrame = {
    def cell(t: String, hi: Boolean) = sum(
      when(col("event_type") === t &&
        (if (hi) col("value") > 50 else col("value") <= 50), 1L)
        .otherwise(0L))
    def plogp(n: String) =
      s"CASE WHEN $n = 0 THEN 0.0 ELSE (CAST($n AS DOUBLE) / nn)" +
        s" * ln(CAST($n AS DOUBLE) / nn) END"
    // H(X|Y=y) contribution of cell n within condition total t:
    // -(n/nn) * ln(n/t)  (weights fold in the p(y) factor exactly).
    def cond(n: String, t: String) =
      s"CASE WHEN $n = 0 THEN 0.0 ELSE (CAST($n AS DOUBLE) / nn)" +
        s" * ln(CAST($n AS DOUBLE) / ($t)) END"
    Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .agg(cell("click", hi = true).as("a"), cell("click", hi = false).as("b"),
        cell("purchase", hi = true).as("c"),
        cell("purchase", hi = false).as("d"))
      .selectExpr("a", "b", "c", "d", "CAST(a+b+c+d AS DOUBLE) AS nn")
      .selectExpr("a", "b", "c", "d",
        s"-(${plogp("a+b")} + ${plogp("c+d")}) AS hx",
        s"""-(${cond("a", "CAST(a+c AS DOUBLE)")}
           | + ${cond("c", "CAST(a+c AS DOUBLE)")}
           | + ${cond("b", "CAST(b+d AS DOUBLE)")}
           | + ${cond("d", "CAST(b+d AS DOUBLE)")}) AS hx_given_y"""
          .stripMargin.replace("\n", " "))
      .selectExpr("a", "b", "c", "d", "hx", "hx_given_y",
        "hx - hx_given_y AS mi")
  }

  /** A30: two-sample Kolmogorov–Smirnov statistic — the distributional
    * counterpart to a22's mean test: D = max_v |F̂_click(v) − F̂_purchase(v)|
    * over the click vs purchase `value` distributions. The event log
    * first collapses to the per-distinct-value HISTOGRAM (exact BIGINT
    * conditional counts, one keyed shuffle with map-side combine) —
    * bounded by the value DOMAIN, not the corpus — then the two ECDFs
    * are built with [[graft.operators.PrefixSum]] (range exchange +
    * per-partition offsets: the distributed prefix sum; a bare
    * Window.orderBy cumsum would be the single-task cliff). D is a max
    * over identical exact-integer ratios — order-independent, so the
    * gate needs no rounding band.
    */
  def a30Ks(spark: SparkSession, d: String): DataFrame = {
    val g = Tables.events(spark, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("value").as("v"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("c1"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("c2"))
    val cum = graft.operators.PrefixSum.running(
      g, Seq(col("v").asc), Seq("c1", "c2"))
    val t = g.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(t))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(col("c1_cum").cast("double") / col("n1") -
          col("c2_cum").cast("double") / col("n2"))).as("d"))
  }

  /** C2: RFM segmentation — the classic customer-value composite:
    * recency (days since last order vs corpus max), frequency (order
    * count), monetary (exact cents), each quartile-banded, then counted
    * per (R,F,M) segment. The three global ranks run through
    * [[graft.operators.GlobalRank]] (range exchange + zipWithIndex —
    * never a single-task Window.orderBy over all customers), and the
    * band is derived from the rank with the ntile SIZE formula (first
    * n%k buckets take one extra row) written identically in both
    * engines — quartile semantics by shared arithmetic, not by trusting
    * two ntile() implementations to agree. All outputs exact BIGINTs.
    */
  def c2Rfm(spark: SparkSession, d: String): DataFrame = {
    val per = Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val corpus = per.agg(max(col("last_day")).as("corpus_day"),
      count(lit(1)).as("n"))
    // Only plain longs cross the GlobalRank RDD hop (a DATE column would
    // round-trip through java.sql.Date — wider rows and a JDK-module
    // access trap under manual JVM launches).
    val base = per.crossJoin(broadcast(corpus))
      .select(col("o_custkey"),
        datediff(col("corpus_day"), col("last_day")).cast("long")
          .as("recency"),
        col("freq"), col("cents"), col("n"))
    import graft.operators.GlobalRank
    val ranked = GlobalRank.rowNumber(
      GlobalRank.rowNumber(
        GlobalRank.rowNumber(base,
          Seq(col("recency").asc, col("o_custkey").asc), "rn_r"),
        Seq(col("freq").desc, col("o_custkey").asc), "rn_f"),
      Seq(col("cents").desc, col("o_custkey").asc), "rn_m")
    def band(rn: String) =
      s"""CASE WHEN $rn <= (n % 4) * ((n div 4) + 1)
         | THEN ($rn - 1) div ((n div 4) + 1) + 1
         | ELSE (n % 4) + ($rn - (n % 4) * ((n div 4) + 1) - 1) div (n div 4)
         |   + 1 END""".stripMargin.replace("\n", " ")
    ranked
      .selectExpr(s"${band("rn_r")} AS r_band", s"${band("rn_f")} AS f_band",
        s"${band("rn_m")} AS m_band", "cents")
      .groupBy(col("r_band"), col("f_band"), col("m_band"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("total_cents"))
      .orderBy(col("r_band"), col("f_band"), col("m_band"))
  }

  /** A31: lag-1 autocorrelation of the global hourly event-count series
    * — the time-series memory check (traffic persistence) beside o11's
    * smoothing and o14's transition matrix. The series is the hourly
    * histogram (domain-bounded, ~720 rows), the lag pairing is an
    * equi-join on hour+1 (no window), and the Pearson form runs on
    * exact BIGINT sums — counts are integers, so the only doubles are
    * the final closed-form divisions, identical on both engines.
    */
  def a31Autocorr(spark: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(spark, d)
      .groupBy((unix_millis(date_trunc("hour", col("ts"))) / 3600000L)
        .cast("long").as("h"))
      .agg(count(lit(1)).as("n"))
    val nxt = hourly.select((col("h") - 1).as("h"), col("n").as("n1"))
    hourly.join(nxt, "h")
      .agg(count(lit(1)).as("m"), sum(col("n")).as("sx"),
        sum(col("n1")).as("sy"), sum(col("n") * col("n1")).as("sxy"),
        sum(col("n") * col("n")).as("sxx"),
        sum(col("n1") * col("n1")).as("syy"))
      .selectExpr("m",
        """(CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          | / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          |    * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
          | AS autocorr""".stripMargin.replace("\n", " "))
  }

  /** O20: CUSUM change-point detection — the sequential drift alarm
    * (Page's cumulative sum): per user, s_i = max(0, s_{i−1} + (v_i −
    * 60)) with an alarm + reset whenever s crosses 150. Like o11/o18
    * this is an order-dependent fold no window frame expresses; the
    * per-user sequence folds once with the higher-order `aggregate`
    * over a struct accumulator (fine in SPARK — it is DuckDB's
    * list_reduce that mis-executes struct accumulators, so the oracle
    * uses the o18 recursive-CTE form). All constants are
    * exactly-representable doubles; both engines run the identical
    * IEEE chain — no rounding band on the alarm count, round-6 on the
    * residual s.
    */
  def o20Cusum(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(
        unix_micros(col("ts")).as("t"), col("event_id").as("i"),
        col("value").as("v")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n_events"),
        expr("""aggregate(seq, named_struct('s', 0.0D, 'a', 0L),
          | (acc, x) -> named_struct(
          |   's', IF(greatest(0.0D, acc.s + (x.v - 60.0D)) > 150.0D,
          |           0.0D, greatest(0.0D, acc.s + (x.v - 60.0D))),
          |   'a', acc.a + IF(greatest(0.0D, acc.s + (x.v - 60.0D))
          |           > 150.0D, 1L, 0L)))""".stripMargin.replace("\n", " "))
          .as("st"))
      .select(col("user_id"), col("n_events"),
        col("st.a").as("n_alarms"), round(col("st.s"), 6).as("residual_s"))
      .orderBy(col("user_id"))

  /** O14: event-transition matrix — for each user's time-ordered event
    * stream, count (event_type → next event_type) transitions and the
    * per-source transition probability: the first-order Markov summary
    * behind session modeling and next-event prediction. ONE window
    * exchange keyed on user_id (`lead` needs only sorted runs, no
    * frame state), then an aggregation whose cardinality is
    * |types|² — the shuffle after the window carries at most 25 keys'
    * partial counts per task at any corpus size. Ties on ts break on
    * the unique event_id so the successor choice is engine-independent;
    * `p` is a single BIGINT/BIGINT division in DOUBLE — bit-equal.
    */
  def o14Transitions(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") /
        sum(col("n")).over(Window.partitionBy(col("event_type")))
          .cast("double"))
      .orderBy(col("event_type"), col("next_type"))
  }

  /** A25: frequent co-occurring part pairs across orders
    * ([[graft.pipeline.Itemsets.frequentPairs]]) — the market-basket
    * 2-itemset primitive with the apriori item prune applied BEFORE the
    * basket self-join. The oracle computes the unpruned definition, so
    * hash equality proves the prune is lossless, not just faster.
    */
  def a25FrequentPairs(spark: SparkSession, d: String): DataFrame =
    graft.pipeline.Itemsets.frequentPairs(Tables.lineitem(spark, d),
        "l_orderkey", "l_partkey", minSupport = 2L)
      .withColumnRenamed("item_a", "part_a")
      .withColumnRenamed("item_b", "part_b")
      .orderBy(col("part_a"), col("part_b"))

  /** D28: robust outlier detection — the modified z-score
    * 0.6745·(x−median)/MAD per event type, flagging |score| > 3.5 (the
    * Iglewicz–Hoaglin rule). Median and MAD come from the exact
    * interpolated `percentile` (the a4-pinned cross-engine parity), so
    * the cutoff comparison evaluates an identical DOUBLE tree on both
    * engines. Mean/stddev z-scores (d21) move with the outliers they
    * hunt; the median/MAD pair doesn't — this is the version a curation
    * pipeline can safely automate. Two grouped aggregates + one
    * broadcast-sized stats join back to the fact scan.
    */
  def d28MadOutliers(spark: SparkSession, d: String): DataFrame = {
    val e = Tables.events(spark, d)
    val med = e.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val stats = e.join(med, "event_type")
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"),
        expr("percentile(abs(value - med), 0.5)").as("mad"))
    e.join(broadcast(stats), "event_type")
      .withColumn("score",
        lit(0.6745) * (col("value") - col("med")) / col("mad"))
      .filter(abs(col("score")) > 3.5)
      .select(col("event_id"), col("event_type"), col("value"), col("score"))
      .orderBy(col("event_id"))
  }

  /** O15: cumulative distinct users per event type — the first-seen-flag
    * decomposition o13's scaladoc promises as the 100 TB form of an
    * unbounded distinct window. `count(DISTINCT)` over an unbounded
    * frame holds O(frame) state per ROW; this rewrite is two
    * incremental windows instead: a (type, user)-keyed `row_number`
    * marks each user's first event (O(1) per row), then a type-keyed
    * running SUM of the flag — a subtractable aggregate the runtime
    * streams in O(1). The oracle runs the definitional distinct window
    * in DuckDB, so hash equality proves the decomposition, not just
    * resemblance. Ties order on the unique event_id in both engines.
    */
  def o15CumDistinct(spark: SparkSession, d: String): DataFrame = {
    val firstSeen = Window.partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val running = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .withColumn("first_seen",
        when(row_number().over(firstSeen) === 1, 1L).otherwise(0L))
      .select(col("event_id"),
        sum(col("first_seen")).over(running).as("n_dist"))
      .orderBy(col("event_id"))
  }

  /** A26: Benford first-digit screening over order totals — the
    * data-quality test auditors run against fabricated numeric columns.
    * Per leading digit d: the exact BIGINT count, the observed share,
    * and Benford's expected log10(1+1/d) — one scan + one 9-key
    * aggregate; every DOUBLE derives per-row from exact integers
    * through an identical tree (no cross-row float accumulation at
    * all), so the gate compares full precision.
    */
  def a26Benford(spark: SparkSession, d: String): DataFrame = {
    val digit = substring(floor(col("o_totalprice")).cast("string"), 1, 1)
    val counted = Tables.orders(spark, d)
      .filter(col("o_totalprice") >= 1)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = counted.agg(sum(col("n")).as("tot"))
    counted.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("tot")).as("p"),
        log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
          .as("benford_p"))
      .orderBy(col("digit"))
  }

  /** A27: Gini concentration of customer spend — the inequality summary
    * over any "how concentrated is X across Y" question. Needs every
    * value's GLOBAL rank, which is exactly the operator d26 introduced
    * ([[graft.operators.GlobalRank.rowNumber]] — range exchange +
    * offsets, never a single-task window). Spend per customer sums in
    * exact cents (round(·100) BIGINT — the a22 discipline), ranks are
    * exact longs, and G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) evaluates in
    * DOUBLE from three exact BIGINTs through one identical tree.
    */
  def a27Gini(spark: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val ranked = graft.operators.GlobalRank.rowNumber(
      spend, Seq(col("cents"), col("o_custkey")), "rk")
    ranked.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"),
        sum(col("rk") * col("cents")).as("rs"))
      .selectExpr("n", "s AS total_cents",
        """(2.0 * rs - (CAST(n AS DOUBLE) + 1) * s)
          | / (CAST(n AS DOUBLE) * s) AS gini""".stripMargin)
  }

  /** O16: event-sequence pattern detection (MATCH_RECOGNIZE-lite / CEP
    * in batch form) — every occurrence of the consecutive pattern
    * click → click → purchase inside one user's time-ordered stream,
    * with the span it took. ONE user-keyed window exchange; the
    * pattern test is two `lead`s over the sorted run (O(1) per row, no
    * frame state), so the cost is the sort the sessionized stream
    * needs anyway. Ties order on event_id — engine-exact matches.
    */
  def o16SeqPattern(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts"),
        lead(col("event_type"), 1).over(w).as("t2"),
        lead(col("event_type"), 2).over(w).as("t3"),
        lead(col("event_id"), 2).over(w).as("e3"),
        lead(col("ts"), 2).over(w).as("ts3"))
      .filter(col("event_type") === "click" && col("t2") === "click" &&
        col("t3") === "purchase")
      .select(col("user_id"), col("event_id").as("e1"), col("e3"),
        (unix_micros(col("ts3")) - unix_micros(col("ts"))).as("span_us"))
      .orderBy(col("user_id"), col("e1"))
  }

  /** A28: jackknife standard error of the mean — delete-one-block over
    * 10 deterministic key blocks (l_orderkey % 10): per-block exact
    * integer sums, each leave-one-out mean derives as
    * (S − s_b)/(N − n_b), and the jackknife variance
    * (B−1)/B · Σ(m_b − m̄)² evaluates over the 10-row block table. The
    * uncertainty-quantification primitive that needs NO resampling
    * passes — one aggregate scan, then arithmetic on 10 rows; the only
    * cross-engine surface is a 10-term DOUBLE sum under the gate's
    * 10-significant-digit normalization.
    */
  def a28Jackknife(spark: SparkSession, d: String): DataFrame = {
    val q100 = round(col("l_quantity") * 100).cast("long")
    val blocks = Tables.lineitem(spark, d)
      .groupBy((col("l_orderkey") % 10).as("b"))
      .agg(count(lit(1)).as("n_b"), sum(q100).as("s_b"))
    val tot = blocks.agg(sum(col("n_b")).as("n"), sum(col("s_b")).as("s"))
    // Deviations are taken EXPLICITLY against a precomputed m̄ — the
    // one-pass Σm² − B·m̄² form cancels ~10 significant digits here
    // (block means all sit within ~1e-3 of each other) and would break
    // the cross-engine hash; squared small deviations do not cancel.
    val withM = blocks.crossJoin(broadcast(tot))
      .withColumn("m_b", (col("s") - col("s_b")).cast("double") /
        (col("n") - col("n_b")) / 100.0)
    val mbar = withM.agg(avg(col("m_b")).as("mbar"))
    withM.crossJoin(broadcast(mbar))
      .agg(max(col("n")).as("n"),
        (max(col("s")).cast("double") / max(col("n")) / 100.0).as("mean"),
        count(lit(1)).as("nblocks"),
        sum((col("m_b") - col("mbar")) * (col("m_b") - col("mbar")))
          .as("ss"))
      .selectExpr("n", "mean",
        """sqrt((CAST(nblocks AS DOUBLE) - 1) / nblocks * ss)
          | AS jk_se""".stripMargin)
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o16_seq_pattern" -> o16SeqPattern,
    "a28_jackknife" -> a28Jackknife,
    "a26_benford" -> a26Benford,
    "a27_gini" -> a27Gini,
    "o15_cum_distinct" -> o15CumDistinct,
    "a25_frequent_pairs" -> a25FrequentPairs,
    "d28_mad_outliers" -> d28MadOutliers,
    "a24_mutual_info" -> a24MutualInfo,
    "o14_transitions" -> o14Transitions,
    "o11_ewma" -> o11Ewma,
    "o12_interp" -> o12Interp,
    "o13_window_distinct" -> o13WindowDistinct,
    "a22_welch_t" -> a22WelchT,
    "a23_chi_squared" -> a23ChiSquared,
    "a19_skyline" -> a19Skyline,
    "o7_gapfill" -> o7GapFill,
    "f1_funnel" -> f1Funnel,
    "c1_cohort_retention" -> c1CohortRetention,
    "a16_moments" -> a16Moments,
    "a17_regr" -> a17Regr,
    "a18_mode" -> a18Mode,
    "o8_percent_rank" -> o8PercentRank,
    "o9_trailing_window" -> o9TrailingWindow,
    "j17_full_outer" -> j17FullOuter,
    "m11_scd2" -> m11Scd2,
    "o10_frame_bounds" -> o10FrameBounds,
    "h2_profile" -> h2Profile,
    "h3_constraints" -> h3Constraints,
    "a32_psi_drift" -> a32PsiDrift,
    "o17_rolling_median" -> o17RollingMedian,
    "a29_entropy" -> a29Entropy,
    "a30_ks" -> a30Ks,
    "c2_rfm" -> c2Rfm,
    "a31_autocorr" -> a31Autocorr,
    "o20_cusum" -> o20Cusum)

  val oracles: Map[String, String] = Map(
    "o16_seq_pattern" ->
      """WITH s AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    lead(event_type, 1) OVER w AS t2,
        |    lead(event_type, 2) OVER w AS t3,
        |    lead(event_id, 2) OVER w AS e3,
        |    lead(ts, 2) OVER w AS ts3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS e1, e3,
        |  epoch_us(CAST(ts3 AS TIMESTAMP))
        |   - epoch_us(CAST(ts AS TIMESTAMP)) AS span_us
        |FROM s
        |WHERE event_type = 'click' AND t2 = 'click' AND t3 = 'purchase'
        |ORDER BY user_id, e1""".stripMargin,
    "a28_jackknife" ->
      """WITH blocks AS (
        |  SELECT l_orderkey % 10 AS b, count(*)::BIGINT AS n_b,
        |    sum(CAST(round(l_quantity * 100) AS BIGINT)) AS s_b
        |  FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT sum(n_b)::BIGINT AS n, sum(s_b)::BIGINT AS s FROM blocks),
        |m AS (
        |  SELECT b, CAST(s - s_b AS DOUBLE) / (n - n_b) / 100.0 AS m_b,
        |    n, s
        |  FROM blocks CROSS JOIN tot),
        |mb AS (SELECT avg(m_b) AS mbar FROM m)
        |SELECT max(n) AS n,
        |  CAST(max(s) AS DOUBLE) / max(n) / 100.0 AS mean,
        |  sqrt((CAST(count(*) AS DOUBLE) - 1) / count(*)
        |    * sum((m_b - mbar) * (m_b - mbar))) AS jk_se
        |FROM m CROSS JOIN mb""".stripMargin,
    "a26_benford" ->
      """WITH c AS (
        |  SELECT substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS digit,
        |    count(*)::BIGINT AS n
        |  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        |t AS (SELECT sum(n)::BIGINT AS tot FROM c)
        |SELECT digit, n, CAST(n AS DOUBLE) / tot AS p,
        |  log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS benford_p
        |FROM c CROSS JOIN t ORDER BY digit""".stripMargin,
    "a27_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |r AS (
        |  SELECT cents, row_number() OVER (ORDER BY cents, o_custkey) AS rk
        |  FROM spend)
        |SELECT count(*)::BIGINT AS n, sum(cents)::BIGINT AS total_cents,
        |  (2.0 * sum(rk * cents) - (CAST(count(*) AS DOUBLE) + 1)
        |      * sum(cents))
        |    / (CAST(count(*) AS DOUBLE) * sum(cents)) AS gini
        |FROM r""".stripMargin,
    "o15_cum_distinct" ->
      """SELECT event_id,
        |  count(DISTINCT user_id) OVER (
        |    PARTITION BY event_type ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_dist
        |FROM events ORDER BY event_id""".stripMargin,
    "a25_frequent_pairs" ->
      """WITH op AS (
        |  SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem)
        |SELECT a.i AS part_a, b.i AS part_b, count(*)::BIGINT AS support
        |FROM op a JOIN op b ON a.b = b.b AND a.i < b.i
        |GROUP BY 1, 2 HAVING count(*) >= 2
        |ORDER BY part_a, part_b""".stripMargin,
    "d28_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |st AS (
        |  SELECT e.event_type, max(m.med) AS med,
        |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
        |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
        |SELECT event_id, event_type, value,
        |  0.6745 * (value - med) / mad AS score
        |FROM events JOIN st USING (event_type)
        |WHERE abs(0.6745 * (value - med) / mad) > 3.5
        |ORDER BY event_id""".stripMargin,
    "a24_mutual_info" ->
      """WITH cells AS (
        |  SELECT
        |    sum(CASE WHEN event_type='click' AND value > 50
        |        THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN event_type='click' AND value <= 50
        |        THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN event_type='purchase' AND value > 50
        |        THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN event_type='purchase' AND value <= 50
        |        THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM events WHERE event_type IN ('click','purchase')),
        |w AS (SELECT a, b, c, d, CAST(a+b+c+d AS DOUBLE) AS nn FROM cells)
        |SELECT a, b, c, d,
        |  (CASE WHEN a = 0 THEN 0.0 ELSE
        |    (CAST(a AS DOUBLE) / nn)
        |      * ln(CAST(a AS DOUBLE) * nn / (CAST(a+b AS DOUBLE) * (a+c)))
        |   END)
        |  + (CASE WHEN b = 0 THEN 0.0 ELSE
        |    (CAST(b AS DOUBLE) / nn)
        |      * ln(CAST(b AS DOUBLE) * nn / (CAST(a+b AS DOUBLE) * (b+d)))
        |   END)
        |  + (CASE WHEN c = 0 THEN 0.0 ELSE
        |    (CAST(c AS DOUBLE) / nn)
        |      * ln(CAST(c AS DOUBLE) * nn / (CAST(c+d AS DOUBLE) * (a+c)))
        |   END)
        |  + (CASE WHEN d = 0 THEN 0.0 ELSE
        |    (CAST(d AS DOUBLE) / nn)
        |      * ln(CAST(d AS DOUBLE) * nn / (CAST(c+d AS DOUBLE) * (b+d)))
        |   END) AS mi
        |FROM w""".stripMargin,
    "o14_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |g AS (
        |  SELECT event_type, next_type, count(*)::BIGINT AS n
        |  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  CAST(n AS DOUBLE)
        |    / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE) AS p
        |FROM g ORDER BY event_type, next_type""".stripMargin,
    "o11_ewma" ->
      """WITH v AS (
        |  SELECT user_id, list(value ORDER BY ts, event_id) AS l
        |  FROM events GROUP BY user_id)
        |SELECT user_id, len(l)::BIGINT AS n_events,
        |  list_reduce(l, (acc, x) -> 0.3*x + 0.7*acc) AS ewma
        |FROM v ORDER BY user_id""".stripMargin,
    "a19_skyline" ->
      """WITH base AS (
        |  SELECT CAST(floor(l_quantity) AS BIGINT) AS x, l_extendedprice AS y
        |  FROM lineitem),
        |p AS (SELECT DISTINCT x, y FROM base),
        |g AS (SELECT x, y, count(*) AS n FROM base GROUP BY x, y)
        |SELECT g.x, g.y, g.n FROM g
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p q WHERE q.x >= g.x AND q.y >= g.y
        |    AND (q.x > g.x OR q.y > g.y))
        |ORDER BY x""".stripMargin,
    "a23_chi_squared" ->
      """WITH c AS (
        |  SELECT
        |    sum(CASE WHEN event_type='click' AND value > 50
        |        THEN 1 ELSE 0 END)::BIGINT AS a,
        |    sum(CASE WHEN event_type='click' AND value <= 50
        |        THEN 1 ELSE 0 END)::BIGINT AS b,
        |    sum(CASE WHEN event_type='purchase' AND value > 50
        |        THEN 1 ELSE 0 END)::BIGINT AS c,
        |    sum(CASE WHEN event_type='purchase' AND value <= 50
        |        THEN 1 ELSE 0 END)::BIGINT AS d
        |  FROM events WHERE event_type IN ('click','purchase'))
        |SELECT a, b, c, d,
        |  CAST(a+b+c+d AS DOUBLE) * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c)
        |    * (CAST(a AS DOUBLE)*d - CAST(b AS DOUBLE)*c)
        |    / ((a+b) * CAST(c+d AS DOUBLE) * (a+c) * (b+d)) AS chi2
        |FROM c""".stripMargin,
    "a22_welch_t" ->
      """WITH g AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(round(value * 100) AS BIGINT)) AS s1,
        |    sum(CAST(round(value * 100) AS BIGINT)
        |        * CAST(round(value * 100) AS BIGINT)) AS s2
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY event_type),
        |d AS (
        |  SELECT
        |    max(CASE WHEN event_type='click' THEN n END) AS n1,
        |    max(CASE WHEN event_type='purchase' THEN n END) AS n2,
        |    max(CASE WHEN event_type='click' THEN s1 END) AS a1,
        |    max(CASE WHEN event_type='purchase' THEN s1 END) AS b1,
        |    max(CASE WHEN event_type='click' THEN s2 END) AS a2,
        |    max(CASE WHEN event_type='purchase' THEN s2 END) AS b2
        |  FROM g)
        |SELECT n1, n2,
        |  CAST(a1 AS DOUBLE)/n1/100 - CAST(b1 AS DOUBLE)/n2/100 AS mean_diff,
        |  (CAST(a1 AS DOUBLE)/n1/100 - CAST(b1 AS DOUBLE)/n2/100) /
        |  sqrt(((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE)*a1/n1)/(n1-1)/10000)/n1
        |     + ((CAST(b2 AS DOUBLE) - CAST(b1 AS DOUBLE)*b1/n2)/(n2-1)/10000)/n2)
        |  AS t_stat
        |FROM d""".stripMargin,
    "o13_window_distinct" ->
      """SELECT event_id,
        |  count(DISTINCT user_id) OVER (
        |    PARTITION BY event_type ORDER BY ts
        |    RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |  AS n_dist
        |FROM events ORDER BY event_id""".stripMargin,
    "o12_interp" ->
      """WITH span AS (
        |  SELECT user_id, date_trunc('hour', CAST(min(ts) AS TIMESTAMP)) AS lo,
        |         date_trunc('hour', CAST(max(ts) AS TIMESTAMP)) AS hi
        |  FROM events GROUP BY user_id),
        |hours AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM span),
        |obs AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
        |  FROM events GROUP BY 1, 2),
        |axis AS (
        |  SELECT user_id, epoch_ms(h) AS h_ms, v
        |  FROM hours LEFT JOIN obs USING (user_id, h)),
        |w AS (
        |  SELECT user_id, h_ms, v,
        |    last_value(CASE WHEN v IS NOT NULL
        |        THEN struct_pack(h := h_ms, v := v) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h_ms
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
        |    first_value(CASE WHEN v IS NOT NULL
        |        THEN struct_pack(h := h_ms, v := v) END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY h_ms
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv
        |  FROM axis)
        |SELECT user_id, h_ms,
        |  CASE WHEN v IS NOT NULL THEN v
        |       ELSE pv.v + (nv.v - pv.v)
        |            * ((h_ms - pv.h) / CAST(nv.h - pv.h AS DOUBLE)) END AS v
        |FROM w ORDER BY user_id, h_ms""".stripMargin,
    "o7_gapfill" ->
      """WITH span AS (
        |  SELECT user_id, date_trunc('hour', CAST(min(ts) AS TIMESTAMP)) AS lo,
        |         date_trunc('hour', CAST(max(ts) AS TIMESTAMP)) AS hi
        |  FROM events GROUP BY user_id),
        |hours AS (
        |  SELECT user_id,
        |    unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |  FROM span),
        |cnt AS (
        |  SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
        |         count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT user_id, epoch_ms(h) AS h_ms, coalesce(n, 0) AS n
        |FROM hours LEFT JOIN cnt USING (user_id, h)
        |ORDER BY user_id, h_ms""".stripMargin,
    "f1_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |c2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN s1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.value > 80 AND e.ts > s1.t1
        |  GROUP BY 1),
        |p3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN c2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.value > 80 AND e.ts > c2.t2
        |  GROUP BY 1)
        |SELECT user_id,
        |  epoch_ms(CAST(t1 AS TIMESTAMP)) AS t1_ms,
        |  epoch_ms(CAST(t2 AS TIMESTAMP)) AS t2_ms,
        |  epoch_ms(CAST(t3 AS TIMESTAMP)) AS t3_ms
        |FROM s1 LEFT JOIN c2 USING (user_id) LEFT JOIN p3 USING (user_id)
        |ORDER BY user_id""".stripMargin,
    "c1_cohort_retention" ->
      """WITH cohort AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT cohort_day,
        |  CAST(day - cohort_day AS INT) AS day_offset,
        |  count(DISTINCT user_id) AS n_users
        |FROM active JOIN cohort USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_day, day_offset""".stripMargin,
    "a16_moments" ->
      """WITH s AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    sum(CAST(floor(l_quantity) AS BIGINT)) AS s1,
        |    sum(CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)) AS s2,
        |    sum(CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)) AS s3,
        |    sum(CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)
        |        * CAST(floor(l_quantity) AS BIGINT)) AS s4
        |  FROM lineitem GROUP BY l_returnflag),
        |p AS (
        |  SELECT l_returnflag, n,
        |    CAST(s1 AS DOUBLE) / n AS m, CAST(s2 AS DOUBLE) / n AS p2,
        |    CAST(s3 AS DOUBLE) / n AS p3, CAST(s4 AS DOUBLE) / n AS p4
        |  FROM s),
        |c AS (
        |  SELECT l_returnflag, n, m AS mean_qty,
        |    p2 - m * m AS v,
        |    p3 - 3 * m * p2 + 2 * m * m * m AS c3,
        |    p4 - 4 * m * p3 + 6 * m * m * p2 - 3 * m * m * m * m AS c4
        |  FROM p)
        |SELECT l_returnflag, n, mean_qty, v AS var_qty,
        |  c3 / (v * sqrt(v)) AS skew_qty,
        |  c4 / (v * v) - 3 AS kurt_qty
        |FROM c ORDER BY l_returnflag""".stripMargin,
    "a17_regr" ->
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
        |  FROM s),
        |t AS (
        |  SELECT l_returnflag, n,
        |    CAST(nd * sxyd - sxd * syd AS DOUBLE) AS num,
        |    CAST(nd * sxxd - sxd * sxd AS DOUBLE) AS denx,
        |    CAST(n2 * syyd - syd * syd AS DOUBLE) AS deny,
        |    CAST(sxd AS DOUBLE) AS sxdd, CAST(syd AS DOUBLE) AS sydd
        |  FROM c)
        |SELECT l_returnflag, n,
        |  num / denx AS slope,
        |  (sydd - num / denx * sxdd) / n AS intercept,
        |  (num * num) / (denx * deny) AS r2
        |FROM t ORDER BY l_returnflag""".stripMargin,
    "a18_mode" ->
      """WITH cnt AS (
        |  SELECT c_mktsegment, c_nationkey, count(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |rk AS (
        |  SELECT c_mktsegment, c_nationkey, n,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |      ORDER BY n DESC, c_nationkey ASC) AS rk
        |  FROM cnt)
        |SELECT c_mktsegment, c_nationkey AS modal_nation, n
        |FROM rk WHERE rk = 1 ORDER BY c_mktsegment""".stripMargin,
    "o8_percent_rank" ->
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
        |ORDER BY o_orderkey""".stripMargin,
    "o9_trailing_window" ->
      """SELECT event_id, user_id,
        |  count(*) OVER w AS n_1h,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "j17_full_outer" ->
      """WITH u AS (
        |  SELECT o_custkey, count(*) AS n_urgent FROM orders
        |  WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
        |l AS (
        |  SELECT o_custkey, count(*) AS n_low FROM orders
        |  WHERE o_orderpriority = '5-LOW' GROUP BY 1)
        |SELECT coalesce(u.o_custkey, l.o_custkey) AS o_custkey,
        |  coalesce(n_urgent, 0) AS n_urgent,
        |  coalesce(n_low, 0) AS n_low
        |FROM u FULL OUTER JOIN l ON u.o_custkey = l.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    "m11_scd2" ->
      """SELECT user_id, event_id,
        |  epoch_ms(CAST(ts AS TIMESTAMP)) AS valid_from_ms,
        |  epoch_ms(lead(CAST(ts AS TIMESTAMP)) OVER w) AS valid_to_ms,
        |  (lead(CAST(ts AS TIMESTAMP)) OVER w) IS NULL AS is_current,
        |  value
        |FROM events WHERE event_type = 'view'
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |ORDER BY user_id, valid_from_ms, event_id""".stripMargin,
    "o10_frame_bounds" ->
      """SELECT o_orderkey, o_orderpriority,
        |  first_value(o_totalprice) OVER w AS fv,
        |  last_value(o_totalprice) OVER w AS lv,
        |  nth_value(o_totalprice, 3) OVER w AS nv
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderkey""".stripMargin,
    // Mechanical translation of [[a32PsiDrift]]: quantile_cont deciles
    // of the src0 reference (the proven a4 percentile-parity idiom),
    // list_filter binning, +0.5/+5 smoothing, round-6 PSI sums.
    "a32_psi_drift" ->
      """WITH bs AS (
        |  SELECT quantile_cont(n_chars,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
        |  FROM documents WHERE source = 'src0'),
        |b AS (
        |  SELECT source,
        |    len(list_filter(bs.bs, x -> x <= n_chars)) + 1 AS bin
        |  FROM documents, bs),
        |c AS (SELECT source, bin, count(*) AS c FROM b GROUP BY 1, 2),
        |t AS (SELECT source, count(*) AS n FROM b GROUP BY 1),
        |sc AS (
        |  SELECT t.source, t.n, g.bin
        |  FROM t, (SELECT unnest(generate_series(1, 10)) AS bin) g),
        |f AS (
        |  SELECT sc.source, sc.bin,
        |    (COALESCE(c.c, 0) + 0.5e0) / (sc.n + 5e0) AS q
        |  FROM sc LEFT JOIN c ON sc.source = c.source AND sc.bin = c.bin),
        |r AS (SELECT bin, q AS p FROM f WHERE source = 'src0')
        |SELECT f.source, round(sum((f.q - r.p) * ln(f.q / r.p)), 6) AS psi
        |FROM f JOIN r USING (bin)
        |GROUP BY f.source ORDER BY f.source""".stripMargin,
    "h2_profile" ->
      """WITH s AS (
        |  SELECT count(*) AS n,
        |    count(o_totalprice) AS nn_price,
        |    count(DISTINCT o_totalprice) AS ndv_price,
        |    CAST(min(o_totalprice) AS VARCHAR) AS min_price,
        |    CAST(max(o_totalprice) AS VARCHAR) AS max_price,
        |    count(o_orderstatus) AS nn_status,
        |    count(DISTINCT o_orderstatus) AS ndv_status,
        |    min(o_orderstatus) AS min_status,
        |    max(o_orderstatus) AS max_status,
        |    count(o_orderdate) AS nn_date,
        |    count(DISTINCT o_orderdate) AS ndv_date,
        |    CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS min_date,
        |    CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS max_date
        |  FROM orders)
        |SELECT 'o_totalprice' AS col_name, n, n - nn_price AS n_null,
        |  ndv_price AS ndv, min_price AS min_s, max_price AS max_s FROM s
        |UNION ALL
        |SELECT 'o_orderstatus', n, n - nn_status, ndv_status,
        |  min_status, max_status FROM s
        |UNION ALL
        |SELECT 'o_orderdate', n, n - nn_date, ndv_date,
        |  min_date, max_date FROM s
        |ORDER BY col_name""".stripMargin,
    "h3_constraints" ->
      """WITH e AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (WHERE value < 0 OR value > 100) AS v_range,
        |    count(*) FILTER (WHERE ts IS NULL) AS v_ts,
        |    count(DISTINCT event_id) AS ndv_id
        |  FROM events),
        |d AS (
        |  SELECT count(*) AS n,
        |    count(*) FILTER (
        |      WHERE lang NOT IN ('de','en','es','fr','zh')) AS v_lang,
        |    count(*) FILTER (WHERE n_chars <> length(text)) AS v_len,
        |    count(DISTINCT doc_id) AS ndv_id
        |  FROM documents),
        |fk AS (
        |  SELECT count(*) AS checked,
        |    count(*) FILTER (WHERE c.c_custkey IS NULL) AS violations
        |  FROM events ev LEFT JOIN customer c ON ev.user_id = c.c_custkey)
        |SELECT 'ev_value_in_0_100' AS rule, n AS checked,
        |  v_range AS violations FROM e
        |UNION ALL SELECT 'ev_ts_not_null', n, v_ts FROM e
        |UNION ALL SELECT 'ev_event_id_unique', n, n - ndv_id FROM e
        |UNION ALL SELECT 'doc_lang_known', n, v_lang FROM d
        |UNION ALL SELECT 'doc_nchars_consistent', n, v_len FROM d
        |UNION ALL SELECT 'doc_id_unique', n, n - ndv_id FROM d
        |UNION ALL SELECT 'ev_user_fk_customer', checked, violations FROM fk
        |ORDER BY rule""".stripMargin,
    "o17_rolling_median" ->
      """SELECT event_id,
        |  round(median(value) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med
        |FROM events ORDER BY event_id""".stripMargin,
    "o20_cusum" ->
      """WITH RECURSIVE ev AS (
        |  SELECT user_id,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn,
        |    value AS v
        |  FROM events),
        |r AS (
        |  SELECT user_id, rn,
        |    CASE WHEN greatest(0.0, v - 60.0) > 150.0 THEN 0.0
        |      ELSE greatest(0.0, v - 60.0) END AS s,
        |    CASE WHEN greatest(0.0, v - 60.0) > 150.0
        |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS a
        |  FROM ev WHERE rn = 1
        |  UNION ALL
        |  SELECT e.user_id, e.rn,
        |    CASE WHEN greatest(0.0, r.s + (e.v - 60.0)) > 150.0 THEN 0.0
        |      ELSE greatest(0.0, r.s + (e.v - 60.0)) END,
        |    r.a + CASE WHEN greatest(0.0, r.s + (e.v - 60.0)) > 150.0
        |      THEN 1 ELSE 0 END
        |  FROM r JOIN ev e
        |    ON e.user_id = r.user_id AND e.rn = r.rn + 1)
        |SELECT r.user_id, c.n_events, r.a AS n_alarms,
        |  round(r.s, 6) AS residual_s
        |FROM r JOIN (SELECT user_id, count(*) AS n_events FROM events
        |  GROUP BY 1) c USING (user_id)
        |WHERE r.rn = c.n_events
        |ORDER BY user_id""".stripMargin,
    "a31_autocorr" ->
      """WITH hourly AS (
        |  SELECT CAST(epoch_ms(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      / 3600000 AS BIGINT) AS h,
        |    count(*) AS n
        |  FROM events GROUP BY 1),
        |j AS (
        |  SELECT a.n AS x, b.n AS y
        |  FROM hourly a JOIN hourly b ON b.h = a.h + 1),
        |s AS (
        |  SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM j)
        |SELECT CAST(m AS BIGINT) AS m,
        |  (CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |  / (sqrt(CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |     * sqrt(CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
        |  AS autocorr
        |FROM s""".stripMargin,
    // Recency is plain DATE subtraction (the green-c1 form), NOT
    // datediff('day', ...) — the one calendar builtin here the driver's
    // checker had never exercised; every output integer is CAST BIGINT
    // so no bare HUGEINT (DuckDB sum-of-BIGINT) reaches the hash.
    "c2_rfm" ->
      """WITH per AS (
        |  SELECT o_custkey, max(CAST(o_orderdate AS DATE)) AS lday,
        |    count(*) AS freq,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |y AS (
        |  SELECT o_custkey,
        |    CAST((SELECT max(lday) FROM per) - lday AS BIGINT) AS recency,
        |    freq, cents, (SELECT count(*) FROM per) AS n
        |  FROM per),
        |rk AS (
        |  SELECT *,
        |    row_number() OVER (ORDER BY recency, o_custkey) AS rn_r,
        |    row_number() OVER (ORDER BY freq DESC, o_custkey) AS rn_f,
        |    row_number() OVER (ORDER BY cents DESC, o_custkey) AS rn_m
        |  FROM y),
        |b AS (
        |  SELECT cents,
        |    CASE WHEN rn_r <= (n % 4) * ((n // 4) + 1)
        |      THEN (rn_r - 1) // ((n // 4) + 1) + 1
        |      ELSE (n % 4) + (rn_r - (n % 4) * ((n // 4) + 1) - 1)
        |        // (n // 4) + 1 END AS r_band,
        |    CASE WHEN rn_f <= (n % 4) * ((n // 4) + 1)
        |      THEN (rn_f - 1) // ((n // 4) + 1) + 1
        |      ELSE (n % 4) + (rn_f - (n % 4) * ((n // 4) + 1) - 1)
        |        // (n // 4) + 1 END AS f_band,
        |    CASE WHEN rn_m <= (n % 4) * ((n // 4) + 1)
        |      THEN (rn_m - 1) // ((n // 4) + 1) + 1
        |      ELSE (n % 4) + (rn_m - (n % 4) * ((n // 4) + 1) - 1)
        |        // (n // 4) + 1 END AS m_band
        |  FROM rk)
        |SELECT r_band, f_band, m_band, count(*) AS n_customers,
        |  CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM b GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "a30_ks" ->
      """WITH g AS (
        |  SELECT value AS v,
        |    count(*) FILTER (WHERE event_type = 'click') AS c1,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS c2
        |  FROM events WHERE event_type IN ('click', 'purchase')
        |  GROUP BY 1),
        |t AS (SELECT sum(c1) AS n1, sum(c2) AS n2 FROM g),
        |c AS (
        |  SELECT v, sum(c1) OVER (ORDER BY v) AS k1,
        |    sum(c2) OVER (ORDER BY v) AS k2
        |  FROM g)
        |SELECT CAST(max(n1) AS BIGINT) AS n1,
        |  CAST(max(n2) AS BIGINT) AS n2,
        |  max(abs(CAST(k1 AS DOUBLE) / n1 - CAST(k2 AS DOUBLE) / n2))
        |    AS d
        |FROM c CROSS JOIN t""".stripMargin,
    "a29_entropy" ->
      """WITH cells AS (
        |  SELECT
        |    count(*) FILTER (WHERE event_type = 'click' AND value > 50)
        |      AS a,
        |    count(*) FILTER (WHERE event_type = 'click' AND value <= 50)
        |      AS b,
        |    count(*) FILTER (WHERE event_type = 'purchase' AND value > 50)
        |      AS c,
        |    count(*) FILTER (WHERE event_type = 'purchase' AND value <= 50)
        |      AS d
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |t AS (SELECT a, b, c, d, CAST(a+b+c+d AS DOUBLE) AS nn FROM cells),
        |h AS (
        |  SELECT a, b, c, d,
        |    -(CASE WHEN a+b = 0 THEN 0.0 ELSE (CAST(a+b AS DOUBLE) / nn)
        |        * ln(CAST(a+b AS DOUBLE) / nn) END
        |      + CASE WHEN c+d = 0 THEN 0.0 ELSE (CAST(c+d AS DOUBLE) / nn)
        |        * ln(CAST(c+d AS DOUBLE) / nn) END) AS hx,
        |    -(CASE WHEN a = 0 THEN 0.0 ELSE (CAST(a AS DOUBLE) / nn)
        |        * ln(CAST(a AS DOUBLE) / (CAST(a+c AS DOUBLE))) END
        |      + CASE WHEN c = 0 THEN 0.0 ELSE (CAST(c AS DOUBLE) / nn)
        |        * ln(CAST(c AS DOUBLE) / (CAST(a+c AS DOUBLE))) END
        |      + CASE WHEN b = 0 THEN 0.0 ELSE (CAST(b AS DOUBLE) / nn)
        |        * ln(CAST(b AS DOUBLE) / (CAST(b+d AS DOUBLE))) END
        |      + CASE WHEN d = 0 THEN 0.0 ELSE (CAST(d AS DOUBLE) / nn)
        |        * ln(CAST(d AS DOUBLE) / (CAST(b+d AS DOUBLE))) END)
        |      AS hx_given_y
        |  FROM t)
        |SELECT a, b, c, d, hx, hx_given_y, hx - hx_given_y AS mi FROM h"""
        .stripMargin)
}
