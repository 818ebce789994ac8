package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "o7_gapfill" -> o7GapFill,
    "f1_funnel" -> f1Funnel,
    "c1_cohort_retention" -> c1CohortRetention)

  val oracles: Map[String, String] = Map(
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
        |ORDER BY cohort_day, day_offset""".stripMargin)
}
