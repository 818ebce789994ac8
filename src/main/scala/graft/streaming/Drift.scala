package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming drift monitoring — the ingest-time form of the a32 PSI
  * gate: a batch PSI run tells you a source drifted after the fact; a
  * feed that is quietly shifting distribution wants the alarm PER
  * EVENT-TIME WINDOW while the stream is still flowing (the "data
  * freshness/quality dashboard" stage of a production training-data
  * pipeline).
  *
  * The streaming constraint shapes the plan: PSI needs all ten bin
  * counts of a window together, and a bins-then-PSI pipeline would be
  * two chained stateful aggregates. Instead the reference distribution
  * collapses to ONE static broadcast row (decile boundaries + smoothed
  * bin probabilities), binning is a stateless scan expression, and the
  * whole window summary is a SINGLE stateful aggregate with ten
  * conditional counts — the PSI arithmetic then runs scan-stage on the
  * aggregated row (array zip + fold, pure codegen). One stateful
  * operator total, so the query runs in any output mode a windowed
  * aggregate supports, and the identical plan in batch mode is what the
  * DuckDB gate hash-checks (the w1/w13 batch-twin discipline).
  */
object Drift {

  /** Per-tumbling-window PSI of `valCol`'s distribution against a
    * STATIC reference sample: (w_start_ms, n_events, psi). Reference
    * deciles make the bins; both sides get the a32 +0.5/+5 smoothing
    * (each side over its own count), so empty bins stay finite and a
    * window that matches the reference reads ≈ 0. Rounds at 6 after a
    * fixed-order array fold — engine-exact against the oracle.
    */
  def windowedPsi(stream: DataFrame, reference: DataFrame,
      valCol: String = "value", tsCol: String = "ts",
      windowDur: String = "1 hour"): DataFrame = {
    // Static side: decile boundaries, then the reference's own smoothed
    // bin probabilities, assembled into one ordered 10-element array —
    // a single broadcastable row, never a driver collect. Both tiny
    // tables are cached (the a32 lesson): each feeds two consumers, and
    // uncached every consumer re-scans the reference corpus.
    val bs = graft.CacheRegistry.register(
      reference.agg(percentile(col(valCol),
        typedlit((1 to 9).map(_ / 10.0))).as("bs")).cache())
    def binOf: Column =
      size(expr(s"filter(bs, b -> b <= $valCol)")) + 1
    val refCnt = graft.CacheRegistry.register(
      reference.crossJoin(broadcast(bs))
        .select(binOf.as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("c")).cache())
    val filled = refCnt.agg(sum(col("c")).as("n"))
      .select(col("n"), explode(expr("sequence(1, 10)")).as("bin"))
      .join(refCnt, Seq("bin"), "left")
      .select(col("bin"),
        ((coalesce(col("c"), lit(0L)).cast("double") + 0.5) /
          (col("n").cast("double") + 5.0)).as("p"))
    val psRow = filled.agg(
      expr("transform(array_sort(collect_list(struct(bin, p))), x -> x.p)")
        .as("ps"))
    val staticRow = bs.crossJoin(psRow) // 1 row: (bs, ps)
    // Stream side: stateless bin at the scan; the broadcast static row
    // rides along so `first(ps)` survives the one stateful aggregate.
    val binned = stream.crossJoin(broadcast(staticRow))
      .select(col(tsCol), binOf.as("bin"), col("ps"))
    val aggs = count(lit(1)).as("n_events") +: first(col("ps")).as("ps") +:
      (1 to 10).map(i =>
        sum(when(col("bin") === i, 1L).otherwise(0L)).as(s"c$i"))
    binned.groupBy(window(col(tsCol), windowDur))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("cs", array((1 to 10).map(i => col(s"c$i")): _*))
      .select(unix_millis(col("window.start")).as("w_start_ms"),
        col("n_events"),
        round(expr(
          "aggregate(zip_with(cs, ps, (c, p) -> " +
            "((c + 0.5d) / (n_events + 5.0d) - p) * " +
            "ln(((c + 0.5d) / (n_events + 5.0d)) / p)), 0d, " +
            "(acc, x) -> acc + x)"), 6).as("psi"))
  }
}
