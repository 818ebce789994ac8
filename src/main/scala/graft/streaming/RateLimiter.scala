package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key token-bucket admission control — the stream-policy stateful
  * operator (API quota enforcement, per-device command throttling,
  * training-data per-source ingestion caps) built the Structured
  * Streaming way: `flatMapGroupsWithState` holding (tokens, lastUs) per
  * key, exactly like [[CdcStream.statefulDedup]] holds its high-water
  * mark. In batch mode Spark runs the same state function once per key
  * over the whole group — that batch twin is what the DuckDB oracle
  * pins (`o18_rate_limit`); `CdcStreamSpec` drives the streaming side
  * through MemoryStream and asserts batch ≡ streaming on ts-ordered
  * micro-batches.
  *
  * Policy: bucket starts FULL (`burst` tokens); each event refills
  * `(ts − last)/1e6 · ratePerSec` up to `burst`, then needs one whole
  * token to be admitted. All arithmetic is plain IEEE doubles in the
  * SAME expression order as the oracle's `list_reduce` fold — the o11
  * bit-reproducibility contract; no rounding band needed.
  *
  * Events are sorted (ts, id) inside each group invocation, so the fold
  * order is total regardless of shuffle arrival order — the same
  * in-function sort discipline as statefulDedup. State per key is two
  * scalars: O(keys) memory, the shape that holds at any stream length.
  */
object RateLimiter {

  /** @param events (key, tsMicros, eventId) rows.
    * @return admitted (key, eventId) pairs.
    */
  def admit(events: DataFrame, ratePerSec: Double, burst: Double)
      : Dataset[(Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(burst >= 1.0, "burst must admit at least one event")
    events.toDF("k", "t", "i").as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Long)],
         state: GroupState[(Double, Long)]) =>
          val sorted = it.toSeq.sortBy(e => (e._2, e._3))
          var (tokens, last) = state.getOption.getOrElse((burst, Long.MinValue))
          val out = Seq.newBuilder[(Long, Long)]
          sorted.foreach { case (_, t, id) =>
            if (last != Long.MinValue)
              tokens = math.min(burst,
                tokens + (t - last).toDouble / 1000000.0 * ratePerSec)
            last = t
            if (tokens >= 1.0) { tokens -= 1.0; out += ((key, id)) }
          }
          if (sorted.nonEmpty) state.update((tokens, last))
          out.result().iterator
      }
  }
}
