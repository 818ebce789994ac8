package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Temporal range (interval-containment) join: every (left, right) row
  * pair sharing the equi-keys with `rightTs` inside
  * `[leftTs − beforeMs, leftTs + afterMs]` — the windowed-context shape
  * (events in the N hours before a conversion, readings around a fault,
  * features in a label's horizon) that Spark plans as a broadcast
  * nested-loop or cross join when written as raw inequality predicates,
  * which is O(|L|·|R|) per key group and explodes on hot keys.
  *
  * Mechanism — bounded bucket fan-out (the standard interval-bucketing
  * rewrite): with bucket width B = beforeMs + afterMs, the left row maps
  * to bucket ⌊tl/B⌋ and a right row at tr can only match lefts in
  * buckets ⌊(tr − afterMs)/B⌋ .. ⌊(tr + beforeMs)/B⌋ — at most TWO
  * consecutive buckets, because the match window is exactly B wide. The
  * right side is exploded to those ≤2 bucket replicas, the join becomes
  * a plain EQUI-join on (keys, bucket) — hash-shuffled, AQE-skew-
  * splittable, codegen'd — and the exact containment predicate filters
  * the survivors. Cost: one shuffle of |L| + 2|R| rows, independent of
  * timeline density; a hot key is the same skew class as any equi-join
  * (AQE's skew-join split applies, which it never does for the
  * nested-loop form).
  *
  * Inclusive on both endpoints. Inner semantics: unmatched left rows are
  * absent — aggregate-and-left-join at the call site when a total result
  * is needed (see `j13_range_count`).
  */
object RangeJoin {

  /** @param left        probe side; all columns kept.
    * @param right       build side; payload emitted under `rightPrefix`.
    * @param keys        equi-join key columns (both sides).
    * @param leftTs      left TimestampType column.
    * @param rightTs     right TimestampType column.
    * @param beforeMs    window extent before the left timestamp (≥ 0).
    * @param afterMs     window extent after the left timestamp (≥ 0).
    * @param rightPrefix prefix for emitted right payload columns.
    */
  def inner(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, beforeMs: Long, afterMs: Long,
      rightPrefix: String = "range_"): DataFrame = {
    require(keys.nonEmpty, "range join requires at least one key column")
    require(beforeMs >= 0 && afterMs >= 0,
      s"window extents must be non-negative, got [$beforeMs, $afterMs]")
    val span = beforeMs + afterMs
    require(span > 0, "window must have positive width")
    require(!keys.contains(rightTs),
      s"range: $rightTs cannot be both a key and the ordering timestamp")
    import org.apache.spark.sql.types.TimestampType
    require(left.schema(leftTs).dataType == TimestampType &&
      right.schema(rightTs).dataType == TimestampType,
      "range join requires TimestampType timestamps on both sides")

    val leftPayload = left.columns.filterNot(keys.contains).toIndexedSeq
    val rightPayload = right.columns.filterNot(keys.contains).toIndexedSeq
    val outRight = rightPayload.map(c => s"$rightPrefix$c")
    require(leftPayload.intersect(outRight).isEmpty,
      s"range: prefixed right columns collide with left: " +
        leftPayload.intersect(outRight).mkString(","))

    // Backtick-quoted reference: user column names containing dots,
    // spaces, or backticks must not be re-parsed as nested-field access.
    def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

    // All arithmetic in MICROseconds (the parquet timestamp resolution):
    // a ms-truncated containment check would diverge from a full-precision
    // oracle on rows with sub-millisecond components at window endpoints.
    // The ≤2-bucket fan-out argument is unchanged — it only needs bucket
    // width == window width, both now in µs. floor() (not integer
    // division, which truncates toward zero) keeps bucket math correct
    // for pre-1970 timestamps; µs magnitudes (~1.7e15 today) are inside
    // double's exact-integer range (9e15).
    val beforeUs = beforeMs * 1000L
    val afterUs = afterMs * 1000L
    val spanUs = span * 1000L
    val lb = left.withColumn("__rj_bucket",
      floor(unix_micros(qcol(leftTs)) / lit(spanUs.toDouble)).cast("long"))
    val rb = right.select(
      keys.map(qcol) :+ qcol(rightTs).as("__rj_rts") :+
        struct(rightPayload.map(qcol): _*).as("__rj_payload"): _*)
      .withColumn("__rj_bucket", explode(expr(
        s"sequence(cast(floor((unix_micros(__rj_rts) - ${afterUs}L) / ${spanUs}D) as long), " +
          s"cast(floor((unix_micros(__rj_rts) + ${beforeUs}L) / ${spanUs}D) as long))")))
      .drop("__rj_rts")

    lb.join(rb, keys :+ "__rj_bucket")
      .filter(
        unix_micros(col("__rj_payload").getField(rightTs))
          .between(unix_micros(qcol(leftTs)) - beforeUs,
            unix_micros(qcol(leftTs)) + afterUs))
      .select(keys.map(qcol) ++ leftPayload.map(qcol) ++
        rightPayload.zip(outRight).map { case (c, o) =>
          col("__rj_payload").getField(c).as(o)
        }: _*)
  }

  /** Interval-overlap join: every (left, right) pair sharing the
    * equi-keys whose CLOSED intervals intersect —
    * `[ls, le] ∩ [rs, re] ≠ ∅`, i.e. `ls ≤ re AND rs ≤ le` — the
    * session-vs-session / outage-vs-job / span-vs-span shape that raw
    * inequality predicates send to a nested-loop plan.
    *
    * Mechanism: both sides replicate over the buckets their interval
    * covers (`⌊s/B⌋ .. ⌊e/B⌋`, width B = `bucketMs`), the join is a
    * plain equi-join on (keys, bucket), and each matching pair is kept
    * ONLY in the bucket containing its overlap start
    * `⌊max(ls, rs)/B⌋` — that bucket lies in both covering ranges, so
    * every overlapping pair is emitted exactly once without a distinct
    * pass. Cost: one shuffle of Σ(len/B + 1) replica rows; pick B near
    * the typical interval length so the fan-out stays O(1) per row.
    * A row whose fan-out would exceed `maxReplicas` fails loudly
    * (`assert_true`) instead of silently exploding the shuffle — at
    * 100 TB a mis-set bucket width must be a visible error, not a
    * 100× replica blowup discovered in the exchange metrics. Intervals
    * must satisfy start ≤ end (also asserted).
    */
  def overlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String, rightStart: String,
      rightEnd: String, bucketMs: Long, rightPrefix: String = "ov_",
      maxReplicas: Int = 64): DataFrame = {
    require(keys.nonEmpty, "overlap join requires at least one key column")
    require(bucketMs > 0, s"bucket width must be positive, got $bucketMs")
    require(maxReplicas >= 2, s"maxReplicas must be >= 2, got $maxReplicas")
    for (c <- Seq(leftStart, leftEnd, rightStart, rightEnd))
      require(!keys.contains(c),
        s"overlap: $c cannot be both a key and an interval bound")
    import org.apache.spark.sql.types.TimestampType
    for ((df, c) <- Seq(left -> leftStart, left -> leftEnd,
        right -> rightStart, right -> rightEnd))
      require(df.schema(c).dataType == TimestampType,
        s"overlap join requires TimestampType interval bounds ($c)")

    val leftPayload = left.columns.filterNot(keys.contains).toIndexedSeq
    val rightPayload = right.columns.filterNot(keys.contains).toIndexedSeq
    val outRight = rightPayload.map(c => s"$rightPrefix$c")
    require(leftPayload.intersect(outRight).isEmpty,
      s"overlap: prefixed right columns collide with left: " +
        leftPayload.intersect(outRight).mkString(","))

    def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")
    val bucketUs = bucketMs * 1000L

    // Replicate one side over its covering buckets. Bucket math in µs
    // via floor() (see [[inner]] — correct for pre-1970, exact in
    // double's integer range). The guards are filters over assert_true
    // (NULL on success), so they fail the job with the message rather
    // than silently dropping or exploding rows.
    def replicate(df: DataFrame, s: String, e: String): DataFrame = {
      val lo = floor(unix_micros(qcol(s)) / lit(bucketUs.toDouble)).cast("long")
      val hi = floor(unix_micros(qcol(e)) / lit(bucketUs.toDouble)).cast("long")
      df.withColumn("__ov_lo", lo).withColumn("__ov_hi", hi)
        .filter(assert_true(qcol(s) <= qcol(e),
          lit(s"overlap: interval $s > $e")).isNull)
        .filter(assert_true(col("__ov_hi") - col("__ov_lo") < maxReplicas,
          lit(s"overlap: interval spans >= $maxReplicas buckets of " +
            s"$bucketMs ms — raise bucketMs or maxReplicas")).isNull)
        .withColumn("__ov_bucket",
          explode(expr("sequence(__ov_lo, __ov_hi)")))
        .drop("__ov_lo", "__ov_hi")
    }

    val lb = replicate(left, leftStart, leftEnd)
    val rb = replicate(
      right.select(keys.map(qcol) :+
        struct(rightPayload.map(qcol): _*).as("__ov_payload"): _*)
        .withColumn("__ov_rs", col("__ov_payload").getField(rightStart))
        .withColumn("__ov_re", col("__ov_payload").getField(rightEnd)),
      "__ov_rs", "__ov_re").drop("__ov_rs", "__ov_re")

    val rs = col("__ov_payload").getField(rightStart)
    val re = col("__ov_payload").getField(rightEnd)
    lb.join(rb, keys :+ "__ov_bucket")
      // Exact inclusive overlap + emit-once: only the bucket holding
      // max(ls, rs), the overlap start, survives.
      .filter(qcol(leftStart) <= re && rs <= qcol(leftEnd))
      .filter(col("__ov_bucket") ===
        floor(greatest(unix_micros(qcol(leftStart)), unix_micros(rs)) /
          lit(bucketUs.toDouble)).cast("long"))
      .select(keys.map(qcol) ++ leftPayload.map(qcol) ++
        rightPayload.zip(outRight).map { case (c, o) =>
          col("__ov_payload").getField(c).as(o)
        }: _*)
  }
}
