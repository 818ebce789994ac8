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
}
