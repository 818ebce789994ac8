package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward, inclusive) join: for every left row, the single right
  * row with the LARGEST right timestamp ≤ the left row's timestamp within
  * the same key group — the temporal point-lookup shape (attribution,
  * price-as-of-trade, sensor snapshot at command time) that relational
  * joins cannot express without an O(n·m) range join + argmax.
  *
  * Spark has no native as-of join, so this is the canonical custom
  * operator built the Spark-first way (task brief: compose existing ops
  * before dropping to custom plans): both sides are tagged and UNIONed,
  * shuffled ONCE on the key columns, sorted within each partition by
  * (ts, side, tiebreak), and every right payload column is propagated
  * forward with `last(_, ignoreNulls = true)` over a running window —
  * the exact sweep a merge-based as-of join performs, expressed in four
  * Catalyst operators (Union → Exchange → Sort → Window) that AQE and
  * whole-stage codegen already know how to run at 100 TB. No range
  * explosion: cost is one shuffle of |L|+|R| rows, independent of how
  * many right rows precede each left row.
  *
  * Semantics notes:
  *  - Inclusive: a right row at exactly the left timestamp matches
  *    (right rows sort BEFORE left rows on timestamp ties via the side
  *    tag — matching DuckDB `ASOF JOIN ... ON l.ts >= r.ts`, the oracle).
  *  - Right-side duplicates on (key, ts) resolve to the row last in
  *    `tiebreak` order (caller supplies a deterministic tiebreak column;
  *    defaults to the right timestamp itself, which makes duplicate
  *    resolution engine-defined — pre-aggregate the right side when
  *    bit-determinism matters, as the j12 gate does).
  *  - Unmatched left rows survive with null right columns (LEFT OUTER).
  *
  * Scale posture: the single exchange hash-partitions on the key columns,
  * so per-key timelines are partition-local and the window needs no
  * global sort. Skewed keys behave like any skewed window partition —
  * salt the key or shard the timeline (see o3LagGapsSharded) when one
  * entity dominates. The reference has no as-of operator; this extends
  * the engine's temporal surface per the large-pipeline mandate.
  */
object AsOfJoin {

  /** @param left        probe side; all its columns are kept unchanged.
    * @param right       build side; its payload columns are emitted
    *                    under `rightPrefix`.
    * @param keys        equi-join key columns (must exist on both sides).
    * @param leftTs      left probe timestamp column.
    * @param rightTs     right ordering timestamp column (any orderable
    *                    type comparable to `leftTs`).
    * @param rightPrefix prefix for emitted right payload columns.
    * @param tiebreak    right column ordering duplicates on (key, ts);
    *                    the LAST in ascending order wins.
    * @param toleranceMs max lookback: a match older than this many
    *                    milliseconds before the left timestamp is
    *                    discarded (row survives with null right columns)
    *                    — the pandas `merge_asof(tolerance=)` /
    *                    attribution-window semantics. Requires both
    *                    timestamp columns to be TimestampType. None =
    *                    unbounded.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      tiebreak: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    require(!keys.contains(rightTs),
      s"asof: $rightTs cannot be both a key and the ordering timestamp")
    val leftPayload = left.columns.filterNot(keys.contains).toIndexedSeq
    val rightPayload = right.columns.filterNot(keys.contains).toIndexedSeq
    val outRight = rightPayload.map(c => s"$rightPrefix$c")
    require(leftPayload.intersect(outRight).isEmpty,
      s"asof: prefixed right columns collide with left: " +
        leftPayload.intersect(outRight).mkString(","))

    def typed(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    // side 0 = right, 1 = left: on timestamp ties the right row sorts
    // first, so the running `last` has already absorbed it when the left
    // row is evaluated — inclusive (>=) semantics. The right payload
    // rides in ONE struct so the sweep propagates whole rows: per-column
    // `last(ignoreNulls)` would stitch fields from different right rows
    // whenever a payload field is genuinely null.
    val taggedRight = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__asof_ts"), lit(0).as("__asof_side"),
          tiebreak.map(col).getOrElse(col(rightTs)).as("__asof_tie"),
          struct(rightPayload.map(col): _*).as("__asof_payload")) ++
        leftPayload.map(c => typed(left, c).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__asof_ts"), lit(1).as("__asof_side"),
          lit(null).cast(taggedRight.schema("__asof_tie").dataType)
            .as("__asof_tie"),
          lit(null).cast(taggedRight.schema("__asof_payload").dataType)
            .as("__asof_payload")) ++
        leftPayload.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
        col("__asof_tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    toleranceMs.foreach { _ =>
      import org.apache.spark.sql.types.TimestampType
      require(left.schema(leftTs).dataType == TimestampType &&
        right.schema(rightTs).dataType == TimestampType,
        "toleranceMs requires TimestampType timestamps on both sides")
    }
    val swept = taggedRight.unionByName(taggedLeft)
      .withColumn("__asof_match",
        last(col("__asof_payload"), ignoreNulls = true).over(w))
    val bounded = toleranceMs match {
      case Some(tol) => swept.withColumn("__asof_match",
        when(unix_millis(col("__asof_ts")) -
          unix_millis(col(s"__asof_match.$rightTs")) <= tol,
          col("__asof_match")))
      case None => swept
    }
    bounded
      .filter(col("__asof_side") === 1)
      .select(keys.map(col) ++ leftPayload.map(col) ++
        rightPayload.zip(outRight).map { case (c, o) =>
          col(s"__asof_match.$c").as(o)
        }: _*)
  }
}
