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
  *  - Null keys never match (SQL equality / DuckDB ASOF semantics):
  *    right rows with any null key are dropped — they could never join —
  *    and left rows with null keys survive unmatched. Without this,
  *    `Window.partitionBy` would group null keys as equal and invent
  *    matches no equality join produces.
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
      toleranceMs: Option[Long] = None): DataFrame =
    sweep(left, right, keys, leftTs, rightTs, rightPrefix, tiebreak,
      toleranceMs, fwd = false)

  /** Forward as-of: for every left row, the single right row with the
    * SMALLEST right timestamp ≥ the left timestamp (inclusive) in the
    * same key group — pandas `merge_asof(direction='forward')`. Same
    * one-shuffle sweep as [[backward]], mirrored: left rows sort before
    * right rows on timestamp ties and the match is `first(ignoreNulls)`
    * over the FOLLOWING frame. Right duplicates on (key, ts) resolve to
    * the row FIRST in ascending `tiebreak` order. `toleranceMs` bounds
    * the lookahead.
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      tiebreak: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame =
    sweep(left, right, keys, leftTs, rightTs, rightPrefix, tiebreak,
      toleranceMs, fwd = true)

  /** Nearest as-of: for every left row, whichever of the backward and
    * forward candidates has the smaller absolute timestamp gap —
    * pandas `merge_asof(direction='nearest')`; equidistant candidates
    * resolve to the BACKWARD row (documented pandas-compatible choice).
    *
    * Still ONE exchange + sort: both candidates come from the same
    * sorted partition via two window frames over the same
    * (partition, order) spec — `last` over the preceding frame and
    * `first` over the following frame — which Spark evaluates in a
    * single WindowExec pass. Equal-ts right rows sort before the left
    * row (backward tie convention), so the following frame never sees
    * them — harmless: the backward candidate then has gap 0 and always
    * wins. Requires TimestampType on both timestamps (the gap
    * comparison is µs arithmetic); `toleranceMs` bounds BOTH directions.
    */
  def nearest(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String = "asof_",
      tiebreak: Option[String] = None,
      toleranceMs: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.types.TimestampType
    require(left.schema(leftTs).dataType == TimestampType &&
      right.schema(rightTs).dataType == TimestampType,
      "nearest asof requires TimestampType timestamps on both sides")
    sweep(left, right, keys, leftTs, rightTs, rightPrefix, tiebreak,
      toleranceMs, fwd = false, near = true)
  }

  private def sweep(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightPrefix: String,
      tiebreak: Option[String],
      toleranceMs: Option[Long], fwd: Boolean,
      near: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "asof join requires at least one key column")
    require(!keys.contains(rightTs),
      s"asof: $rightTs cannot be both a key and the ordering timestamp")
    require(!keys.contains(leftTs),
      s"asof: $leftTs cannot be both a key and the probe timestamp")
    val leftPayload = left.columns.filterNot(keys.contains).toIndexedSeq
    val rightPayload = right.columns.filterNot(keys.contains).toIndexedSeq
    val outRight = rightPayload.map(c => s"$rightPrefix$c")
    require(leftPayload.intersect(outRight).isEmpty,
      s"asof: prefixed right columns collide with left: " +
        leftPayload.intersect(outRight).mkString(","))

    // Backtick-quoted reference: user column names containing dots,
    // spaces, or backticks must not be re-parsed as nested-field access.
    def qcol(name: String): Column = col("`" + name.replace("`", "``") + "`")

    def typed(df: DataFrame, c: String): Column =
      lit(null).cast(df.schema(c).dataType)

    // side 0 = right, 1 = left: on timestamp ties the right row sorts
    // first, so the running `last` has already absorbed it when the left
    // row is evaluated — inclusive (>=) semantics. The right payload
    // rides in ONE struct so the sweep propagates whole rows: per-column
    // `last(ignoreNulls)` would stitch fields from different right rows
    // whenever a payload field is genuinely null.
    // Null keys never match: a right row with a null key can join nothing
    // under equality semantics, so drop it before the union — otherwise
    // partitionBy (which groups nulls as equal) would sweep its payload
    // onto null-keyed left rows. Left rows keep LEFT-OUTER survival: a
    // null-keyed left partition then contains no right rows, so its
    // running `last` is null and the row emits with null right columns.
    // Side ordering on timestamp ties makes both directions inclusive:
    // backward sorts the right row FIRST (the running `last` over the
    // preceding frame has absorbed it when the left row is evaluated);
    // forward sorts the left row first (the `first` over the following
    // frame still sees the equal-ts right row).
    val (rightSide, leftSide) = if (fwd) (1, 0) else (0, 1)
    val matchableRight = right.filter(
      keys.map(k => qcol(k).isNotNull).reduce(_ && _))
    val taggedRight = matchableRight.select(
      keys.map(qcol) ++
        Seq(qcol(rightTs).as("__asof_ts"), lit(rightSide).as("__asof_side"),
          tiebreak.map(qcol).getOrElse(qcol(rightTs)).as("__asof_tie"),
          struct(rightPayload.map(qcol): _*).as("__asof_payload")) ++
        leftPayload.map(c => typed(left, c).as(c)): _*)
    val taggedLeft = left.select(
      keys.map(qcol) ++
        Seq(qcol(leftTs).as("__asof_ts"), lit(leftSide).as("__asof_side"),
          lit(null).cast(taggedRight.schema("__asof_tie").dataType)
            .as("__asof_tie"),
          lit(null).cast(taggedRight.schema("__asof_payload").dataType)
            .as("__asof_payload")) ++
        leftPayload.map(qcol): _*)

    val base = Window.partitionBy(keys.map(qcol): _*)
      .orderBy(col("__asof_ts").asc, col("__asof_side").asc,
        col("__asof_tie").asc_nulls_first)
    val wPrec = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFoll = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val w = if (fwd) wFoll else wPrec

    toleranceMs.foreach { _ =>
      import org.apache.spark.sql.types.TimestampType
      require(left.schema(leftTs).dataType == TimestampType &&
        right.schema(rightTs).dataType == TimestampType,
        "toleranceMs requires TimestampType timestamps on both sides")
    }
    val union = taggedRight.unionByName(taggedLeft)
    if (near) {
      // Both candidates from one WindowExec pass (same partition/order
      // spec, two frames); per-direction tolerance, then min-|gap| with
      // backward winning ties. A closer-but-out-of-tolerance candidate
      // cannot exist (closer gap ≤ tol whenever the farther one is).
      val bGap = unix_micros(col("__asof_ts")) -
        unix_micros(col("__asof_b").getField(rightTs))
      val fGap = unix_micros(col("__asof_f").getField(rightTs)) -
        unix_micros(col("__asof_ts"))
      val tolUs = toleranceMs.map(_ * 1000L)
      val bOk = tolUs.map(t => when(bGap <= t, col("__asof_b")))
        .getOrElse(col("__asof_b"))
      val fOk = tolUs.map(t => when(fGap <= t, col("__asof_f")))
        .getOrElse(col("__asof_f"))
      return union
        .withColumn("__asof_b",
          last(col("__asof_payload"), ignoreNulls = true).over(wPrec))
        .withColumn("__asof_f",
          first(col("__asof_payload"), ignoreNulls = true).over(wFoll))
        .withColumn("__asof_match",
          when(bOk.isNotNull && (fOk.isNull || bGap <= fGap), bOk)
            .otherwise(fOk))
        .filter(col("__asof_side") === lit(leftSide))
        .select(keys.map(qcol) ++ leftPayload.map(qcol) ++
          rightPayload.zip(outRight).map { case (c, o) =>
            col("__asof_match").getField(c).as(o)
          }: _*)
    }
    val sweepFn =
      if (fwd) first(col("__asof_payload"), ignoreNulls = true)
      else last(col("__asof_payload"), ignoreNulls = true)
    val swept = union
      .withColumn("__asof_match", sweepFn.over(w))
    val bounded = toleranceMs match {
      // µs precision (the parquet timestamp resolution): an ms-truncated
      // difference would admit matches up to 999 µs older than the stated
      // tolerance on sub-millisecond data.
      case Some(tol) =>
        val gapUs =
          if (fwd) unix_micros(col("__asof_match").getField(rightTs)) -
            unix_micros(col("__asof_ts"))
          else unix_micros(col("__asof_ts")) -
            unix_micros(col("__asof_match").getField(rightTs))
        swept.withColumn("__asof_match",
          when(gapUs <= tol * 1000L, col("__asof_match")))
      case None => swept
    }
    bounded
      .filter(col("__asof_side") === lit(leftSide))
      .select(keys.map(qcol) ++ leftPayload.map(qcol) ++
        rightPayload.zip(outRight).map { case (c, o) =>
          col("__asof_match").getField(c).as(o)
        }: _*)
  }
}
