package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve keys — multi-dimensional data clustering for
  * scan pruning, the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER
  * BY`. Sorting a table by the interleaved key places rows close in BOTH
  * dimensions into the same files/row groups, so min/max footer stats
  * prune a scan that filters on either column — where a linear sort
  * prunes only its leading column and a y-only predicate must read
  * every file.
  *
  * Built as a pure `Column` expression tree (shift/mask/or per bit):
  * no UDF, stays inside whole-stage codegen, and constant-folds when
  * inputs are literals. 2·bits terms — for the default 16 bits the
  * expression is 32 shift-and-or nodes, well under codegen limits.
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative columns:
    * bit j of `x` lands at position 2j, bit j of `y` at 2j+1.
    * Callers bound the domain (e.g. `pmod(k, 1 << bits)`).
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { j =>
      shiftleft(shiftright(xs, j).bitwiseAND(lit(1L)), 2 * j)
        .bitwiseOR(
          shiftleft(shiftright(ys, j).bitwiseAND(lit(1L)), 2 * j + 1))
    }.reduce(_.bitwiseOR(_))
  }
}
