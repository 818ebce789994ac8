package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair (2-itemset) mining — the market-basket primitive behind
  * "bought together" and feature-co-occurrence analyses.
  *
  * Scale shape: the pair explosion is the danger (a basket of k items
  * yields k² pairs, and a corpus-wide self-join on the basket key
  * multiplies row counts before anything aggregates). Two defenses, both
  * standard and both load-bearing at 100 TB:
  *
  *  1. Apriori item prune: a pair cannot reach `minSupport` unless BOTH
  *     its items do, so infrequent items are dropped BEFORE the
  *     self-join — on a heavy-tailed vocabulary this removes most of
  *     the long tail and with it most candidate pairs.
  *  2. The self-join keys on the basket id, so fan-out is bounded by
  *     basket size (TPC-H orders: ≤7 lines), never by item popularity;
  *     a hot basket is AQE skew-split territory, not a crossed hot key.
  */
object Itemsets {

  /** Pairs of items co-occurring in ≥ `minSupport` distinct baskets.
    * Output: (item_a, item_b, support) with item_a < item_b.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val op = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val frequent = op.groupBy(col("i"))
      .agg(count(lit(1)).as("item_sup"))
      .filter(col("item_sup") >= minSupport)
      .select(col("i"))
    val pruned = op.join(frequent, "i")
    pruned.select(col("b"), col("i").as("item_a"))
      .join(pruned.select(col("b"), col("i").as("item_b")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
