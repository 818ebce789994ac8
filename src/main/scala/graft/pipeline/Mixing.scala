package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-mixture weighting: turn per-group (language, source, domain)
  * token counts into temperature-smoothed sampling weights and token
  * quotas — the mixture-design step of corpus assembly. Sampling
  * groups proportionally to `p^alpha` (alpha < 1 upsamples the tail,
  * alpha = 1 reproduces the natural distribution) is the standard
  * multilingual/domain-balance recipe.
  *
  * Shape: one map-side-combined aggregation over the corpus reduces
  * everything to k rows (k = group count); the normalizing windows run
  * on those k rows only, so the single-partition window frame — the
  * usual scale trap — is bounded by the number of groups, not the data.
  */
object Mixing {

  /** Per group: doc/token counts, the natural token share `p_raw`, the
    * temperature-smoothed mixture `weight` (`p^alpha` normalized), and
    * the token `quota` out of `budget`. `p_raw`/`weight` are rounded to
    * 6 decimals for engine-stable comparison; the quota is computed
    * from the unrounded weight.
    */
  def temperatureQuotas(docs: DataFrame, groupCol: String, alpha: Double,
      budget: Long, textCol: String = "text"): DataFrame = {
    require(alpha > 0.0, s"alpha must be positive, got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val all = Window.partitionBy() // k-row frame, post-aggregation
    docs
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col(textCol), "\\s+")).cast("long")).as("n_tokens"))
      .withColumn("__p", col("n_tokens") / sum(col("n_tokens")).over(all))
      .withColumn("__w",
        pow(col("__p"), alpha) / sum(pow(col("__p"), alpha)).over(all))
      .select(col(groupCol), col("n_docs"), col("n_tokens"),
        round(col("__p"), 6).as("p_raw"),
        round(col("__w"), 6).as("weight"),
        round(col("__w") * budget).cast("long").as("quota"))
  }
}
