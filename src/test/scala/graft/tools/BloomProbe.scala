package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off capability probe: is Spark's internal bloom-filter pair
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the expressions
  * behind AQE runtime filters) reachable from the public session, either
  * via the SQL registry or via temp-function registration? Decides the
  * implementation route for the d22 novelty gate.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).createOrReplaceTempView("t")
    try {
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "bloom_build",
        exprs => new BloomFilterAggregate(exprs.head, exprs(1), exprs(2))
          .toAggregateExpression(), "built-in")
      reg.createOrReplaceTempFunction(
        "bloom_might_contain",
        exprs => BloomFilterMightContain(exprs.head, exprs(1)), "built-in")
      val bf = spark.sql(
        "SELECT bloom_build(xxhash64(id), 1000L, 8000L) AS f FROM t")
      bf.createOrReplaceTempView("bfv")
      println("AGG_OK rows=" + bf.count())
      println("REG " + spark.sql(
        "SELECT count(*) n FROM range(2000) p WHERE bloom_might_contain((SELECT f FROM bfv), xxhash64(p.id))")
        .collect().head)
    } catch { case e: Throwable => println("REG_FAIL " + e.getMessage.take(300)) }
    spark.stop()
  }
}
