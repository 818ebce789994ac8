package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariant tests for the query catalog at sf0.001. The strong
  * correctness gate is the DuckDB oracle compare (scripts/selfcheck.py /
  * driver Verify); these pin cheap structural invariants.
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and column names are sorted-stable") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val cols = df.columns
      assert(cols.nonEmpty, s"$name has no columns")
      assert(cols.distinct.length == cols.length, s"$name has dup columns")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("r1 per-level counts equal table cardinalities under R0") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.GraphQueries.r1ChainLevels(spark, sf)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val nations = Tables.nation(spark, sf)
      .filter(col("n_regionkey") === 0).count()
    assert(rows(1) == nations)
  }
}
