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

  test("cross-representation equality: graph traversal count == relational join count") {
    // Mirrors the reference's traversal_verify.py: the same question answered
    // through the graph encoding (j8: var-length traversal + reverse expand)
    // and pure relational FK joins must agree.
    import org.apache.spark.sql.functions._
    val viaGraph = graft.queries.GraphQueries.j8HierVcCount(spark, sf)
      .head().getLong(0)
    val l = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf)
    val viaRelational = l
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .filter(n("n_regionkey") === 0)
      .count()
    assert(viaGraph == viaRelational)
  }

  test("abac SQL twin and Cypher twin diverge as designed") {
    // The SQL twin walks the subgroup chain (grants transitively reachable
    // perms); the Cypher twin only sees direct membership — reference
    // wrinkle R4. Every Cypher-twin grantee must be directly in the top
    // group; the SQL twin can grant users the Cypher twin cannot.
    import org.apache.spark.sql.functions._
    val topKey = Tables.nation(spark, sf)
      .agg(max(col("n_nationkey"))).head().getInt(0)
    val direct = graft.queries.GraphQueries.r4AbacCypherTwin(spark, sf)
      .select("user_id").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().toSet
    val inTop = Tables.customer(spark, sf)
      .filter(col("c_nationkey") === topKey)
      .select(concat(lit("C"), col("c_custkey").cast("string")))
      .as[String](org.apache.spark.sql.Encoders.STRING).collect().toSet
    assert(direct.nonEmpty && direct == inTop)
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
