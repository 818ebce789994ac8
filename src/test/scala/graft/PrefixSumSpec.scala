package graft

import graft.operators.PrefixSum
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The distributed prefix sum must equal the sequential definition under
  * any partitioning — the property that makes it safe to replace the
  * single-task Window.orderBy cumsum.
  */
class PrefixSumSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("parity with the sequential cumulative sum across partitions") {
    val rnd = new scala.util.Random(99)
    val rows = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong,
      rnd.nextInt(10).toLong))
    // Deliberately many input partitions so range repartitioning works.
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 13)).toDF("k", "a", "b")
    val got = PrefixSum.running(df, Seq(col("k").asc), Seq("a", "b"))
      .select("k", "a_cum", "b_cum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var (ra, rb) = (0L, 0L)
    rows.sortBy(_._1).zip(got).foreach { case ((k, a, b), (gk, ga, gb)) =>
      ra += a; rb += b
      assert(gk == k && ga == ra && gb == rb,
        s"prefix sum diverged at k=$k: ($ga,$gb) != ($ra,$rb)")
    }
  }

  test("non-BIGINT value columns are rejected loudly") {
    val df = Seq((1L, 1.5)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      PrefixSum.running(df, Seq(col("k")), Seq("x"))
    }
  }
}
