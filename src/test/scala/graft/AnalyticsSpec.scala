package graft

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the event-analytics family (the oracle
  * hash-compare is the strong gate; these pin the semantics that make
  * each shape correct by construction).
  */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("funnel steps are strictly ordered and monotonically attriting") {
    val rows = AnalyticsQueries.f1Funnel(spark, sf).collect()
    rows.foreach { r =>
      val t1 = r.getLong(1)
      val t2 = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val t3 = if (r.isNullAt(3)) None else Some(r.getLong(3))
      t2.foreach(v => assert(v > t1, "step 2 must follow step 1"))
      t3.foreach { v =>
        assert(t2.nonEmpty, "step 3 requires step 2")
        assert(v > t2.get, "step 3 must follow step 2")
      }
    }
    val n1 = rows.length
    val n2 = rows.count(!_.isNullAt(2))
    val n3 = rows.count(!_.isNullAt(3))
    assert(n1 >= n2 && n2 >= n3 && n3 > 0 && n2 < n1,
      s"funnel must attrit: $n1 -> $n2 -> $n3")
  }

  test("gap-fill covers every user's span contiguously; zeros add nothing") {
    val rows = AnalyticsQueries.o7GapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    byUser.values.foreach { g =>
      val hours = g.map(_._2).sorted
      assert(hours.length == (hours.last - hours.head) / 3600000L + 1,
        "hour axis must be contiguous")
      assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600000L })
    }
    val total = rows.map(_._3).sum
    assert(total == Tables.events(spark, sf).count(),
      "zero-filling must not change the event total")
    assert(rows.exists(_._3 == 0L), "fixture must contain real gaps")
  }

  test("cohort retention: offset-0 cell equals the cohort size") {
    val rows = AnalyticsQueries.c1CohortRetention(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    val cohortSizes = Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.filter(_._2 == 0).foreach { case (day, _, n) =>
      assert(n == cohortSizes(day), s"offset-0 of $day must equal cohort size")
    }
    assert(rows.forall(_._2 >= 0), "no activity before the cohort day")
  }
}
