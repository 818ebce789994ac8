package graft

import graft.queries.Prepared
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the prepared-statement surface: the closure-backed bind path
  * must agree with the native recursive-CTE twin on every binding (same
  * bag semantics, both parameterized through `spark.sql(text, args)`),
  * and a bind whose depth exceeds what preparation materialized must
  * raise rather than silently undercount.
  */
class PreparedSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("closure-backed bind matches the recursive-CTE twin per binding") {
    val pq = Prepared.wotPathCount(spark, sf)
    val rcte = Prepared.wotPathCountRcte(spark, sf)
    for ((c, l, a) <- Seq(("E0", 20, "E15"), ("E3", 5, "E8"),
        ("E0", 5, "E15"), ("E2", 13, "E15"))) {
      val args = Map[String, Any]("client" -> c, "length" -> l, "anchor" -> a)
      val got = pq.bind(args).as[Long].head()
      val want = rcte.bind(args).as[Long].head()
      assert(got == want, s"binding ($c,$l,$a): closure $got vs rcte $want")
    }
  }

  test("bind length past the prepared maxDepth raises, never undercounts") {
    val pq = Prepared.wotPathCount(spark, sf, maxDepth = 4)
    val e = intercept[Exception] {
      pq.bind(Map[String, Any]("client" -> "E0", "length" -> 5,
        "anchor" -> "E3")).count()
    }
    assert(e.getMessage != null)
  }
}
