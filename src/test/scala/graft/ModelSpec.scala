package graft

import graft.model._
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("typed datasets round-trip the catalog tables") {
    val del: Seq[Delegation] = Model.delegations(spark, sf).head(3).toSeq
    assert(del.nonEmpty && del.forall(_.hq_id.startsWith("N")))
    val edges = Model.hierEdges(spark, sf)
    assert(edges.filter(_.child_type == "Nation").count() == 25)
    assert(Model.trustEdges(spark, sf).count() == 149) // 150 customers, chain
  }

  test("typed transformations keep compile-time field safety") {
    import spark.implicits._
    // groupByKey on a case-class field — the typed path the state layer uses.
    val byHq = Model.delegations(spark, sf)
      .groupByKey(_.hq_id).count().collect().toMap
    assert(byHq.values.sum == 150)
  }
}
