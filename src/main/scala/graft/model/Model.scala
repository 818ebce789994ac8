package graft.model

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row models (SURVEY.md §7 step 1, FIXTURES.md F1-F6): case-class
  * `Encoder`s for the reference's core entities, derived from the driver
  * test tables. `Dataset[T]` where compile-time field checks help (the
  * mutation/state layer and traversal seeds); plain `DataFrame` elsewhere
  * (dynamic schemas, oracle queries).
  */
final case class Delegation(drone_id: Long, hq_id: String)        // F2
final case class HierEdge(parent: String, child: String,          // F1
    child_type: String)
final case class Mission(mission_id: String, drone_id: String,    // F3
    payload: String, signature: Array[Byte])
final case class TrustEdge(parent: String, child: String)         // F6
final case class VcRow(vc_id: String, issuer_did: String,         // F4
    subject_did: String, vc_json: String)
final case class CdcEvent(op: String, ts_ms: Long, id: Long,      // F8
    name: String)

object Model {

  def delegations(spark: SparkSession, d: String): Dataset[Delegation] = {
    import spark.implicits._
    Tables.customer(spark, d).select(
      col("c_custkey").as("drone_id"),
      concat(lit("N"), col("c_nationkey").cast("string")).as("hq_id"))
      .as[Delegation]
  }

  def hierEdges(spark: SparkSession, d: String): Dataset[HierEdge] = {
    import spark.implicits._
    graft.graph.GraphData.hierarchyEdges(spark, d).as[HierEdge]
  }

  def trustEdges(spark: SparkSession, d: String): Dataset[TrustEdge] = {
    import spark.implicits._
    graft.graph.GraphData.trustChain(spark, d).as[TrustEdge]
  }
}
