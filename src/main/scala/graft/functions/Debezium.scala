package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Debezium change-event envelope (SURVEY.md §2.9 U11, §2.10 S5/S6).
  *
  * The reference wraps CDC rows in the Debezium JSON envelope
  * `{payload:{before, after, op∈{c,r,u,d}, ts_ms, source{connector,db,
  * table}}}` (reference: demo_sqlite_cdc/01_unit_test/
  * 07_test_kafka_producer.py:19-36) and dispatches on `op` in the sink
  * (06_postgres_cdc_sink.py:32-64). Build side uses `to_json(struct(...))`
  * with nulls kept (a Debezium `before` on insert IS null); parse side is
  * `from_json` with the typed schema — both codegen-friendly, no UDF.
  */
object Debezium {

  /** Envelope schema for a row type `id BIGINT, name STRING`. */
  val rowDdl = "id BIGINT, name STRING"
  val schema: StructType = StructType.fromDDL(
    s"""payload STRUCT<
       |  before: STRUCT<id: BIGINT, name: STRING>,
       |  after: STRUCT<id: BIGINT, name: STRING>,
       |  op: STRING, ts_ms: BIGINT,
       |  source: STRUCT<connector: STRING, db: STRING, `table`: STRING>>""".stripMargin)

  /** Build the envelope JSON column. `before`/`after` are typed structs
    * (null allowed); field order fixed alphabetically so the serialized
    * form is deterministic.
    */
  def envelope(before: Column, after: Column, op: Column, tsMs: Column,
      table: String): Column =
    to_json(
      struct(
        struct(
          after.as("after"),
          before.as("before"),
          op.as("op"),
          struct(lit("graft").as("connector"), lit("graftdb").as("db"),
            lit(table).as("table")).as("source"),
          tsMs.as("ts_ms")).as("payload")),
      java.util.Map.of("ignoreNullFields", "false"))

  /** Typed null struct for the absent side of the envelope. */
  def nullRow: Column = lit(null).cast(s"struct<$rowDdl>")

  /** Parse an envelope JSON string column into the typed payload struct. */
  def parseEnvelope(json: Column): Column = from_json(json, schema)

  /** Convenience: explode a parsed envelope DataFrame into flat CDC
    * columns (op, ts_ms, key id, after fields).
    */
  def flatten(df: DataFrame, jsonCol: String): DataFrame =
    df.withColumn("__env", parseEnvelope(col(jsonCol)))
      .select(
        col("__env.payload.op").as("op"),
        col("__env.payload.ts_ms").as("ts_ms"),
        coalesce(col("__env.payload.after.id"), col("__env.payload.before.id")).as("id"),
        col("__env.payload.after.name").as("name"))
}
