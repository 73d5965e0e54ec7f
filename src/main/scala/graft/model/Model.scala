package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core data model of the CDC engine.
  *
  * A change event is one row of a binlog/WAL-style changelog over multi-turn
  * conversation transcripts, keyed by (conv_id, turn_idx):
  *   - `ts`  — event time; last-write-wins version (the reference's "version
  *     := source S3 key", /root/reference SpecialCases.java:218)
  *   - `op`  — CDC operation; the reference's `urn:recordStatus` obsolete
  *     marker → delete (SpecialCases.java:237-249)
  *   - `seq` — changelog sequence number, the LWW tie-break; unique per event
  *
  * `tool` (and any later metadata columns) arrive via ADDITIVE schema
  * evolution: old events simply lack the column (reference: mappings are
  * editable data, MappingManager.java:115-152).
  */
final case class ChangeEvent(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp,
    op: String, // insert | update | delete
    seq: Long)

/** A materialized transcript turn (the table's logical row). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: Option[String],
    ts: java.sql.Timestamp,
    seq: Long)

object Model {
  val KeyCols: Seq[String] = Seq("conv_id", "turn_idx")
  val VersionCols: Seq[String] = Seq("ts", "seq")

  val OpInsert = "insert"
  val OpUpdate = "update"
  val OpDelete = "delete"

  /** Canonical changelog schema (v1 = without `tool`; v2 adds it additively). */
  val changeEventSchemaV1: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("seq", LongType, nullable = false)))

  val changeEventSchema: StructType = StructType(
    changeEventSchemaV1.fields.patch(4, Seq(StructField("tool", StringType, nullable = true)), 0))

  implicit val changeEventEncoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]
  implicit val turnEncoder: Encoder[Turn] = Encoders.product[Turn]

  /** Additive schema evolution: widen `df` to `target` by appending missing
    * columns as typed nulls, and widen `target` itself with any new columns
    * `df` carries. Never drops or retypes an existing column (strict additive
    * policy — new columns only; a type change is an error, mirroring the
    * reference's "mappings can add fields" evolution model).
    */
  def mergeSchemas(current: StructType, incoming: StructType): StructType = {
    val byName = current.fields.map(f => f.name -> f).toMap
    incoming.fields.foreach { f =>
      byName.get(f.name).foreach { cur =>
        require(cur.dataType == f.dataType,
          s"non-additive schema change on '${f.name}': ${cur.dataType} -> ${f.dataType}")
      }
    }
    val added = incoming.fields.filterNot(f => byName.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(current.fields ++ added)
  }

  /** Project `df` onto `schema`, filling absent columns with typed nulls.
    * Column order is normalized to the schema's order so unions and parquet
    * appends stay aligned.
    */
  def alignToSchema(df: DataFrame, schema: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols = schema.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
