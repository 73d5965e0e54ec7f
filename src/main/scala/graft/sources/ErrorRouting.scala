package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bad-record routing (SURVEY §2.10 C10): the reference logs and counts
  * per-line conversion failures and fails a file only if every line fails
  * (ConvertToRDFLambda.java:527-547). Spark-native equivalent: parse with
  * `from_json`, split good/bad declaratively, and write the bad side to a
  * quarantine path (the `badRecordsPath` analog) so the main stream never
  * aborts on malformed input.
  */
object ErrorRouting {

  final case class Routed(good: DataFrame, bad: DataFrame)

  /** Split raw JSON lines into (parsed good rows, bad raw lines + error tag).
    * A line is bad when from_json yields null (malformed) — required fields
    * can additionally be enforced via `requiredCols`.
    */
  def parseJsonLines(raw: DataFrame, schema: StructType,
      lineCol: String = "value",
      requiredCols: Seq[String] = Seq.empty): Routed = {
    // PERMISSIVE from_json yields an all-null struct for malformed input, so
    // malformed-ness is detected via an explicit corrupt-record column.
    val corrupt = "_corrupt_record"
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        corrupt, org.apache.spark.sql.types.StringType))
    val parsed = raw.withColumn("__rec",
      from_json(col(lineCol), schemaWithCorrupt,
        Map("columnNameOfCorruptRecord" -> corrupt)))
    val malformed = col(s"__rec.$corrupt").isNotNull
    val missingRequired = requiredCols
      .map(c => col(s"__rec.$c").isNull)
      .foldLeft(lit(false))(_ || _)
    val good = parsed.filter(!malformed && !missingRequired)
      .select(col("__rec.*")).drop(corrupt)
    val bad = parsed.filter(malformed || missingRequired).select(
      col(lineCol).as("raw"),
      when(malformed, lit("malformed_json"))
        .otherwise(lit("missing_required_field")).as("error"))
    Routed(good, bad)
  }

  /** Fail-only-if-all-lines-fail policy (the reference's per-file verdict):
    * returns per-file (path, total, failed) so callers can decide.
    */
  def fileVerdicts(raw: DataFrame, schema: StructType,
      lineCol: String = "value", pathCol: String = "path"): DataFrame = {
    val corrupt = "_corrupt_record"
    val schemaWithCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields :+ org.apache.spark.sql.types.StructField(
        corrupt, org.apache.spark.sql.types.StringType))
    val parsed = raw.withColumn("__rec",
      from_json(col(lineCol), schemaWithCorrupt,
        Map("columnNameOfCorruptRecord" -> corrupt)))
    parsed.groupBy(col(pathCol))
      .agg(count(lit(1)).as("total"),
        count(when(col(s"__rec.$corrupt").isNotNull, 1)).as("failed"))
      .withColumn("file_failed", col("failed") === col("total"))
  }
}
