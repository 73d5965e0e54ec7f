package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source-format surface of the reference (SURVEY §2.1), Spark-native.
  *
  * The reference opens CSV / JSON / JSONL (plain or gzipped) either
  * line-by-line or whole-file (ConvertToRDFLambda.java:362-379 mode select;
  * FileHelper.java:133-160 transparent gzip), routes files to a mapping by
  * include/exclude regex (Mapping.java:67-81), and supports a per-file line
  * head-limit (ConvertToRDFLambda.java:502-505). Spark equivalents below;
  * gzip is transparent in every Spark file source (codec from extension).
  */
object Sources {

  /** CSV with header-named columns (CARML CsvResolver analog,
    * MappingManager.java:202).
    */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("header", "true")
    schema.fold(r.option("inferSchema", "true"))(r.schema).csv(path)
  }

  /** JSONL, one record per line (line mode). */
  def jsonl(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame =
    schema.fold(spark.read)(spark.read.schema).json(path)

  /** Whole-file-as-one-record mode (document mode,
    * ConvertToRDFLambda.java:458-484): multiLine JSON.
    */
  def jsonDocument(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** Raw line reader with the reference's `process.lines` head-limit,
    * applied PER FILE (ConvertToRDFLambda.java:502-505 truncates each file,
    * not the source): a multi-file source with limit n yields the first n
    * lines of every file.
    *
    * File order is reconstructed without giving up splittable reads:
    * within a scan partition rows arrive in file order, partitions of one
    * file are ordered by their block start offset (a line spanning a block
    * boundary belongs to the block containing its start — exactly how the
    * text reader assigns it), so (block_start, intra-partition sequence) IS
    * the line number ordering. The window shuffles one file per window
    * partition; the limit is a test/truncation tool in the reference, not a
    * hot path, so a per-file shuffle is acceptable.
    */
  def lines(spark: SparkSession, path: String, limit: Option[Int] = None): DataFrame = {
    val df = spark.read.text(path).withColumn("path", input_file_name())
    limit.fold(df) { n =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("path").orderBy(col("__blk"), col("__seq"))
      df.withColumn("__blk", input_file_block_start())
        .withColumn("__seq", monotonically_increasing_id()) // rises in row order within a partition
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= n)
        .drop("__blk", "__seq", "__rn")
    }
  }

  /** Whole file as one row (copy-file / passthrough analog, and the document
    * reader for non-JSON formats).
    */
  def wholeText(spark: SparkSession, path: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .withColumn("path", input_file_name())

  /** Mapping router (F1): include/exclude regex on the file path, mirroring
    * Mapping.matches (Mapping.java:67-81). Returns rows whose `path` matches
    * include and not exclude.
    */
  def routeByPath(df: DataFrame, include: String, exclude: Option[String] = None,
      pathCol: String = "path"): DataFrame = {
    val inc = df.filter(col(pathCol).rlike(include))
    exclude.fold(inc)(e => inc.filter(!col(pathCol).rlike(e)))
  }

  /** Redirect-line skip (F2, SpecialCases.java:191-200): drop raw lines
    * matching the configured pattern before any parsing.
    */
  def dropRedirectLines(df: DataFrame, pattern: String,
      lineCol: String = "value"): DataFrame =
    df.filter(!col(lineCol).rlike(pattern))

  /** JSONL + RML-iterator explode (S7/N5): parse each line with an explicit
    * schema carrying a `list` array and explode it, materializing the element
    * index (N3 `__index`, SpecialCases.java:181-183).
    */
  def explodeIterator(df: DataFrame, jsonCol: String, itemsSchema: StructType,
      iteratorField: String = "list"): DataFrame = {
    val parsed = df.withColumn("__doc",
      from_json(col(jsonCol), StructType(Seq(
        org.apache.spark.sql.types.StructField(iteratorField,
          org.apache.spark.sql.types.ArrayType(itemsSchema))))))
    parsed.select(col("*"),
        posexplode(col(s"__doc.$iteratorField")).as(Seq("__index", "__item")))
      .drop("__doc")
  }
}
