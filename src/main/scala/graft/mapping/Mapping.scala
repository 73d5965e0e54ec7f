package graft.mapping

import com.fasterxml.jackson.databind.ObjectMapper

import graft.functions.Rml
import graft.sources.{Sources, Xml}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The reference's mapping-configuration system re-expressed Spark-first:
  * `mappings.json` → `MappingConfig`/`MappingSpec` (id, include/exclude
  * patterns, processing hints, line mode — /root/reference
  * .../MappingSpec.java:21-110, MappingConfig.java:15-57,
  * MappingManager.java:101-152), where each RML mapping file's projections
  * become declarative field specs compiled to a `Column` pipeline
  * (the reference's CARML TriplesMap set → our select/withColumn chain,
  * ConvertToRDFLambda.java:553-603).
  *
  * Mappings stay DATA, not code — the reference's schema-evolution model
  * (edit mappings.json, no redeploy) is preserved: [[MappingConfig.fromJson]]
  * loads specs at runtime.
  */
final case class FieldSpec(
    name: String,
    from: String, // JSON field path (dot-separated) or CSV column
    dataType: String = "string", // string|int|long|double|boolean|timestamp|date
    function: Option[String] = None, // see MappingCompiler.Functions
    validation: String = "fallbackToNull") // none|failFast|fallbackToNull|placeholder:<v>

final case class MappingSpec(
    id: String,
    format: String, // csv | jsonl | json-document | xml
    sourceFileIncludePattern: String,
    sourceFileExcludePattern: Option[String] = None,
    // array field to explode (RML iterator, N5); for format=xml this is the
    // row XPath (the reference routes XML through the same mappings.json,
    // MappingManager.java:203)
    iterator: Option[String] = None,
    fields: Seq[FieldSpec] = Seq.empty,
    // root-to-list | deletion-detection | copy-file | json-hierarchy
    processingHints: Set[String] = Set.empty,
    lineLimit: Option[Int] = None) {

  /** F1 router predicate — Mapping.matches (Mapping.java:67-81). */
  def matches(path: String): Boolean =
    path.matches(s".*${sourceFileIncludePattern}.*") &&
      sourceFileExcludePattern.forall(p => !path.matches(s".*$p.*"))
}

object MappingConfig {
  /** Parse a mappings.json-shaped config (array of spec objects). */
  def fromJson(path: String): Seq[MappingSpec] = {
    val m = new ObjectMapper()
    val root = m.readValue(new java.io.File(path), classOf[java.util.List[java.util.Map[String, Object]]])
    root.asScala.toSeq.map { o =>
      def str(k: String): Option[String] = Option(o.get(k)).map(_.toString)
      val fields = Option(o.get("fields")).map(_.asInstanceOf[java.util.List[java.util.Map[String, Object]]]
        .asScala.toSeq.map { f =>
          def fs(k: String): Option[String] = Option(f.get(k)).map(_.toString)
          FieldSpec(
            name = f.get("name").toString,
            from = f.get("from").toString,
            dataType = fs("dataType").getOrElse("string"),
            function = fs("function"),
            validation = fs("validation").getOrElse("fallbackToNull"))
        }).getOrElse(Seq.empty)
      MappingSpec(
        id = o.get("id").toString,
        format = str("format").getOrElse("jsonl"),
        sourceFileIncludePattern = o.get("sourceFileIncludePattern").toString,
        sourceFileExcludePattern = str("sourceFileExcludePattern"),
        iterator = str("iterator"),
        fields = fields,
        processingHints = Option(o.get("processingHints"))
          .map(_.asInstanceOf[java.util.List[String]].asScala.toSet).getOrElse(Set.empty),
        lineLimit = str("lineLimit").map(_.toInt))
    }
  }

  /** Route a file path to its mapping — no match is an error, like the
    * reference's failed task (ConvertToRDFLambda.java:256-263).
    */
  def route(specs: Seq[MappingSpec], path: String): MappingSpec =
    specs.sortBy(_.id).find(_.matches(path)).getOrElse(
      throw new IllegalArgumentException(s"no mapping matches: $path"))
}

object MappingCompiler {

  private def sqlType(t: String): DataType = t match {
    case "string" => StringType
    case "int" => IntegerType
    case "long" => LongType
    case "double" => DoubleType
    case "boolean" => BooleanType
    case "timestamp" => TimestampType
    case "date" => DateType
    case other => throw new IllegalArgumentException(s"unknown dataType: $other")
  }

  /** XSD-validation-mode analog (MappingManager.java:217-251). */
  private def castPolicy(c: Column, t: DataType, validation: String): Column =
    validation match {
      case "none" | "failFast" => Rml.castStrict(c, t) // failFast under ANSI
      case "fallbackToNull" => c.try_cast(t)
      case v if v.startsWith("placeholder:") =>
        Rml.castWithPlaceholder(c, t, v.stripPrefix("placeholder:"))
      case other => throw new IllegalArgumentException(s"unknown validation: $other")
    }

  /** FNO/GREL function registry analog (MappingManager.java:211-212). */
  private def applyFunction(c: Column, fn: String): Column = fn match {
    case "normalizeDate" => Rml.normalizeDate(c)
    case "epochTimeToDateTime" => Rml.epochTimeToDateTime(c)
    case "normalizeUnixDate" => Rml.normalizeUnixDate(c)
    case "toLowerCase" => lower(c)
    case "toUpperCase" => upper(c)
    case "trim" => trim(c)
    case "md5" => md5(c)
    case "sha1" => sha1(c)
    case f if f.startsWith("hashedIri:") =>
      Rml.generateHashedIri(f.stripPrefix("hashedIri:"), c)
    case other => throw new IllegalArgumentException(s"unknown function: $other")
  }

  /** Compile one mapping over its source files → typed DataFrame.
    *
    * Pipeline (mirrors §3.3's single-file conversion): read per format →
    * optional recursive parent enrichment (N2 `json-hierarchy` hint,
    * SpecialCases.java:143-189) → optional iterator explode (N5, with
    * `__index`, N3) → field projection with functions + cast policy (§2.8)
    * → record id (N4: id/ocid coalesce) → deletion detection
    * (`recordStatus == "obsolete"` → op=delete, F6/C3).
    *
    * XML (S8): `iterator` is the row XPath and each field's `from` is a
    * relative XPath — same config surface, delegating to [[Sources]]/
    * [[graft.sources.Xml]].
    */
  def compile(spark: SparkSession, spec: MappingSpec, path: String): DataFrame = {
    require(spec.matches(path), s"mapping ${spec.id} does not match $path")

    if (spec.processingHints.contains("copy-file")) // S9 passthrough
      return spark.read.text(path)

    // N2: recursive __parent_*/__parentKey/__index push-down into nested
    // objects and array elements (native codegen'd expression — the document
    // tree is dynamic, so this cannot be a static schema transform).
    def enriched(c: Column): Column =
      if (spec.processingHints.contains("json-hierarchy"))
        graft.functions.expressions.JsonHierarchy.enrichCol(c)
      else c

    val raw: DataFrame = spec.format match {
      case "csv" => Sources.csv(spark, path)
      case "xml" =>
        val rowXPath = spec.iterator.getOrElse(throw new IllegalArgumentException(
          s"xml mapping ${spec.id} requires iterator = row XPath"))
        Xml.parse(Sources.wholeText(spark, path), rowXPath,
          spec.fields.map(f => f.name -> f.from))
      case "jsonl" =>
        val lines = Sources.lines(spark, path, spec.lineLimit)
          .withColumn("value", enriched(col("value")))
        spec.iterator match {
          case Some(_) if spec.processingHints.contains("root-to-list") =>
            // N1: the reference wraps each line as {"<it>": [<line>]} so the
            // iterator yields the line itself — the wrap is an identity here.
            lines.withColumn("__json", col("value"))
          case Some(it) =>
            // N5 RML iterator: explode the array; each element becomes one
            // record's raw JSON (StringType capture of nested objects).
            lines.select(posexplode(from_json(
                get_json_object(col("value"), s"$$.$it"),
                ArrayType(StringType))).as(Seq("__index", "__json")))
          case None => lines.withColumn("__json", col("value"))
        }
      case "json-document" => Sources.wholeText(spark, path)
        .select(enriched(col("value")).as("__json"), col("path"))
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }

    val projected = spec.format match {
      case "csv" =>
        raw.select(spec.fields.map(f => fieldCol(col(f.from), f)): _*)
      case "xml" =>
        // Xml.parse already named the columns; apply functions + cast policy
        raw.select(spec.fields.map(f => fieldCol(col(f.name), f)): _*)
      case _ =>
        // JSON: extract each field by path from the record json
        val withFields = spec.fields.map { f =>
          fieldCol(get_json_object(col("__json"), s"$$.${f.from}"), f)
        }
        val idCol = coalesce(
          get_json_object(col("__json"), "$.id"),
          get_json_object(col("__json"), "$.ocid")).as("__record_id") // N4
        val opCol = (if (spec.processingHints.contains("deletion-detection"))
          when(get_json_object(col("__json"), "$.recordStatus") === "obsolete",
            lit("delete")).otherwise(lit("insert"))
        else lit("insert")).as("op") // F6/C3
        raw.select(withFields :+ idCol :+ opCol: _*)
    }
    projected
  }

  private def fieldCol(src: Column, f: FieldSpec): Column = {
    val fd = f.function.map(applyFunction(src, _)).getOrElse(src)
    castPolicy(fd, sqlType(f.dataType), f.validation).as(f.name)
  }
}
