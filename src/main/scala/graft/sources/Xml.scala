package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import javax.xml.parsers.DocumentBuilderFactory
import javax.xml.xpath.{XPathConstants, XPathFactory}
import org.w3c.dom.NodeList
import java.io.ByteArrayInputStream

/** XML source (SURVEY §2.1 S8 — the reference's CARML XPathResolver,
  * MappingManager.java:203). No XML datasource ships in this environment, so
  * this is a partition-local JDK-DOM parser: whole-file documents → an XPath
  * row iterator → typed columns. Secure-by-default parser config (no DTD/
  * external entities). Parsing runs inside mapPartitions with one reused
  * parser per partition — the same batched shape as the multimodal codec.
  */
object Xml {

  /** Explode `rowXPath` matches of each XML document into rows; for each row
    * evaluate `fieldXPaths` (name → relative XPath) as string columns.
    * Input: DataFrame with (path, value) as produced by Sources.wholeText.
    */
  def parse(docs: DataFrame, rowXPath: String,
      fieldXPaths: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fields = fieldXPaths // serializable copy
    val rows: Dataset[(String, Seq[String])] = docs
      .select(col("path"), col("value"))
      .as[(String, String)]
      .mapPartitions { it =>
        val dbf = DocumentBuilderFactory.newInstance()
        dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        dbf.setExpandEntityReferences(false)
        val builder = dbf.newDocumentBuilder()
        val xpath = XPathFactory.newInstance().newXPath()
        val rowExpr = xpath.compile(rowXPath)
        val fieldExprs = fields.map { case (_, p) => xpath.compile(p) }
        it.flatMap { case (path, xml) =>
          val doc = builder.parse(new ByteArrayInputStream(xml.getBytes("UTF-8")))
          val nodes = rowExpr.evaluate(doc, XPathConstants.NODESET).asInstanceOf[NodeList]
          (0 until nodes.getLength).map { i =>
            val node = nodes.item(i)
            path -> fieldExprs.map { e =>
              val v = e.evaluate(node)
              if (v == null || v.isEmpty) null else v
            }
          }
        }
      }
    val named = rows.toDF("path", "__fields")
    fields.zipWithIndex.foldLeft(named) { case (df, ((name, _), i)) =>
      df.withColumn(name, col("__fields").getItem(i))
    }.drop("__fields")
  }
}
