package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

class SourcesSpec extends SparkSpecBase {

  private def write(path: String, content: String, gzip: Boolean = false): Unit = {
    val os = new FileOutputStream(path)
    val w = new BufferedWriter(new OutputStreamWriter(
      if (gzip) new GZIPOutputStream(os) else os, "UTF-8"))
    w.write(content); w.close()
  }

  test("CSV source with header (S6)") {
    val dir = tmpDir("src-csv")
    write(s"$dir/companies.csv", "id,name,country\n1,Acme,DE\n2,Beta,FR\n")
    val df = Sources.csv(spark, s"$dir/companies.csv")
    assert(df.columns.toSeq == Seq("id", "name", "country"))
    assert(df.count() == 2)
    assert(df.filter(col("country") === "DE").count() == 1)
  }

  test("JSONL line mode + gzip transparent decompress (S3/S4/S7)") {
    val dir = tmpDir("src-jsonl")
    val lines = """{"id":1,"title":"a"}""" + "\n" + """{"id":2,"title":"b"}""" + "\n"
    write(s"$dir/pubs.jsonl.gz", lines, gzip = true)
    val df = Sources.jsonl(spark, s"$dir/pubs.jsonl.gz")
    assert(df.count() == 2)
    assert(df.select(sum("id")).collect().head.getLong(0) == 3)
  }

  test("document mode: whole file as one record (S5)") {
    val dir = tmpDir("src-doc")
    write(s"$dir/doc.json", """{"list": [{"id": 1}, {"id": 2}, {"id": 3}]}""")
    val df = Sources.jsonDocument(spark, s"$dir/doc.json")
    assert(df.count() == 1)
    val whole = Sources.wholeText(spark, s"$dir/doc.json")
    assert(whole.count() == 1)
    assert(whole.select("value").collect().head.getString(0).contains("\"list\""))
  }

  test("line reader with head-limit (L1) and redirect-line skip (F2)") {
    val dir = tmpDir("src-lines")
    write(s"$dir/data.txt", (1 to 100).map(i => s"line $i").mkString("\n") +
      "\nREDIRECT: elsewhere\n")
    val limited = Sources.lines(spark, s"$dir/data.txt", limit = Some(50))
    assert(limited.count() == 50)
    val all = Sources.lines(spark, s"$dir/data.txt")
    val kept = Sources.dropRedirectLines(all, "^REDIRECT:")
    assert(kept.count() == 100)
  }

  test("head-limit is PER FILE: 2 files x limit n reads 2n rows, each file's head (L1)") {
    val dir = tmpDir("src-lines-pf")
    write(s"$dir/a.txt", (1 to 100).map(i => s"a $i").mkString("\n") + "\n")
    write(s"$dir/b.txt", (1 to 80).map(i => s"b $i").mkString("\n") + "\n")
    val limited = Sources.lines(spark, s"$dir/*.txt", limit = Some(30))
    val got = limited.collect().map(r => (r.getAs[String]("path"), r.getAs[String]("value")))
    assert(got.length == 60) // 2 files x 30, not a global 30
    // exactly the first 30 lines of EACH file (reference semantics,
    // ConvertToRDFLambda.java:502-505)
    val aLines = got.filter(_._1.endsWith("a.txt")).map(_._2).toSet
    val bLines = got.filter(_._1.endsWith("b.txt")).map(_._2).toSet
    assert(aLines == (1 to 30).map(i => s"a $i").toSet)
    assert(bLines == (1 to 30).map(i => s"b $i").toSet)
  }

  test("mapping router: include/exclude regex on path (F1)") {
    val dir = tmpDir("src-route")
    write(s"$dir/publications_2024.jsonl", """{"id":1}""")
    write(s"$dir/authors_2024.jsonl", """{"id":2}""")
    val df = spark.read.text(s"$dir/*.jsonl").withColumn("path", input_file_name())
    val pubs = Sources.routeByPath(df, "publications_.*\\.jsonl",
      exclude = Some(".*authors.*"))
    assert(pubs.count() == 1)
    assert(pubs.select("path").collect().head.getString(0).contains("publications"))
  }

  test("root-to-list wrap + iterator explode with __index (N1/N3/N5)") {
    val dir = tmpDir("src-iter")
    write(s"$dir/recs.jsonl",
      """{"list":[{"id":10,"v":"x"},{"id":11,"v":"y"}]}""" + "\n" +
      """{"list":[{"id":20,"v":"z"}]}""" + "\n")
    val raw = spark.read.text(s"$dir/recs.jsonl")
    val items = Sources.explodeIterator(raw, "value", StructType(Seq(
      StructField("id", LongType), StructField("v", StringType))))
    val got = items.select(col("__index"), col("__item.id"), col("__item.v"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((0, 10L, "x"), (1, 11L, "y"), (0, 20L, "z")))
  }
}
