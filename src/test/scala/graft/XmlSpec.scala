package graft

import graft.sources.{Sources, Xml}

class XmlSpec extends SparkSpecBase {

  test("XML document parse: XPath row iterator + field extraction (S8)") {
    val dir = tmpDir("xml-src")
    val xml =
      """<?xml version="1.0"?>
        |<pubs>
        |  <pub id="p1"><title>First</title><year>2020</year></pub>
        |  <pub id="p2"><title>Second</title><year>2021</year></pub>
        |  <pub id="p3"><title>Third</title></pub>
        |</pubs>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pubs.xml"), xml)
    val docs = Sources.wholeText(spark, s"$dir/pubs.xml")
    val rows = Xml.parse(docs, "/pubs/pub",
      Seq("id" -> "@id", "title" -> "title", "year" -> "year"))
    val got = rows.select("id", "title", "year").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("p1", "First", "2020"), ("p2", "Second", "2021"),
      ("p3", "Third", null)))
  }

  test("XML parse rejects doctype (no XXE)") {
    val dir = tmpDir("xml-xxe")
    val evil =
      """<?xml version="1.0"?>
        |<!DOCTYPE foo [<!ENTITY xxe SYSTEM "file:///etc/passwd">]>
        |<r><v>&xxe;</v></r>""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/evil.xml"), evil)
    val docs = Sources.wholeText(spark, s"$dir/evil.xml")
    intercept[org.apache.spark.SparkException] {
      Xml.parse(docs, "/r", Seq("v" -> "v")).collect()
    }
  }
}
