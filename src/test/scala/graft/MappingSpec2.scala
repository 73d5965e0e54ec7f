package graft

import graft.mapping.{FieldSpec, MappingCompiler, MappingConfig, MappingSpec}

/** Mirrors the reference's LambdaHandlerTest fixtures (FIXTURES.md): a
  * mappings.json routing publications JSONL + organizations CSV, with
  * deletion detection, validation fallbacks, and function application —
  * and actually asserts outputs (the reference left a TODO there).
  */
class MappingSpec2 extends SparkSpecBase {

  private lazy val fixtures: String = {
    val dir = tmpDir("mapping-fix")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/records_000000001.jsonl"),
      Seq(
        """{"id":"pub1","title":"First Paper","year":"2020","recordStatus":"active"}""",
        """{"id":"pub2","title":"Gone Paper","year":"2021","recordStatus":"obsolete"}""",
        """{"ocid":"pub3","title":"Ocid Paper","year":"not-a-year"}""").mkString("\n"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/companies-dax.csv"),
      "TickerSymbol,Name,Country\nSAP,SAP SE,Germany\nBMW,BMW AG,Germany\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/mappings.json"),
      """[
        |  {"id": "publications", "format": "jsonl",
        |   "sourceFileIncludePattern": "records_.*\\.jsonl",
        |   "processingHints": ["root-to-list", "deletion-detection"],
        |   "fields": [
        |     {"name": "title", "from": "title"},
        |     {"name": "year", "from": "year", "dataType": "int",
        |      "validation": "placeholder:0"},
        |     {"name": "iri", "from": "id", "function": "hashedIri:urn:pub:"}
        |   ]},
        |  {"id": "organizations", "format": "csv",
        |   "sourceFileIncludePattern": "companies-.*\\.csv",
        |   "sourceFileExcludePattern": "companies-nyse.*",
        |   "fields": [
        |     {"name": "ticker", "from": "TickerSymbol"},
        |     {"name": "name_lc", "from": "Name", "function": "toLowerCase"},
        |     {"name": "country", "from": "Country"}
        |   ]}
        |]""".stripMargin)
    dir
  }

  test("mappings.json loads, routes by include/exclude, rejects unmatched (F1)") {
    val specs = MappingConfig.fromJson(s"$fixtures/mappings.json")
    assert(specs.map(_.id).toSet == Set("publications", "organizations"))
    assert(MappingConfig.route(specs, s"$fixtures/records_000000001.jsonl").id == "publications")
    assert(MappingConfig.route(specs, s"$fixtures/companies-dax.csv").id == "organizations")
    intercept[IllegalArgumentException](
      MappingConfig.route(specs, s"$fixtures/companies-nyse.csv"))
    intercept[IllegalArgumentException](
      MappingConfig.route(specs, "unrelated.txt"))
  }

  test("JSONL mapping: fields, record id (id/ocid), deletion detection, placeholder cast") {
    val specs = MappingConfig.fromJson(s"$fixtures/mappings.json")
    val spec = specs.find(_.id == "publications").get
    val out = MappingCompiler.compile(spark, spec, s"$fixtures/records_000000001.jsonl")
      .collect().map(r => r.getAs[String]("__record_id") ->
        ((r.getAs[String]("title"), r.getAs[Int]("year"), r.getAs[String]("op"),
          r.getAs[String]("iri")))).toMap
    assert(out.keySet == Set("pub1", "pub2", "pub3")) // ocid fallback (N4)
    assert(out("pub1")._3 == "insert")
    assert(out("pub2")._3 == "delete") // recordStatus obsolete (F6/C3)
    assert(out("pub3")._2 == 0) // placeholder cast fallback (§2.8 validation)
    assert(out("pub1")._2 == 2020)
    val expectedIri = "urn:pub:" + java.security.MessageDigest.getInstance("SHA-256")
      .digest("pub1".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out("pub1")._4 == expectedIri)
  }

  test("CSV mapping: header columns + function application") {
    val specs = MappingConfig.fromJson(s"$fixtures/mappings.json")
    val spec = specs.find(_.id == "organizations").get
    val out = MappingCompiler.compile(spark, spec, s"$fixtures/companies-dax.csv")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(("SAP", "sap se", "Germany"), ("BMW", "bmw ag", "Germany")))
  }

  test("iterator explode: one record per array element with __index (N3/N5)") {
    val dir = tmpDir("mapping-iter")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/batch.jsonl"),
      """{"list":[{"id":"a","title":"A"},{"id":"b","title":"B"}]}""")
    val spec = MappingSpec("batched", "jsonl", "batch.*\\.jsonl",
      iterator = Some("list"),
      fields = Seq(FieldSpec("title", "title")))
    val rows = MappingCompiler.compile(spark, spec, s"$dir/batch.jsonl")
      .collect().map(r => (r.getAs[String]("__record_id"), r.getAs[String]("title"))).toSet
    assert(rows == Set(("a", "A"), ("b", "B")))
  }

  test("json-hierarchy hint: recursive __parent_*/__parentKey/__index (N2)") {
    // 2-level nesting mirroring the reference's enrichment
    // (SpecialCases.java:143-189): org → departments[] → teams[]
    val dir = tmpDir("mapping-hier")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/orgs.jsonl"),
      """{"id":"org1","name":"Acme","departments":[""" +
        """{"id":"d1","name":"R&D","teams":[{"id":"t1","name":"Search"},{"id":"t2","name":"Infra"}]},""" +
        """{"id":"d2","name":"Sales","teams":[{"id":"t3","name":"EMEA"}]}]}""")
    // iterate the departments array of the ENRICHED document; fields read the
    // materialized parent context plus level-2 grandchildren via paths
    val spec = MappingSpec("orgs", "jsonl", "orgs.*\\.jsonl",
      iterator = Some("departments"),
      processingHints = Set("json-hierarchy"),
      fields = Seq(
        FieldSpec("dept", "name"),
        FieldSpec("parent_id", "__parent_id"),
        FieldSpec("parent_name", "__parent_name"),
        FieldSpec("parent_key", "__parentKey"),
        FieldSpec("idx", "__index", dataType = "int"),
        FieldSpec("team0_name", "teams[0].name"),
        FieldSpec("team0_parent", "teams[0].__parent_id"),
        FieldSpec("team0_grandparent", "teams[0].__parent___parent_id"),
        FieldSpec("team0_key", "teams[0].__parentKey"),
        FieldSpec("team0_idx", "teams[0].__index", dataType = "int")))
    val rows = MappingCompiler.compile(spark, spec, s"$dir/orgs.jsonl")
      .collect().map(r => r.getAs[String]("__record_id") -> r).toMap
    assert(rows.keySet == Set("d1", "d2"))
    val d1 = rows("d1")
    // level 1: department carries its parent org's context
    assert(d1.getAs[String]("parent_id") == "org1")
    assert(d1.getAs[String]("parent_name") == "Acme")
    assert(d1.getAs[String]("parent_key") == "departments")
    assert(d1.getAs[Int]("idx") == 0)
    assert(rows("d2").getAs[Int]("idx") == 1)
    // level 2: team carries its DEPARTMENT as parent and the ORG as
    // grandparent (the reference's stacked __parent___parent_* convention)
    assert(d1.getAs[String]("team0_name") == "Search")
    assert(d1.getAs[String]("team0_parent") == "d1")
    assert(d1.getAs[String]("team0_grandparent") == "org1")
    assert(d1.getAs[String]("team0_key") == "teams")
    assert(d1.getAs[Int]("team0_idx") == 0)
  }

  test("XML routed through mappings.json: row XPath iterator + field XPaths (S8)") {
    // mirrors the reference fixture source-data/xml/publications/pub1.xml
    val dir = tmpDir("mapping-xml")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/pub1.xml"),
      """<?xml version="1.0" encoding="UTF-8"?>
        |<publications>
        |    <publication id="Q8337" category="children">
        |        <title lang="en">Harry Potter</title>
        |        <author>J K. Rowling</author>
        |        <year>2005</year>
        |    </publication>
        |    <publication id="Q112" category="science">
        |        <title lang="en">Relativity</title>
        |        <author>A. Einstein</author>
        |        <year>1952</year>
        |    </publication>
        |</publications>""".stripMargin)
    val spec = MappingSpec("pubs-xml", "xml", "pub.*\\.xml",
      iterator = Some("/publications/publication"),
      fields = Seq(
        FieldSpec("pub_id", "@id"),
        FieldSpec("title", "title"),
        FieldSpec("author_lc", "author", function = Some("toLowerCase")),
        FieldSpec("year", "year", dataType = "int")))
    val rows = MappingCompiler.compile(spark, spec, s"$dir/pub1.xml")
      .collect().map(r => (r.getAs[String]("pub_id"), r.getAs[String]("title"),
        r.getAs[String]("author_lc"), r.getAs[Int]("year"))).toSet
    assert(rows == Set(
      ("Q8337", "Harry Potter", "j k. rowling", 2005),
      ("Q112", "Relativity", "a. einstein", 1952)))
  }

  test("copy-file hint: passthrough (S9)") {
    val dir = tmpDir("mapping-copy")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/raw.jsonl"), "as-is")
    val spec = MappingSpec("copy", "jsonl", "raw.*",
      processingHints = Set("copy-file"))
    val out = MappingCompiler.compile(spark, spec, s"$dir/raw.jsonl").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("as-is"))
  }
}
