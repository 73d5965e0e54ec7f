package graft

import graft.model.Model
import graft.sources.{ErrorRouting, Sources}

class ErrorRoutingSpec extends SparkSpecBase {

  test("bad-record routing: malformed lines quarantined, good lines parsed (C10)") {
    val dir = tmpDir("err-src")
    val lines = Seq(
      """{"conv_id":"c1","turn_idx":0,"role":"user","text":"hi","ts":"2025-01-01T00:00:00.000Z","op":"insert","seq":1}""",
      """not json at all""",
      """{"conv_id":"c2","turn_idx":1,"role":"user","text":"yo","ts":"2025-01-01T00:00:01.000Z","op":"insert","seq":2}""",
      """{"turn_idx":9,"role":"user","text":"no key","ts":"2025-01-01T00:00:02.000Z","op":"insert","seq":3}""")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.jsonl"),
      lines.mkString("\n"))
    val raw = spark.read.text(s"$dir/in.jsonl")
    val routed = ErrorRouting.parseJsonLines(raw, Model.changeEventSchema,
      requiredCols = Seq("conv_id"))
    assert(routed.good.count() == 2)
    assert(routed.good.columns.contains("conv_id"))
    val bad = routed.bad.collect().map(r => r.getString(1)).sorted.toSeq
    assert(bad == Seq("malformed_json", "missing_required_field"))
  }

  test("file verdict: fails only when ALL lines fail (ConvertToRDFLambda.java:527-547)") {
    val dir = tmpDir("err-verdict")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/mixed.jsonl"),
      "{\"conv_id\":\"c\",\"turn_idx\":0,\"role\":\"u\",\"text\":\"t\",\"ts\":\"2025-01-01T00:00:00.000Z\",\"op\":\"insert\",\"seq\":1}\nbroken")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/allbad.jsonl"),
      "broken1\nbroken2")
    val raw = Sources.lines(spark, s"$dir/*.jsonl")
    val verdicts = ErrorRouting.fileVerdicts(raw, Model.changeEventSchema)
      .collect().map(r => (r.getString(0).split('/').last,
        r.getBoolean(r.fieldIndex("file_failed")))).toMap
    assert(verdicts("mixed.jsonl") == false)
    assert(verdicts("allbad.jsonl") == true)
  }
}
