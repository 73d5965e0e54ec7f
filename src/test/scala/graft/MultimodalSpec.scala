package graft

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpecBase {

  test("binary payload plumbing: schema, partition-local extract, determinism") {
    val corpus = Multimodal.syntheticCorpus(spark, "/root/testdata/sf0.001")
    val schema = corpus.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")

    val feats = Multimodal.extractFeatures(corpus, frameEveryMs = 40, partitions = 4)
    val rows = feats.collect()
    assert(rows.length == corpus.count())
    // checksum equals md5 of the source text (payload = utf-8 of text)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val r0 = rows.find(_.media_id == 0L).get
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(docs(0L).getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(r0.checksum == expect)
    assert(r0.n_bytes == docs(0L).getBytes("UTF-8").length.toLong)
    assert(r0.histogram.sum == r0.n_bytes)
    assert(rows.forall(_.frames_sampled >= 1))
    // deterministic across repartitioning
    val again = Multimodal.extractFeatures(corpus, frameEveryMs = 40, partitions = 2)
      .collect().map(f => f.media_id -> f.checksum).toMap
    assert(rows.forall(f => again(f.media_id) == f.checksum))
  }

  test("real binary files via spark.read.format(binaryFile): downstream stages unchanged") {
    val dir = tmpDir("mm-bin")
    val payloads = Map(
      "photo.jpg" -> Array.tabulate[Byte](257)(i => (i * 7).toByte),
      "clip.wav" -> Array.tabulate[Byte](64)(i => (255 - i).toByte),
      "notes.bin" -> "plain bytes".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, name), bytes)
    }
    val media = Multimodal.fromBinaryFiles(spark, dir)
    assert(media.schema("payload").dataType.typeName == "binary")
    // the SAME extract stage as the synthetic corpus — source-agnostic
    val feats = Multimodal.extractFeatures(media, frameEveryMs = 40, partitions = 2)
      .collect()
    assert(feats.length == 3)
    val kinds = feats.map(f => f.n_bytes -> f.kind).toMap
    assert(kinds(257L) == "image" && kinds(64L) == "audio" && kinds(11L) == "binary")
    payloads.values.foreach { bytes =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes).map("%02x".format(_)).mkString
      val f = feats.find(_.n_bytes == bytes.length.toLong).get
      assert(f.checksum == md5)
      assert(f.histogram.sum == bytes.length.toLong)
      assert(f.frames_sampled == 1) // durationMs 0 until a real decode fills it
    }
  }
}
