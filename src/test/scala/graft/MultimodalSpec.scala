package graft

import graft.multimodal.{Multimodal, RealCodec}

class MultimodalSpec extends SparkSpecBase {

  // ---- byte-exact fixtures for the pure-JVM real codec ----

  /** Mono 16-bit PCM WAV at `rate` Hz, every sample = `value`. */
  private def wav16(rate: Int, nSamples: Int, value: Short,
      channels: Int = 1): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(rate)
    buf.putInt(rate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort) // block align
    buf.putShort(16) // bits
    buf.put("data".getBytes); buf.putInt(dataLen)
    (0 until nSamples).foreach(_ => buf.putShort(value))
    buf.array()
  }

  /** 2×2 P6 PPM with a comment line: red, green / blue, white. */
  private def ppm2x2: Array[Byte] = {
    val header = "P6\n# test fixture\n2 2\n255\n".getBytes("US-ASCII")
    val px = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255).map(_.toByte)
    header ++ px
  }

  /** 3×2 24-bit bottom-up BMP with row padding (rowBytes 12 for 9 data
    * bytes). Logical top-down pixels: row0 (10,20,30)(40,50,60)(70,80,90),
    * row1 (1,2,3)(4,5,6)(7,8,9) — stored bottom-up in BGR.
    */
  private def bmp3x2: Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(54 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte); buf.put('M'.toByte)
    buf.putInt(54 + 24); buf.putInt(0); buf.putInt(54) // file size, reserved, pixel offset
    buf.putInt(40); buf.putInt(3); buf.putInt(2) // info size, width, height (bottom-up)
    buf.putShort(1); buf.putShort(24); buf.putInt(0) // planes, bpp, BI_RGB
    buf.putInt(24); buf.putInt(0); buf.putInt(0); buf.putInt(0); buf.putInt(0)
    def bgr(r: Int, g: Int, b: Int): Unit = {
      buf.put(b.toByte); buf.put(g.toByte); buf.put(r.toByte)
    }
    // stored first = logical BOTTOM row
    bgr(1, 2, 3); bgr(4, 5, 6); bgr(7, 8, 9); buf.put(Array[Byte](0, 0, 0))
    bgr(10, 20, 30); bgr(40, 50, 60); bgr(70, 80, 90); buf.put(Array[Byte](0, 0, 0))
    buf.array()
  }

  test("real codec: WAV PCM decode — duration, RMS, peak, frame windows") {
    // 8000 constant half-scale samples at 8000 Hz = exactly 1 s at RMS 0.5
    val d = RealCodec.decode(1L, wav16(8000, 8000, 16384), frameEveryMs = 250L)
    assert(d.ok && d.format == "wav")
    assert(d.channels == 1 && d.sample_rate == 8000 && d.duration_ms == 1000L)
    assert(math.abs(d.rms - 0.5) < 1e-9 && math.abs(d.peak - 0.5) < 1e-9)
    assert(d.frame_rms.length == 4) // 4 × 250 ms windows
    assert(d.frame_rms.forall(r => math.abs(r - 0.5) < 1e-9))
    // stereo: 2 channels halve the frame count for the same sample count
    val st = RealCodec.decode(2L, wav16(4000, 16, 16384, channels = 2))
    assert(st.ok && st.channels == 2 && st.duration_ms == 8 * 1000L / 4000L)
    // non-PCM fails structurally, not with an exception
    val bytes = wav16(8000, 4, 100)
    bytes(20) = 3 // audioFormat = IEEE float
    val bad = RealCodec.decode(3L, bytes)
    assert(!bad.ok && bad.error.contains("non-PCM"))
    // encoder round trip: decode(encodeWavPcm16(...)) matches an
    // independent in-memory fold on pseudo-random samples
    val rnd = new scala.util.Random(7)
    val samples = Array.fill(1234)(rnd.nextInt(65536).toShort)
    val rt = RealCodec.decode(4L, RealCodec.encodeWavPcm16(44100, 1, samples))
    assert(rt.ok && rt.sample_rate == 44100 && rt.duration_ms == 1234L * 1000 / 44100)
    val vs = samples.map(s => s.toDouble / 32768.0)
    assert(math.abs(rt.rms - math.sqrt(vs.map(v => v * v).sum / vs.length)) < 1e-12)
    assert(math.abs(rt.peak - vs.map(math.abs).max) < 1e-12)
  }

  test("real codec: PPM and BMP decode — dimensions, channel means, thumbnail resize") {
    val p = RealCodec.decode(10L, ppm2x2, thumbSize = 2)
    assert(p.ok && p.format == "ppm" && p.width == 2 && p.height == 2)
    assert(p.mean_r == 127.5 && p.mean_g == 127.5 && p.mean_b == 127.5)
    // NN thumbnail at 2×2 over a 2×2 source is the grayscale of each pixel
    assert(p.thumb.toSeq == Seq(85, 85, 85, 255).map(_.toByte))

    val b = RealCodec.decode(11L, bmp3x2, thumbSize = 4)
    assert(b.ok && b.format == "bmp" && b.width == 3 && b.height == 2)
    assert(b.mean_r == 22.0 && b.mean_g == 27.5 && b.mean_b == 33.0)
    // bottom-up storage normalized: top logical row grays (20,50,80) first
    assert(b.thumb.toSeq == Seq(20, 50, 50, 80, 20, 50, 50, 80, 2, 5, 5, 8, 2, 5, 5, 8)
      .map(_.toByte))

    // corrupt/unsupported blobs return structured errors
    assert(!RealCodec.decode(12L, ppm2x2.take(10)).ok)
    val jpegStub = RealCodec.decode(13L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0, 0))
    assert(!jpegStub.ok && jpegStub.format == "jpeg") // claimed by the JDK reader, fails structurally
    val trunc = bmp3x2.take(60)
    assert(!RealCodec.decode(14L, trunc).ok)
    // genuinely undecodable payloads name the honest stub boundary
    val mp3ish = RealCodec.decode(15L, Array[Byte]('I', 'D', '3', 4, 0, 0, 0, 0, 0, 0))
    assert(!mp3ish.ok && mp3ish.error.contains("native libs"))
  }

  test("real codec: compressed images decode through the JDK's ImageIO (PNG exact, JPEG lossy)") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    // 2×2 PNG with known pixels — PNG is lossless, so means are exact
    val img = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00)
    img.setRGB(0, 1, 0x0000FF); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val p = RealCodec.decode(20L, bos.toByteArray, thumbSize = 2)
    assert(p.ok && p.format == "png" && p.width == 2 && p.height == 2)
    assert(p.mean_r == 127.5 && p.mean_g == 127.5 && p.mean_b == 127.5)
    assert(p.thumb.toSeq == Seq(85, 85, 85, 255).map(_.toByte)) // same as the PPM twin

    // JPEG: lossy DCT — decode must succeed with plausible (not exact) means
    val grey = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(y => (0 until 8).foreach(x => grey.setRGB(x, y, 0x808080)))
    val jb = new java.io.ByteArrayOutputStream()
    ImageIO.write(grey, "jpg", jb)
    val j = RealCodec.decode(21L, jb.toByteArray, thumbSize = 2)
    assert(j.ok && j.format == "jpeg" && j.width == 8 && j.height == 8)
    assert(math.abs(j.mean_r - 128.0) < 4 && math.abs(j.mean_b - 128.0) < 4)

    // GIF (LZW): decoded by the JDK reader, exact for a solid color
    val argb = new BufferedImage(2, 2, BufferedImage.TYPE_INT_RGB)
    (0 until 2).foreach(y => (0 until 2).foreach(x => argb.setRGB(x, y, 0x406080)))
    val gif = new java.io.ByteArrayOutputStream()
    ImageIO.write(argb, "gif", gif)
    val g = RealCodec.decode(22L, gif.toByteArray, thumbSize = 2)
    assert(g.ok && g.format == "gif" && g.mean_r == 64.0 && g.mean_g == 96.0 && g.mean_b == 128.0)
  }

  test("real codec: distributed decode stage over binaryFile source") {
    val dir = tmpDir("mm-real")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "tone.wav"), wav16(8000, 8000, 16384))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "pix.ppm"), ppm2x2)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "pic.bmp"), bmp3x2)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "blob.jpg"),
      Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3)) // truncated JPEG
    val png = {
      val img = new java.awt.image.BufferedImage(2, 2,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 1, 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "pic2.png"), png)
    val decoded = Multimodal.decodeMedia(
      Multimodal.fromBinaryFiles(spark, dir), frameEveryMs = 250L, thumbSize = 2,
      partitions = 2).collect()
    assert(decoded.length == 5)
    val byFormat = decoded.groupBy(_.format)
    assert(byFormat("wav").head.ok && byFormat("wav").head.duration_ms == 1000L)
    assert(byFormat("ppm").head.ok && byFormat("ppm").head.width == 2)
    assert(byFormat("bmp").head.ok && byFormat("bmp").head.mean_b == 33.0)
    assert(byFormat("png").head.ok && byFormat("png").head.width == 2)
    // a corrupt compressed blob degrades to a structured row, not a task failure
    assert(!byFormat("jpeg").head.ok)
  }

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
