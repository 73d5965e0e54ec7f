package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extract / frame-sample stages as partition-local batch transforms.
  *
  * The codec layer is split by what this environment can honestly do:
  *   - [[RealCodec]] REALLY decodes the pure-byte-layout formats (WAV/PCM
  *     audio → duration/RMS/peak/per-window frame RMS; PPM + 24-bit BMP
  *     images → dimensions/channel means/nearest-neighbor thumbnail
  *     resize) with zero native libraries, and PNG/JPEG/GIF through the
  *     JDK's own javax.imageio — [[decodeMedia]] is the stage;
  *   - video (H.264/VP9) and compressed audio (MP3/AAC) need ffmpeg-class
  *     native bindings that are absent here and stay behind the
  *     deterministic [[FakeCodec]] stub (and RealCodec's structured
  *     `unsupported` rows).
  * Everything Spark-cares-about is real and tested either way: schema,
  * binary column handling, partition-local batched execution
  * (`mapPartitions` over a typed Dataset — the Scala analog of
  * `mapInPandas` batches), deterministic partitioning by content hash, and
  * pushdown-friendly metadata columns kept OUTSIDE the blob so scans that
  * only need width/height/duration never touch bytes.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int,
      durationMs: Long, codec: String)
  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      checksum: String, histogram: Array[Long], frames_sampled: Int)

  /** Deterministic synthetic media corpus derived from the documents table:
    * payload = utf-8 bytes of the text (a stand-in blob), metadata derived
    * from stable hashes. Real pipelines replace this source with
    * `spark.read.format("binaryFile")` — the downstream stages are unchanged.
    */
  def syntheticCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
        (pmod(xxhash64(col("doc_id"), lit(1)), lit(1920)) + 64).cast("int").as("width"),
        (pmod(xxhash64(col("doc_id"), lit(2)), lit(1080)) + 64).cast("int").as("height"),
        (pmod(xxhash64(col("doc_id"), lit(3)), lit(600000)) + 1000).as("durationMs"),
        lit("fake/v1").as("codec")).as("meta"),
      encode(col("text"), "UTF-8").as("payload"))
  }

  /** Real-file source: Spark's `binaryFile` format adapted to the media
    * schema — media_id = xxhash64(path) (stable, collision-safe at corpus
    * scale), kind from the file extension, payload = file bytes. Exists to
    * PROVE the claim above: [[extractFeatures]] runs unchanged over actual
    * files (MultimodalSpec reads fixture files through this). Width/height/
    * duration are 0 here — a real pipeline fills them in the decode stage;
    * they are unknowable without opening the blob.
    */
  def fromBinaryFiles(spark: SparkSession, dir: String): DataFrame = {
    val ext = lower(regexp_extract(col("path"), "\\.([A-Za-z0-9]+)$", 1))
    spark.read.format("binaryFile").load(dir).select(
      xxhash64(col("path")).as("media_id"),
      struct(
        when(ext.isin("jpg", "jpeg", "png", "gif", "webp"), "image")
          .when(ext.isin("wav", "mp3", "flac", "ogg"), "audio")
          .when(ext.isin("mp4", "mkv", "webm", "avi"), "video")
          .otherwise("binary").as("kind"),
        lit(0).as("width"),
        lit(0).as("height"),
        lit(0L).as("durationMs"),
        ext.as("codec")).as("meta"),
      col("content").as("payload"))
  }

  /** The stubbed codec: a real implementation would decode `payload` with an
    * image/audio library here. The fake is DETERMINISTIC (byte histogram +
    * md5) so tests can assert exact outputs; the partition-batch shape —
    * iterate a partition, reuse buffers, emit one row per blob — is exactly
    * what a libjpeg/ffmpeg binding would use.
    */
  object FakeCodec {
    def extract(r: MediaRow, frameEveryMs: Long): MediaFeatures = {
      val hist = new Array[Long](16)
      var i = 0
      while (i < r.payload.length) { hist((r.payload(i) & 0xFF) % 16) += 1; i += 1 }
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(r.payload).map("%02x".format(_)).mkString
      val frames = math.max(1L, r.meta.durationMs / frameEveryMs).toInt
      MediaFeatures(r.media_id, r.meta.kind, r.payload.length.toLong, digest,
        hist, frames)
    }
  }

  /** Decode + feature-extract as a partition-local batch stage. Repartitions
    * by content hash first so blob sizes spread evenly (skew guard for mixed
    * small-image / long-video corpora).
    */
  def extractFeatures(media: DataFrame, frameEveryMs: Long = 40L,
      partitions: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0)
      media.repartition(partitions, xxhash64(col("media_id"))) else media
    balanced.as[MediaRow].mapPartitions { it =>
      it.map(r => FakeCodec.extract(r, frameEveryMs))
    }
  }

  /** REAL decode stage over (media_id, payload): [[RealCodec]] sniffs each
    * blob's magic bytes and decodes WAV / PPM / BMP in pure JVM; anything
    * needing a native codec comes back as a structured `ok = false` row
    * (one corrupt or unsupported blob costs one row, never a task failure —
    * the C10 error-routing contract). Same partition-local batch shape as
    * [[extractFeatures]]; accepts any frame with those two columns
    * (syntheticCorpus, fromBinaryFiles, or a lake table projection).
    */
  def decodeMedia(media: DataFrame, frameEveryMs: Long = 250L,
      thumbSize: Int = 4, partitions: Int = 0): Dataset[RealCodec.Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced = if (partitions > 0)
      media.repartition(partitions, xxhash64(col("media_id"))) else media
    balanced.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) => RealCodec.decode(id, bytes, frameEveryMs, thumbSize) }
      }
  }
}
