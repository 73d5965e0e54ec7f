package graft.table

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Snapshot metadata of one table version (Iceberg-style, from scratch —
  * no Iceberg/Delta runtime exists in this environment).
  *
  * Mirrors the reference's folder-level marker files and manifest bookkeeping
  * (/root/reference assets/.../commons.py:28-30 `.ingesting/ingested` markers;
  * manifest scheduled→processed move full-etl.asl.json:604-614) as a single
  * atomic, versioned commit log:
  *   - `files`: per-bucket data-file lists (the manifest)
  *   - `committed`: writerId → max committed batchId (the idempotence ledger;
  *     Structured Streaming batchIds are strictly increasing, so one Long per
  *     writer suffices at any scale — O(1) state, not a growing set)
  *   - `lineage`: per-bucket row counts + per-commit metrics (events applied,
  *     upserts/deletes, duration) — the reference's ConversionStats analog.
  */
final case class Snapshot(
    version: Long,
    schemaJson: String,
    numBuckets: Int,
    files: Map[Int, Seq[String]],
    committed: Map[String, Long],
    bucketRows: Map[Int, Long],
    metrics: Map[String, Long],
    parentVersion: Long,
    morDeltas: Boolean = false) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def maxBatchId(writerId: String): Long = committed.getOrElse(writerId, -1L)
  def totalRows: Long = bucketRows.values.sum
  def allFiles: Seq[String] = files.values.flatten.toSeq
}

/** A bucketed copy-on-write lake table on a filesystem.
  *
  * Layout:
  * {{{
  *   <root>/data/c<version>-<writerId>-<batchId>/bucket=<b>/part-*.parquet
  *   <root>/meta/snap-<%012d version>.json     (atomic rename commit)
  * }}}
  *
  * Readers resolve the highest snapshot version; data files not referenced by
  * it are invisible (a crashed writer's half-written commit directory is
  * simply never published; a retried batch overwrites the same directory
  * deterministically because its name derives from (version, writerId,
  * batchId)).
  *
  * Buckets: rows are hash-bucketed by pmod(hash(conv_id, turn_idx), N). A
  * micro-batch rewrites ONLY its touched buckets (copy-on-write), bounding
  * write amplification; at 10^10 rows N scales with the cluster while the
  * per-batch touched-bucket set stays proportional to batch key coverage.
  *
  * Concurrency: single writer per table (the streaming driver), like the
  * reference's single ingestion EC2 host. Atomicity comes from
  * Files.move(ATOMIC_MOVE) of the snapshot JSON on a local/posix or HDFS-like
  * filesystem; on S3 this layer would swap to a catalog CAS — isolated behind
  * [[commit]].
  */
object LakeTable {
  /** Open an existing table with the bucket count recorded in its newest
    * snapshot (the count is part of the table's physical identity — a handle
    * with a different count would mis-prune and mis-bucket). Falls back to
    * `defaultBuckets` for a not-yet-created table.
    */
  def open(root: String, defaultBuckets: Int = 32): LakeTable = {
    val probe = new LakeTable(root, defaultBuckets)
    probe.currentSnapshot() match {
      case Some(s) if s.numBuckets != defaultBuckets => new LakeTable(root, s.numBuckets)
      case _ => probe
    }
  }

  /** Files.list/walk return streams backed by open directory handles; on a
    * long-lived streaming driver (currentSnapshot once per micro-batch) the
    * un-closed handles leak until GC. Materialize under try/finally.
    */
  private[table] def listing[T, R](s: java.util.stream.Stream[T])(f: Iterator[T] => R): R =
    try f(s.iterator().asScala) finally s.close()
}

final class LakeTable(val root: String, val numBuckets: Int) {
  private val mapper = new ObjectMapper()
  private val metaDir = Paths.get(root, "meta")
  private val dataDir = Paths.get(root, "data")

  def bucketCol = pmod(hash(col("conv_id"), col("turn_idx")), lit(numBuckets))

  // --- snapshot log -------------------------------------------------------

  private def snapshotFiles(): Seq[String] = {
    if (!Files.isDirectory(metaDir)) return Seq.empty
    LakeTable.listing(Files.list(metaDir)) {
      _.map(_.getFileName.toString)
        .filter(n => n.startsWith("snap-") && n.endsWith(".json"))
        .toSeq
    }.sorted
  }

  def currentSnapshot(): Option[Snapshot] =
    snapshotFiles().lastOption.map(n => readSnapshot(metaDir.resolve(n)))

  /** Time travel: the snapshot at `version` (exact match). */
  def snapshotAt(version: Long): Option[Snapshot] = {
    val name = f"snap-$version%012d.json"
    if (Files.exists(metaDir.resolve(name))) Some(readSnapshot(metaDir.resolve(name)))
    else None
  }

  def versions(): Seq[Long] =
    snapshotFiles().map(_.stripPrefix("snap-").stripSuffix(".json").toLong)

  private def readSnapshot(p: Path): Snapshot = {
    val m = mapper.readValue(p.toFile, classOf[java.util.Map[String, Object]])
    def longMap[K](key: String, k: String => K): Map[K, Long] =
      m.get(key).asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (a, b) => k(a) -> b.toString.toLong }.toMap
    Snapshot(
      version = m.get("version").toString.toLong,
      schemaJson = m.get("schemaJson").toString,
      numBuckets = m.get("numBuckets").toString.toInt,
      files = m.get("files").asInstanceOf[java.util.Map[String, Object]].asScala
        .map { case (b, fs) =>
          b.toInt -> fs.asInstanceOf[java.util.List[String]].asScala.toSeq }.toMap,
      committed = longMap[String]("committed", identity),
      bucketRows = longMap[Int]("bucketRows", _.toInt),
      metrics = longMap[String]("metrics", identity),
      parentVersion = m.get("parentVersion").toString.toLong,
      morDeltas = Option(m.get("morDeltas")).exists(_.toString.toBoolean))
  }

  /** Atomically publish a snapshot; refuses to overwrite an existing version
    * (single-writer invariant check).
    */
  def commit(s: Snapshot): Unit = {
    Files.createDirectories(metaDir)
    val target = metaDir.resolve(f"snap-${s.version}%012d.json")
    require(!Files.exists(target), s"snapshot v${s.version} already committed")
    val j = new java.util.LinkedHashMap[String, Object]()
    j.put("version", java.lang.Long.valueOf(s.version))
    j.put("schemaJson", s.schemaJson)
    j.put("numBuckets", Integer.valueOf(s.numBuckets))
    j.put("files", s.files.map { case (b, fs) => b.toString -> fs.asJava }.asJava)
    j.put("committed", s.committed.map { case (k, v) => k -> java.lang.Long.valueOf(v) }.asJava)
    j.put("bucketRows", s.bucketRows.map { case (b, n) => b.toString -> java.lang.Long.valueOf(n) }.asJava)
    j.put("metrics", s.metrics.map { case (k, v) => k -> java.lang.Long.valueOf(v) }.asJava)
    j.put("parentVersion", java.lang.Long.valueOf(s.parentVersion))
    j.put("morDeltas", java.lang.Boolean.valueOf(s.morDeltas))
    val tmp = metaDir.resolve(s".tmp-snap-${s.version}-${System.nanoTime()}.json")
    mapper.writerWithDefaultPrettyPrinter().writeValue(tmp.toFile, j)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  // --- data ---------------------------------------------------------------

  /** Data-file paths for a commit directory, keyed by bucket. */
  def commitDir(version: Long, writerId: String, batchId: Long): Path =
    dataDir.resolve(s"c$version-$writerId-$batchId")

  def listBucketFiles(dir: Path): Map[Int, Seq[String]] = {
    if (!Files.isDirectory(dir)) return Map.empty
    LakeTable.listing(Files.list(dir)) {
      _.filter(_.getFileName.toString.startsWith("bucket=")).toSeq
    }.map { bdir =>
      val b = bdir.getFileName.toString.stripPrefix("bucket=").toInt
      val fs = LakeTable.listing(Files.list(bdir)) {
        _.map(_.toString).filter(_.endsWith(".parquet")).toSeq
      }.sorted
      b -> fs
    }.toMap
  }

  /** Read the table rows (including tombstones) at the current snapshot,
    * optionally restricted to a set of buckets (file pruning — the physical
    * partition pruning of the MERGE read path).
    */
  def readRaw(spark: SparkSession, buckets: Option[Set[Int]] = None,
      asOfVersion: Option[Long] = None): DataFrame = {
    asOfVersion.map(v => snapshotAt(v).orElse(
      throw new IllegalArgumentException(s"no snapshot v$v"))).getOrElse(currentSnapshot()) match {
      case None => spark.emptyDataFrame
      case Some(s) =>
        val wanted = buckets.map(bs => s.files.view.filterKeys(bs).toMap).getOrElse(s.files)
        val paths = wanted.values.flatten.toSeq
        if (paths.isEmpty) {
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s.schema)
        } else {
          // Explicit schema: old files lack late-added columns; parquet reader
          // fills them with nulls (additive evolution).
          spark.read.schema(s.schema).parquet(paths: _*)
        }
    }
  }

  /** Live rows only (tombstones filtered, bookkeeping dropped); optionally
    * time-traveled to a past snapshot version.
    *
    * Merge-on-read: when the snapshot carries un-compacted delta files
    * (`morDeltas`), a bucket may hold several versions of a key across its
    * base+delta files — the LWW fold runs at read time (it is the same
    * associative rule the writer uses, so COW and MOR states are
    * indistinguishable to readers). Compaction folds deltas back so
    * steady-state reads pay no merge.
    */
  def read(spark: SparkSession, asOfVersion: Option[Long] = None): DataFrame = {
    val snap = asOfVersion.flatMap(snapshotAt).orElse(currentSnapshot())
    val raw = readRaw(spark, None, asOfVersion)
    // Delta fold aligned with the bucket layout, exactly like the writer
    // (MergeApplier.lwwByBucket): the explicit repartition uses the same
    // murmur3 as the bucket function, so the LWW agg adds NO second exchange
    // and the folded result is again bucket-clustered for downstream rewrites
    // — one exchange total on a delta-carrying read.
    val resolved = if (snap.exists(_.morDeltas))
      graft.operators.Lww.latestByKeyAgg(
        raw.repartition(numBuckets, Model.KeyCols.map(col): _*))
    else raw
    resolved.filter(col("op") =!= Model.OpDelete).drop("op")
  }

  /** Vacuum: delete data files not referenced by the newest `keepLast`
    * snapshots, then drop the older snapshot JSONs. Returns deleted file
    * count. Mirrors Iceberg's expire-snapshots + orphan-file cleanup; also
    * sweeps half-written commit dirs left by crashes (never referenced).
    */
  def vacuum(keepLast: Int = 1): Int = {
    val names = snapshotFiles()
    if (names.isEmpty) return 0
    val (expire, keep) = names.splitAt(math.max(0, names.size - keepLast))
    val referenced: Set[String] = keep
      .map(n => readSnapshot(metaDir.resolve(n)))
      .flatMap(_.allFiles).toSet
    var deleted = 0
    if (Files.isDirectory(dataDir)) {
      LakeTable.listing(Files.walk(dataDir))(_.toSeq).reverse.foreach { p =>
        if (Files.isRegularFile(p) && !referenced.contains(p.toString)) {
          Files.delete(p); deleted += 1
        } else if (Files.isDirectory(p) && p != dataDir &&
            LakeTable.listing(Files.list(p))(_.take(1).toSeq).isEmpty) {
          Files.delete(p)
        }
      }
    }
    expire.foreach(n => Files.delete(metaDir.resolve(n)))
    deleted
  }

  /** Sum parquet footer row counts — no Spark job, no data read. Footer
    * opens are parallelized: they are driver-side serial time otherwise,
    * which caps strong scaling (Amdahl) once the distributed phases shrink.
    */
  def footerRowCount(files: Seq[String]): Long = {
    import org.apache.hadoop.conf.Configuration
    import scala.collection.parallel.CollectionConverters._
    val conf = new Configuration()
    files.par.map(footerCount(_, conf)).sum
  }

  /** Per-bucket footer row counts in ONE parallel pass sharing ONE Hadoop
    * Configuration. Building a Configuration per bucket (XML resource load,
    * ~20 ms) made commit metadata cost O(buckets × 20 ms) of driver serial
    * time per micro-batch — measured ~0.6 s of the ~3 s tail batch.
    */
  def footerRowCounts(byBucket: Map[Int, Seq[String]]): Map[Int, Long] = {
    import org.apache.hadoop.conf.Configuration
    import scala.collection.parallel.CollectionConverters._
    val conf = new Configuration()
    val flat = byBucket.toSeq.flatMap { case (b, fs) => fs.map(b -> _) }
    val counted = flat.par.map { case (b, f) => b -> footerCount(f, conf) }.seq
    counted.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
  }

  private def footerCount(file: String, conf: org.apache.hadoop.conf.Configuration): Long = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.{Path => HPath}
    val r = ParquetFileReader.open(HadoopInputFile.fromPath(new HPath(file), conf))
    try r.getRecordCount finally r.close()
  }
}
