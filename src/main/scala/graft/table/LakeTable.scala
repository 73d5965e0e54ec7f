package graft.table

import com.fasterxml.jackson.databind.ObjectMapper

import graft.model.Model
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StructType}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** One entry in a snapshot's manifest list (Iceberg manifest-list layering,
  * from scratch). The entry names an immutable manifest FILE holding the
  * per-bucket data-file paths of one commit; `buckets` is the authoritative
  * live-bucket mask — a COW rewrite of bucket b removes b from every older
  * ref rather than rewriting their manifest files, so commit metadata stays
  * O(touched buckets) no matter how many data files the table has.
  * `delta` marks merge-on-read appends: a bucket's files = its single
  * non-delta ref's list ++ every later delta ref's list, in list order.
  */
final case class ManifestRef(path: String, buckets: Set[Int], delta: Boolean)

/** One data file in a manifest: path + byte size. The size travels with the
  * metadata so readers (including the bucket-aligned merge scan) never stat
  * files — on an object store a per-file HEAD per commit would dominate.
  */
final case class FileEntry(path: String, bytes: Long)

/** Snapshot metadata of one table version (Iceberg-style, from scratch —
  * no Iceberg/Delta runtime exists in this environment).
  *
  * Mirrors the reference's folder-level marker files and manifest bookkeeping
  * (/root/reference assets/.../commons.py:28-30 `.ingesting/ingested` markers;
  * manifest scheduled→processed move full-etl.asl.json:604-614) as a single
  * atomic, versioned commit log:
  *   - `manifests`: ordered manifest-list (see [[ManifestRef]]); the snapshot
  *     itself holds NO data-file paths, so writing it is O(buckets + commits
  *     since compaction), independent of table file count — at 10^6 files the
  *     per-commit metadata write is still a few KB
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
    manifests: Seq[ManifestRef],
    committed: Map[String, Long],
    bucketRows: Map[Int, Long],
    metrics: Map[String, Long],
    parentVersion: Long,
    morDeltas: Boolean = false) {
  def schema: StructType = DataType.fromJson(schemaJson).asInstanceOf[StructType]
  def maxBatchId(writerId: String): Long = committed.getOrElse(writerId, -1L)
  def totalRows: Long = bucketRows.values.sum
}

/** A concurrent [[LakeTable.commit]] won the race to this snapshot version.
  * The loser's data/manifest files are unpublished (invisible to readers,
  * swept by vacuum); the apply paths catch this and either REBASE their
  * metadata onto the new current snapshot (disjoint buckets, MOR appends) or
  * re-run the merge against it (overlapping COW rewrites).
  */
final class CommitConflictException(val version: Long)
  extends RuntimeException(
    s"snapshot v$version was committed concurrently; rebase against the current snapshot and retry")

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
  * Concurrency: MULTIPLE writers with optimistic concurrency (the reference
  * runs a single ingestion EC2 host; scaling past one ingest stream per table
  * needs more). [[commit]] is a true compare-and-swap on the snapshot
  * version: the JSON is staged to a temp file and published with
  * Files.createLink (hard link), which atomically FAILS if the version
  * already exists — unlike ATOMIC_MOVE, which silently replaces it and
  * would lose the race winner's commit. A loser gets
  * [[CommitConflictException]] and (in MergeApplier) rebases its metadata
  * onto the new current snapshot when its touched buckets are untouched
  * there — concurrent writers on disjoint key ranges, a MOR appender racing
  * a compactor — or re-runs the merge when they overlap. On S3 this layer
  * would swap the link CAS for a catalog CAS — isolated behind [[commit]].
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

  private def snapName(v: Long) = f"snap-$v%012d.json"
  private val hintPath = metaDir.resolve("version-hint.text")

  /** Resolve the newest snapshot in O(1 + commits since the hint) instead of
    * listing the whole meta directory — currentSnapshot() runs once per
    * micro-batch on a streaming driver, and after 10^5 commits a full
    * listing is the slow path on an object store. The hint is best-effort
    * (written non-atomically AFTER the atomic snapshot publish, so it can
    * only lag): read it, then probe forward version-by-version until the
    * first missing file. Missing/corrupt hint falls back to the listing.
    */
  def currentSnapshot(): Option[Snapshot] = {
    val hinted: Option[Long] =
      try {
        if (Files.exists(hintPath)) Some(Files.readString(hintPath).trim.toLong)
        else None
      } catch { case _: Exception => None }
    hinted.filter(v => Files.exists(metaDir.resolve(snapName(v)))) match {
      case Some(v0) =>
        var v = v0
        while (Files.exists(metaDir.resolve(snapName(v + 1)))) v += 1
        Some(readSnapshot(metaDir.resolve(snapName(v))))
      case None =>
        snapshotFiles().lastOption.map(n => readSnapshot(metaDir.resolve(n)))
    }
  }

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
      manifests = m.get("manifests").asInstanceOf[java.util.List[Object]].asScala
        .map { o =>
          val e = o.asInstanceOf[java.util.Map[String, Object]]
          ManifestRef(
            path = e.get("path").toString,
            buckets = e.get("buckets").asInstanceOf[java.util.List[Object]]
              .asScala.map(_.toString.toInt).toSet,
            delta = e.get("delta").toString.toBoolean)
        }.toSeq,
      committed = longMap[String]("committed", identity),
      bucketRows = longMap[Int]("bucketRows", _.toInt),
      metrics = longMap[String]("metrics", identity),
      parentVersion = m.get("parentVersion").toString.toLong,
      morDeltas = Option(m.get("morDeltas")).exists(_.toString.toBoolean))
  }

  /** Atomically publish a snapshot version — a true CAS: of any number of
    * concurrent committers of the same version, exactly ONE succeeds and the
    * rest get [[CommitConflictException]] (see the class doc's concurrency
    * section). The loser's staged temp file is cleaned up here; its data
    * files and manifest stay unpublished until vacuum sweeps them or a
    * rebase re-references them.
    */
  def commit(s: Snapshot): Unit = {
    Files.createDirectories(metaDir)
    awaitCommitGate()
    val target = metaDir.resolve(f"snap-${s.version}%012d.json")
    val j = new java.util.LinkedHashMap[String, Object]()
    j.put("version", java.lang.Long.valueOf(s.version))
    j.put("schemaJson", s.schemaJson)
    j.put("numBuckets", Integer.valueOf(s.numBuckets))
    j.put("manifests", s.manifests.map { r =>
      val e = new java.util.LinkedHashMap[String, Object]()
      e.put("path", r.path)
      e.put("buckets", r.buckets.toSeq.sorted.map(Integer.valueOf).asJava)
      e.put("delta", java.lang.Boolean.valueOf(r.delta))
      e
    }.asJava)
    j.put("committed", s.committed.map { case (k, v) => k -> java.lang.Long.valueOf(v) }.asJava)
    j.put("bucketRows", s.bucketRows.map { case (b, n) => b.toString -> java.lang.Long.valueOf(n) }.asJava)
    j.put("metrics", s.metrics.map { case (k, v) => k -> java.lang.Long.valueOf(v) }.asJava)
    j.put("parentVersion", java.lang.Long.valueOf(s.parentVersion))
    j.put("morDeltas", java.lang.Boolean.valueOf(s.morDeltas))
    val tmp = metaDir.resolve(s".tmp-snap-${s.version}-${System.nanoTime()}.json")
    mapper.writerWithDefaultPrettyPrinter().writeValue(tmp.toFile, j)
    publishCas(tmp, target, s.version)
    // best-effort O(1) resolution hint — written AFTER the atomic publish so
    // it can only lag (readers probe forward); a crash here costs nothing
    try Files.writeString(hintPath, s.version.toString)
    catch { case _: Exception => () }
  }

  /** Publish `tmp` as `target` iff `target` does not exist, atomically.
    * Files.createLink is the POSIX CAS primitive: link(2) fails with EEXIST,
    * so of N racing committers exactly one creates the name; the fully-
    * written temp file becomes the published snapshot (same inode), then the
    * temp name is dropped. Filesystems without hard links degrade to the
    * pre-checked atomic rename — still torn-write-safe, but last-writer-wins
    * in the (tiny) check-to-move window, i.e. single-writer only there.
    */
  private def publishCas(tmp: Path, target: Path, version: Long): Unit = {
    if (Files.exists(target)) { // cheap pre-check; the link below is the CAS
      Files.deleteIfExists(tmp)
      throw new CommitConflictException(version)
    }
    try {
      Files.createLink(target, tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitConflictException(version)
      case _: UnsupportedOperationException =>
        Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    }
  }

  // --- commit lock (pessimistic fallback) ---------------------------------

  /** An ADVISORY exclusive commit lock for fairness under sustained
    * same-bucket contention. Correctness never depends on it — [[commit]]'s
    * link(2) CAS stays the only serialization point — but a pure-optimistic
    * COW writer can livelock: its conflict re-run is a multi-second Spark
    * job, during which faster rivals land more commits, so it loses every
    * race no matter how many retries (observed with 4 overlapping writers).
    * MergeApplier escalates such a starved writer here: while the lock file
    * exists, every OTHER committer parks at [[awaitCommitGate]], so the
    * holder's next fold-and-CAS cannot lose. This is Iceberg's
    * lock-manager escalation re-expressed over the filesystem: acquisition
    * is the same create-if-absent primitive as the snapshot CAS, ownership
    * is a token (cross-process safe; in-JVM threads each get their own via
    * a ThreadLocal), and a crashed holder's lock expires by mtime after
    * [[lockStaleMs]] — at which point rivals break it and proceed; the CAS
    * still protects them, the stale window only costs fairness.
    */
  private val lockPath = metaDir.resolve("commit.lock")
  private val lockOwner = new ThreadLocal[String]
  private[graft] var lockStaleMs: Long = 600000L

  private def lockIsStale(): Boolean =
    try System.currentTimeMillis() -
      Files.getLastModifiedTime(lockPath).toMillis > lockStaleMs
    catch { case _: Exception => false } // vanished/unreadable: nothing to break

  private def ownsCommitLock(): Boolean = {
    val token = lockOwner.get()
    token != null && (
      try new String(Files.readAllBytes(lockPath),
        java.nio.charset.StandardCharsets.UTF_8) == token
      catch { case _: Exception => false })
  }

  /** Park until no OTHER committer holds the advisory lock (holder passes
    * straight through; a stale lock is ignored — see [[withCommitLock]]).
    */
  private def awaitCommitGate(): Unit =
    while (Files.exists(lockPath) && !ownsCommitLock() && !lockIsStale())
      Thread.sleep(10)

  /** Run `f` holding the exclusive commit lock; see the lock doc above.
    * Not reentrant (the single MergeApplier call site never nests).
    */
  def withCommitLock[T](f: => T): T = {
    val token = java.util.UUID.randomUUID().toString
    Files.createDirectories(metaDir)
    var held = false
    while (!held) {
      try {
        Files.write(lockPath, token.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        held = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          if (lockIsStale()) {
            // break a crashed holder's lock; racing breakers are harmless
            // (deleteIfExists + the CREATE_NEW retry re-serialize them)
            try Files.deleteIfExists(lockPath) catch { case _: Exception => () }
          } else Thread.sleep(25)
      }
    }
    lockOwner.set(token)
    try f
    finally {
      lockOwner.remove()
      // release only if the file still carries OUR token — after a stale
      // break it may be a new holder's lock, which is theirs to release
      try {
        val cur = new String(Files.readAllBytes(lockPath),
          java.nio.charset.StandardCharsets.UTF_8)
        if (cur == token) Files.deleteIfExists(lockPath)
      } catch { case _: Exception => () }
    }
  }

  // --- manifests ----------------------------------------------------------

  /** Write one commit's per-bucket file lists as an immutable manifest file;
    * returns its path (to be referenced by the next snapshot's manifest
    * list). Torn writes are impossible to observe: a manifest becomes
    * reachable only through a snapshot committed AFTER the atomic move here,
    * and an unreferenced manifest is swept by [[vacuum]].
    */
  def writeManifest(version: Long, files: Map[Int, Seq[FileEntry]]): String = {
    Files.createDirectories(metaDir)
    val target = metaDir.resolve(f"man-$version%012d-${System.nanoTime()}.json")
    val j = new java.util.LinkedHashMap[String, Object]()
    j.put("files", files.map { case (b, fs) =>
      b.toString -> fs.map(f => s"${f.bytes}|${f.path}").asJava }.asJava)
    val tmp = metaDir.resolve(s".tmp-${target.getFileName}")
    mapper.writeValue(tmp.toFile, j)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    target.toString
  }

  /** Manifests are immutable once published, so a driver-side cache makes
    * re-resolution (once per micro-batch on a streaming driver) free. Bounded
    * by a crude clear-on-overflow: entries are small and the live manifest
    * set of one table is O(buckets + deltas since compaction).
    */
  private val manifestCache =
    new java.util.concurrent.ConcurrentHashMap[String, Map[Int, Seq[FileEntry]]]()

  def readManifest(path: String): Map[Int, Seq[FileEntry]] = {
    val cached = manifestCache.get(path)
    if (cached != null) return cached
    val m = mapper.readValue(Paths.get(path).toFile,
      classOf[java.util.Map[String, Object]])
    val files = m.get("files").asInstanceOf[java.util.Map[String, Object]].asScala
      .map { case (b, fs) =>
        b.toInt -> fs.asInstanceOf[java.util.List[String]].asScala.toSeq.map { e =>
          val cut = e.indexOf('|')
          FileEntry(e.substring(cut + 1), e.substring(0, cut).toLong)
        } }.toMap
    if (manifestCache.size > 4096) manifestCache.clear()
    manifestCache.put(path, files)
    files
  }

  /** Resolve a snapshot's live data files, optionally restricted to a bucket
    * set — only manifests whose live-bucket mask intersects the request are
    * read, so a pruned read costs O(relevant manifests), not O(table files).
    * Within a bucket, list order = commit order (base file lists first, then
    * delta appends), which is the order the MOR fold and vacuum rely on.
    */
  def resolveFiles(s: Snapshot, buckets: Option[Set[Int]] = None): Map[Int, Seq[FileEntry]] = {
    val out = scala.collection.mutable.Map.empty[Int, Seq[FileEntry]]
    s.manifests.foreach { ref =>
      val live = buckets.map(ref.buckets.intersect).getOrElse(ref.buckets)
      if (live.nonEmpty) {
        val files = readManifest(ref.path)
        live.foreach { b =>
          val fs = files.getOrElse(b, Seq.empty)
          if (fs.nonEmpty) out.update(b, out.getOrElse(b, Seq.empty) ++ fs)
        }
      }
    }
    out.toMap
  }

  def allFiles(s: Snapshot): Seq[String] =
    resolveFiles(s).values.flatten.map(_.path).toSeq

  // --- data ---------------------------------------------------------------

  /** Data-file paths for a commit directory, keyed by bucket. */
  def commitDir(version: Long, writerId: String, batchId: Long): Path =
    dataDir.resolve(s"c$version-$writerId-$batchId")

  /** A unique staging directory for one apply ATTEMPT. Concurrent writers —
    * or a split-brain second instance of the same writerId — can race the
    * same (version, writerId, batchId) triple; a deterministic name would
    * have them overwriting each other's in-flight data files. Each attempt
    * stages to its own directory instead: published files are referenced by
    * absolute path in the manifest (the directory name is informational),
    * and an abandoned attempt is never referenced, so vacuum sweeps it.
    */
  def attemptDir(version: Long, writerId: String, batchId: Long): Path =
    dataDir.resolve(
      s"c$version-$writerId-$batchId-${java.util.UUID.randomUUID().toString.take(8)}")

  def listBucketFiles(dir: Path): Map[Int, Seq[FileEntry]] = {
    if (!Files.isDirectory(dir)) return Map.empty
    LakeTable.listing(Files.list(dir)) {
      _.filter(_.getFileName.toString.startsWith("bucket=")).toSeq
    }.map { bdir =>
      val b = bdir.getFileName.toString.stripPrefix("bucket=").toInt
      val fs = LakeTable.listing(Files.list(bdir)) {
        _.filter(_.toString.endsWith(".parquet")).toSeq
      }.sortBy(_.toString).map(p => FileEntry(p.toString, Files.size(p)))
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
        val paths = resolveFiles(s, buckets).values.flatten.map(_.path).toSeq
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
    // a requested version that doesn't exist must throw on EVERY path —
    // falling back to the current snapshot would serve wrong data labeled
    // as the requested version
    val snap = asOfVersion match {
      case Some(v) => Some(snapshotAt(v).getOrElse(
        throw new IllegalArgumentException(s"no snapshot v$v")))
      case None => currentSnapshot()
    }
    // Delta-carrying reads fold bucket-locally (BucketLocal.readFolded):
    // partition i reads bucket i's base + delta files and resolves winners
    // in-task — ZERO exchanges regardless of delta depth. Column pruning is
    // moot on this branch (winner semantics need whole rows). Compacted
    // tables take the plain parquet scan, which keeps full pushdown/pruning
    // for analytical readers.
    val resolved = snap match {
      case Some(s) if s.morDeltas =>
        graft.operators.BucketLocal.readFolded(spark, this, s)
      case _ => readRaw(spark, None, asOfVersion)
    }
    resolved.filter(col("op") =!= Model.OpDelete).drop("op")
  }

  /** Commit history as a DataFrame (the DESCRIBE HISTORY surface): one row
    * per retained snapshot with its lineage metrics — the queryable face of
    * the reference's per-run ConversionStats + marker files. Reads only the
    * O(retained snapshots) metadata JSONs, never data files.
    */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    versions().flatMap(snapshotAt).map { s =>
      (s.version, s.parentVersion, s.numBuckets, s.totalRows,
        s.manifests.size, s.manifests.count(_.delta), s.morDeltas,
        s.committed, s.metrics)
    }.toDF("version", "parent_version", "num_buckets", "total_rows",
      "manifests", "delta_manifests", "mor_deltas", "committed", "metrics")
  }

  /** Roll the table back to the state of `toVersion` — as a NEW commit whose
    * manifest list, schema, lineage AND idempotence ledger are the target's
    * (Iceberg's rollback-to-snapshot). O(1) metadata: no data file moves,
    * the new snapshot simply references the old manifests; versions between
    * `toVersion` and the rollback commit become unreferenced once the
    * history expires and are then swept by [[vacuum]].
    *
    * Rolling the LEDGER back is the point: a streaming writer resumed after
    * the rollback re-applies every batch past the target's ledger (its
    * checkpoint replays them; the per-writer maxBatchId check accepts them
    * again), converging the table forward deterministically instead of
    * silently skipping the rolled-back range.
    */
  def rollback(toVersion: Long): Snapshot = {
    val cur = currentSnapshot().getOrElse(
      throw new IllegalStateException("empty table cannot be rolled back"))
    require(toVersion <= cur.version,
      s"cannot roll back to future version $toVersion (current ${cur.version})")
    val target = snapshotAt(toVersion).getOrElse(
      throw new IllegalArgumentException(s"no snapshot v$toVersion (vacuumed?)"))
    val s = target.copy(
      version = cur.version + 1,
      parentVersion = cur.version,
      metrics = Map("rollbackTo" -> toVersion))
    commit(s)
    s
  }

  /** Point lookup of one turn. The key hash names the ONE bucket that can
    * hold it (the same murmur3(seed 42) + pmod as [[bucketCol]] and the
    * merge's repartition, evaluated driver-side), so the scan opens only
    * that bucket's files — O(table/numBuckets) I/O, not O(table) — and on a
    * compacted (clustered) table the pushed key predicate then skips row
    * groups within them. Delta-carrying snapshots fold that one bucket
    * in-task first (same LWW rule), so MOR and COW lookups agree.
    */
  /** The bucket holding key (convId, turnIdx) — the same murmur3(seed 42) +
    * pmod as [[bucketCol]] and the merge's repartition, evaluated
    * driver-side. The basis of every key-addressed physical pruning
    * ([[lookupTurn]], [[lookupConversation]], IncrementalAgg's refresh).
    */
  def bucketFor(convId: String, turnIdx: Int): Int = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
    val h = Murmur3Hash(Seq(
      Literal.create(convId, org.apache.spark.sql.types.StringType),
      Literal(turnIdx)), 42).eval(null).asInstanceOf[Int]
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  def lookupTurn(spark: SparkSession, convId: String, turnIdx: Int): DataFrame = {
    currentSnapshot() match {
      case None => spark.emptyDataFrame
      case Some(s) =>
        // same physical-identity guard as the apply paths: the bucket id is
        // computed from the HANDLE's count, so a handle left stale by a
        // rebucket would silently name the wrong bucket of the new layout
        require(s.numBuckets == numBuckets,
          s"table has ${s.numBuckets} buckets; handle opened with $numBuckets")
        val one = Some(Set(bucketFor(convId, turnIdx)))
        // pin the read to the SNAPSHOT the bucket id was derived from — a
        // concurrent commit between resolution and read must not retarget it
        val base =
          if (s.morDeltas) graft.operators.BucketLocal.readFolded(spark, this, s, one)
          else readRaw(spark, one, asOfVersion = Some(s.version))
        base.filter(col("conv_id") === convId && col("turn_idx") === turnIdx &&
            col("op") =!= Model.OpDelete)
          .drop("op")
    }
  }

  /** Fetch a whole conversation's live turns — THE read pattern of a
    * transcript store. The turns of one conversation spread across buckets
    * (the bucket key is (conv_id, turn_idx), chosen so hot conversations
    * cannot skew a bucket), but for turn_idx < `maxTurnExclusive` the exact
    * bucket SET is driver-computable: hash each candidate turn id until the
    * set saturates (coupon-collector: ~N·lnN turns fill all N buckets, so a
    * huge bound degrades gracefully to a full-bucket read, never an error).
    * The scan opens only those buckets' files; the pushed conv_id predicate
    * then skips row groups within them (tight after key-clustered
    * compaction). Turns at or beyond the bound are EXCLUDED by predicate,
    * not silently missed — the result is exact for the declared range.
    */
  def lookupConversation(spark: SparkSession, convId: String,
      maxTurnExclusive: Int = 4096): DataFrame = {
    require(maxTurnExclusive > 0, s"maxTurnExclusive must be > 0")
    currentSnapshot() match {
      case None => spark.emptyDataFrame
      case Some(s) =>
        require(s.numBuckets == numBuckets,
          s"table has ${s.numBuckets} buckets; handle opened with $numBuckets")
        val buckets = scala.collection.mutable.Set.empty[Int]
        var t = 0
        while (t < maxTurnExclusive && buckets.size < numBuckets) {
          buckets += bucketFor(convId, t)
          t += 1
        }
        val some = Some(buckets.toSet)
        // pin to the snapshot the bucket set was derived from (same contract
        // as lookupTurn)
        val base =
          if (s.morDeltas) graft.operators.BucketLocal.readFolded(spark, this, s, some)
          else readRaw(spark, some, asOfVersion = Some(s.version))
        base.filter(col("conv_id") === convId &&
            col("turn_idx") < maxTurnExclusive &&
            col("op") =!= Model.OpDelete)
          .drop("op")
    }
  }

  /** Vacuum: delete data files not referenced by the newest `keepLast`
    * snapshots, then drop the older snapshot JSONs and any manifest file no
    * kept snapshot points at (masked-out or expired manifests, plus torn
    * manifest/snapshot writes). Returns deleted data-file count. Mirrors
    * Iceberg's expire-snapshots + orphan-file cleanup; also sweeps
    * half-written commit dirs left by crashes (never referenced).
    *
    * `graceMs` (default 1 h): an UNREFERENCED file younger than the grace
    * window is spared — it may belong to an IN-FLIGHT commit from a live
    * writer (data files and the manifest are written BEFORE the snapshot
    * rename publishes them; `.tmp-` files exist between temp write and
    * atomic rename). Deleting those would crash the writer's commit. This
    * is Iceberg's `olderThan` contract for orphan cleanup. Pass 0 only when
    * no writer can be live (tests, decommission).
    */
  def vacuum(keepLast: Int = 1, graceMs: Long = 3600000L): Int = {
    val names = snapshotFiles()
    if (names.isEmpty) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    def expendable(p: Path): Boolean =
      try Files.getLastModifiedTime(p).toMillis < cutoff
      catch { case _: java.io.IOException => false } // raced away: not ours
    // Empty-dir collection: under a live writer (graceMs > 0) a dir must be
    // OLD to be swept — a just-created commit dir / _temporary staging tree
    // is briefly empty, and sweeping it mid-commit crashes the writer
    // (found by the vacuum-under-live-tail test). graceMs == 0 is the
    // caller's explicit no-live-writer assertion, where immediate collection
    // of just-emptied dirs is safe (their mtime was refreshed by the file
    // deletes above and would otherwise wait a second sweep).
    def dirExpendable(p: Path): Boolean = graceMs == 0L || expendable(p)
    // Files.walk throws NoSuchFileException (as UncheckedIOException) when a
    // live writer's _temporary task dirs vanish mid-traversal — a sweep under
    // a live tail must tolerate entries disappearing under it, not abort.
    // NOFOLLOW on the recursion check preserves Files.walk's default
    // no-follow semantics: a symlinked dir under data/ (operator relocation)
    // must be neither descended into (its files are not in `referenced` and
    // would be deleted as orphans) nor able to cycle the recursion.
    def walkTolerant(p: Path): Seq[Path] = {
      val children =
        if (!Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS)) Seq.empty
        else try LakeTable.listing(Files.list(p))(_.toSeq)
          catch { case _: java.io.IOException | _: java.io.UncheckedIOException => Seq.empty }
      p +: children.flatMap(walkTolerant)
    }
    val (expire, keep) = names.splitAt(math.max(0, names.size - keepLast))
    val keptSnaps = keep.map(n => readSnapshot(metaDir.resolve(n)))
    val referenced: Set[String] = keptSnaps.flatMap(allFiles).toSet
    var deleted = 0
    if (Files.isDirectory(dataDir)) {
      walkTolerant(dataDir).reverse.foreach { p =>
        if (Files.isRegularFile(p) && !referenced.contains(p.toString) &&
            expendable(p)) {
          // deleteIfExists: between the expendable() check and here a
          // concurrent vacuum (or a crashed writer's own cleanup) can have
          // removed the file — a NoSuchFileException must not abort the
          // sweep and strand the remaining orphans + snapshot expiry
          if (Files.deleteIfExists(p)) deleted += 1
        } else if (Files.isDirectory(p) && p != dataDir && dirExpendable(p)) {
          // A writer racing a file into an old empty dir makes this delete
          // fail non-empty; the dir (or its listing) racing away entirely is
          // equally fine — ignored, nothing to sweep.
          try {
            if (LakeTable.listing(Files.list(p))(_.take(1).toSeq).isEmpty)
              Files.deleteIfExists(p)
          } catch { case _: java.io.IOException | _: java.io.UncheckedIOException => }
        }
      }
    }
    val liveManifests: Set[String] = keptSnaps.flatMap(_.manifests.map(_.path)).toSet
    LakeTable.listing(Files.list(metaDir)) {
      _.filter { p =>
        val n = p.getFileName.toString
        n.startsWith("man-") || n.startsWith(".tmp-")
      }.toSeq
    }.foreach { p =>
      if (!liveManifests.contains(p.toString) && expendable(p)) Files.deleteIfExists(p)
    }
    manifestCache.clear()
    expire.foreach(n => Files.deleteIfExists(metaDir.resolve(n)))
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
  def footerRowCounts(byBucket: Map[Int, Seq[FileEntry]]): Map[Int, Long] = {
    import org.apache.hadoop.conf.Configuration
    import scala.collection.parallel.CollectionConverters._
    val conf = new Configuration()
    val flat = byBucket.toSeq.flatMap { case (b, fs) => fs.map(f => b -> f.path) }
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
