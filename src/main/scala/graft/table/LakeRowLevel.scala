package graft.table

import graft.model.Model
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, Murmur3Hash, UnsafeProjection}
import org.apache.spark.sql.connector.distributions.{Distribution, Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RequiresDistributionAndOrdering, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftbridge.WriteBridge
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL `MERGE INTO` / `UPDATE` (and predicate-untranslatable `DELETE`) on
  * lake tables, via Spark's GROUP-BASED row-level operation framework —
  * where the group IS the engine's bucket, its native copy-on-write rewrite
  * unit.
  *
  * How the pieces line up with Spark's rewrite (RewriteMergeIntoTable /
  * RewriteUpdateTable / RewriteDeleteFromTable → ReplaceData):
  *
  *   - the TARGET SCAN is the ordinary lake scan ([[LakeScanBuilder]]) with
  *     an `onPlan` hook: after static pushdown ∩ runtime group filtering
  *     (Spark's RowLevelOperationRuntimeGroupFiltering drives the scan's
  *     existing `SupportsRuntimeFiltering` with the matched rows' keys), the
  *     scan reports exactly which buckets it planned — those are the groups
  *     whose full replacement content Spark will hand the write.
  *   - the WRITE declares `RequiresDistributionAndOrdering` clustered on the
  *     table's bucket transform, so Spark shuffles the replacement rows ONCE
  *     and each bucket's rows arrive at a single task; tasks stream rows
  *     into per-bucket parquet files through Spark's own writer
  *     ([[WriteBridge]]) — the driver never touches data.
  *   - COMMIT is O(touched) metadata: scanned buckets' old files are masked
  *     out of the manifest list and the new files take their place; rows the
  *     statement produced for UNSCANNED buckets (e.g. NOT-MATCHED inserts
  *     hashing elsewhere) become a DELTA manifest — an LSM append folded by
  *     the read path, never a blind rewrite of groups Spark didn't read.
  *
  * CDC-invariant preservation: the SQL scan folds tombstones out, so a naive
  * group replacement would DROP the replaced buckets' tombstones and a stale
  * out-of-order insert could resurrect a deleted turn. Instead the commit
  * re-reads just the replaced buckets' tombstone rows (one filtered scan of
  * the groups already being rewritten — same cost class as the op itself)
  * and carries them as a delta manifest. LWW is associative, so the old
  * tombstones fold correctly against the replacement rows: a key the
  * statement re-inserted with a NEWER (ts, seq) lives; a pre-delete replay
  * stays dead — exactly the engine's contract everywhere else.
  *
  * Concurrency: same OCC as every other writer. A lost CAS whose winner left
  * the touched buckets' file lists unchanged is rebased (pure metadata); a
  * winner that changed them means the replacement content is stale — the
  * statement FAILS with a concurrent-modification error and must be re-run
  * (Spark cannot re-execute the rewrite plan from inside the connector).
  */
final class LakeRowLevelOperationBuilder(root: String, info: RowLevelOperationInfo)
    extends RowLevelOperationBuilder {
  override def build(): RowLevelOperation = new LakeRowLevelOperation(root, info)
}

final class LakeRowLevelOperation(root: String, info: RowLevelOperationInfo)
    extends RowLevelOperation {
  private val table = LakeTable.open(root)
  private[table] val snap = table.currentSnapshot().getOrElse(
    throw new IllegalArgumentException(s"lake: table at $root has no committed snapshot"))

  /** Set by the target scan at plan time (None until planned): the groups
    * the replacement output stands for. Spark plans the scan before it runs
    * the write job, so the write's commit always observes the final value.
    */
  @volatile private[table] var scannedBuckets: Option[Set[Int]] = None

  override def command(): RowLevelOperation.Command = info.command()
  override def description(): String = s"lake.${info.command()}(`$root`, v${snap.version})"

  /** Forcing the `_bucket` metadata column through the rewrite plan is what
    * buys group pruning AND the clean write protocol: the runtime group
    * filter becomes `_bucket IN (matched groups)` (translatable), and the
    * write gets a metadata projection, so rows arrive projected with the
    * bucket alongside (DataAndMetadataWritingSparkTask) instead of the raw
    * `[__row_operation] ++ row` fallback layout.
    */
  override def requiredMetadataAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column(LakeSource.BucketCol))

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeScanBuilder(table, snap, planned => { scannedBuckets = Some(planned) },
      rowLevel = true)

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      override def build(): Write = new LakeReplaceDataWrite(
        LakeRowLevelOperation.this, table, snap, writeInfo)
    }
}

/** The group-replacing write: clustered by the bucket transform (one shuffle,
  * whole buckets per task), tasks write per-bucket parquet, the driver
  * commits metadata.
  */
private final class LakeReplaceDataWrite(
    op: LakeRowLevelOperation,
    table: LakeTable,
    snap: Snapshot,
    info: LogicalWriteInfo) extends Write with RequiresDistributionAndOrdering with BatchWrite {

  override def requiredDistribution(): Distribution =
    Distributions.clustered(Array(
      Expressions.bucket(snap.numBuckets, "conv_id", "turn_idx")))
  override def requiredOrdering(): Array[SortOrder] = Array.empty
  override def requiredNumPartitions(): Int = snap.numBuckets
  override def toBatch: BatchWrite = this
  override def description(): String = s"LakeReplaceData(v${snap.version})"

  private val outDir = table.attemptDir(snap.version + 1, "sql-rlo", 0L)

  override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(outDir)
    new LakeReplaceWriterFactory(
      WriteBridge.parquetWriterFactory(SparkSession.active, snap.schema),
      info.schema(), snap.schema, snap.numBuckets, outDir.toString)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val entries = messages.flatMap(_.asInstanceOf[LakeReplaceMessage].files)
    val newFiles: Map[Int, Seq[FileEntry]] = entries.groupBy(_.bucket)
      .view.mapValues(_.map(e => FileEntry(e.path, e.bytes, e.stats))
        .toSeq.sortBy(_.path)).toMap
    val newRows: Map[Int, Long] = entries.groupBy(_.bucket)
      .view.mapValues(_.map(_.rows).sum).toMap
    // the groups this output REPLACES = what the target scan actually read
    // (a never-planned scan means Spark read nothing — replace nothing)
    val replaced: Set[Int] = op.scannedBuckets.getOrElse(Set.empty)
    val baseFiles = newFiles.filter { case (b, _) => replaced.contains(b) }
    val deltaFiles = newFiles.filter { case (b, _) => !replaced.contains(b) }

    // preserve the replaced buckets' CDC tombstones as a delta (see class doc)
    val tombFiles: Map[Int, Seq[FileEntry]] =
      if (replaced.isEmpty) Map.empty
      else {
        val tombDir = outDir.resolve("tombstones")
        table.readRaw(spark, Some(replaced), asOfVersion = Some(snap.version))
          .filter(col("op") === Model.OpDelete)
          .withColumn("bucket", table.bucketCol)
          .write.mode("overwrite").partitionBy("bucket").parquet(tombDir.toString)
        table.listBucketFiles(tombDir)
      }

    if (replaced.isEmpty && newFiles.isEmpty) return // no groups, no rows: no-op

    val touched = replaced ++ deltaFiles.keySet
    def refsFor(version: Long): Seq[ManifestRef] = {
      val base = if (baseFiles.isEmpty && replaced.isEmpty) Seq.empty
        else Seq(ManifestRef(table.writeManifest(version, baseFiles), replaced, delta = false))
      val tomb = if (tombFiles.isEmpty) Seq.empty
        else Seq(ManifestRef(table.writeManifest(version, tombFiles), tombFiles.keySet, delta = true))
      val extra = if (deltaFiles.isEmpty) Seq.empty
        else Seq(ManifestRef(table.writeManifest(version, deltaFiles), deltaFiles.keySet, delta = true))
      base ++ tomb ++ extra
    }
    val writerId = Option(info.options().get("writerId")).getOrElse("sql-rlo")
    // one parallel pass sharing one Hadoop Configuration — a per-bucket
    // footerRowCount call rebuilds the ~20 ms Configuration per bucket and
    // turns a wide MERGE's commit into seconds of serial driver time
    val tombRows = table.footerRowCounts(tombFiles)

    def candidate(cur: Snapshot, rebasedFrom: Option[Long]): Snapshot = {
      val mine = refsFor(cur.version + 1)
      val manifests = cur.manifests
        .map(m => m.copy(buckets = m.buckets -- replaced))
        .filter(_.buckets.nonEmpty) ++ mine
      val rows = cur.bucketRows --
        replaced ++
        replaced.map(b => b -> (newRows.getOrElse(b, 0L) + tombRows.getOrElse(b, 0L))).toMap ++
        deltaFiles.keySet.map(b => b ->
          (cur.bucketRows.getOrElse(b, 0L) + newRows.getOrElse(b, 0L))).toMap
      Snapshot(
        version = cur.version + 1,
        schemaJson = cur.schema.json,
        numBuckets = cur.numBuckets,
        manifests = manifests,
        committed = cur.committed + (writerId -> (cur.maxBatchId(writerId) + 1)),
        bucketRows = rows.filter(_._2 > 0),
        metrics = Map(
          "batchRows" -> newRows.values.sum,
          "touchedBuckets" -> touched.size.toLong,
          "replacedBuckets" -> replaced.size.toLong,
          "rowLevelCommand" -> op.command().ordinal().toLong) ++
          rebasedFrom.map("rebasedFrom" -> _),
        parentVersion = cur.version,
        morDeltas = manifests.exists(_.delta))
    }

    var cand = candidate(snap, None)
    while (true) {
      try {
        table.commit(cand)
        return
      } catch {
        case _: CommitConflictException =>
          val cur = table.currentSnapshot().getOrElse(
            throw new IllegalStateException("commit conflict on an empty table"))
          if (cur.numBuckets != snap.numBuckets ||
              table.resolveFiles(cur, Some(touched)) != table.resolveFiles(snap, Some(touched))) {
            // a concurrent commit changed the groups this statement rewrote:
            // the replacement content is stale and Spark cannot re-run the
            // rewrite plan from here — clean up and make the user retry
            abort(messages)
            throw new java.util.ConcurrentModificationException(
              s"lake table at ${table.root} changed concurrently in buckets " +
                s"${touched.toSeq.sorted.mkString("{", ",", "}")} during ${op.command()}; " +
                "re-run the statement against the new snapshot")
          }
          cand = candidate(cur, Some(snap.version + 1))
      }
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(outDir.toFile)
}

/** One task-written data file: bucket, path, bytes, rows, and the rows'
  * key bounds (tracked as the rows streamed through the writer — zero extra
  * I/O; becomes the manifest's [[FileStats]] for file skipping).
  */
private final case class ReplaceFile(bucket: Int, path: String, bytes: Long,
    rows: Long, stats: Option[FileStats])

private final case class LakeReplaceMessage(
    files: Seq[ReplaceFile]) extends WriterCommitMessage

/** Per-task writer: routes each replacement row to its bucket's parquet file
  * (same murmur3(seed 42) + pmod as every other engine path), appending the
  * internal `op = insert` column the SQL surface hides.
  */
private final class LakeReplaceWriterFactory(
    writers: WriteBridge.TaskWriterFactory,
    inputSchema: StructType,
    tableSchema: StructType,
    numBuckets: Int,
    outDir: String) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LakeBucketDataWriter(writers, inputSchema, tableSchema, numBuckets,
      outDir, partitionId, taskId)
}

/** Per-task bucket-routing parquet writer, shared by the row-level
  * (ReplaceData) write and the streaming sink: routes each row to its
  * bucket's parquet file (same murmur3(seed 42) + pmod as every other engine
  * path), appending the internal `op = insert` column the SQL surface hides.
  */
private[table] final class LakeBucketDataWriter(
    writers: WriteBridge.TaskWriterFactory,
    inputSchema: StructType,
    tableSchema: StructType,
    numBuckets: Int,
    outDir: String,
    partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {

  // Row-layout protocol: with no metadata projection, Spark's
  // ReplaceDataExec.writingTask falls back to the plain
  // DataWritingSparkTask, which hands the writer the RAW rewrite-plan
  // output — `[__row_operation: int] ++ dataColumns` — rather than the
  // row projection the LogicalWriteInfo schema describes. The shift is
  // detected from the first row's arity (0 = already projected — also the
  // only shape streaming epochs produce — and 1 = the leading operation
  // column) and anything else fails loudly.
  private var shift = -1
  private var project: UnsafeProjection = _
  private var hash: Murmur3Hash = _
  private def bind(row: InternalRow): Unit = {
    shift = row.numFields - inputSchema.size
    require(shift == 0 || shift == 1,
      s"unexpected write row arity ${row.numFields} for schema " +
        s"${inputSchema.fieldNames.mkString(",")} — Spark write protocol changed?")
    def ref(name: String): BoundReference = {
      val i = inputSchema.fieldIndex(name)
      BoundReference(i + shift, inputSchema.fields(i).dataType, inputSchema.fields(i).nullable)
    }
    // input row (no op) → table-schema row with constant op = "insert"
    project = UnsafeProjection.create(
      tableSchema.fields.toIndexedSeq.map { f =>
        if (f.name == "op") Literal(UTF8String.fromString(Model.OpInsert), StringType)
        else ref(f.name)
      })
    hash = Murmur3Hash(Seq(ref("conv_id"), ref("turn_idx")), 42)
  }
  /** Per-open-file write stats: row count + key bounds of the rows written
    * so far. Bounds track the PROJECTED (table-schema) row; its UTF8Strings
    * point into the projection's reused buffer, so min/max are cloned on
    * update (rare after the first rows).
    */
  private final class FileAcc(val w: org.apache.spark.sql.execution.datasources.OutputWriter,
      convI: Int, turnI: Int, tsI: Int) {
    var rows = 0L
    private var minConv: UTF8String = null
    private var maxConv: UTF8String = null
    private var minTurn = Int.MaxValue
    private var maxTurn = Int.MinValue
    private var minTs = Long.MaxValue
    private var maxTs = Long.MinValue
    private val bloom = ConvBloom.empty()
    def track(p: InternalRow): Unit = {
      rows += 1
      val c = p.getUTF8String(convI)
      if (minConv == null || c.compareTo(minConv) < 0) minConv = c.clone()
      if (maxConv == null || c.compareTo(maxConv) > 0) maxConv = c.clone()
      ConvBloom.add(bloom, c)
      val t = p.getInt(turnI)
      if (t < minTurn) minTurn = t
      if (t > maxTurn) maxTurn = t
      if (!p.isNullAt(tsI)) {
        val ts = p.getLong(tsI)
        if (ts < minTs) minTs = ts
        if (ts > maxTs) maxTs = ts
      }
    }
    def range: Option[FileStats] =
      if (rows == 0) None
      else Some(FileStats(minConv.toString, maxConv.toString, minTurn, maxTurn,
        ConvBloom.seal(bloom), None,
        if (minTs == Long.MaxValue) None else Some(minTs),
        if (maxTs == Long.MinValue) None else Some(maxTs)))
  }
  private lazy val tConvI = tableSchema.fieldIndex("conv_id")
  private lazy val tTurnI = tableSchema.fieldIndex("turn_idx")
  private lazy val tTsI = tableSchema.fieldIndex("ts")
  private val open = scala.collection.mutable.Map.empty[Int, FileAcc]

  /** Metadata-projection path (the row-level op's normal one): `meta`
    * carries the copied row's `_bucket`; inserted rows have no source group
    * (null) and hash like every other write path.
    */
  override def write(meta: InternalRow, row: InternalRow): Unit = {
    if (shift < 0) bind(row)
    val b = if (meta.isNullAt(0)) bucketOf(row) else meta.getInt(0)
    writeTo(b, row)
  }

  override def write(row: InternalRow): Unit = {
    if (shift < 0) bind(row)
    writeTo(bucketOf(row), row)
  }

  private def bucketOf(row: InternalRow): Int = {
    val h = hash.eval(row).asInstanceOf[Int]
    ((h % numBuckets) + numBuckets) % numBuckets
  }

  private def writeTo(b: Int, row: InternalRow): Unit = {
    val acc = open.getOrElseUpdate(b, {
      val dir = java.nio.file.Paths.get(outDir, s"bucket=$b")
      java.nio.file.Files.createDirectories(dir)
      val path = dir.resolve(f"part-$b%05d-p$partitionId-t$taskId.parquet").toString
      new FileAcc(writers.open(path, partitionId, taskId), tConvI, tTurnI, tTsI)
    })
    val p = project(row)
    acc.track(p)
    acc.w.write(p)
  }

  override def commit(): WriterCommitMessage = {
    val files = open.toSeq.sortBy(_._1).map { case (b, acc) =>
      acc.w.close()
      ReplaceFile(b, acc.w.path(),
        java.nio.file.Files.size(java.nio.file.Paths.get(acc.w.path())),
        acc.rows, acc.range)
    }
    open.clear()
    LakeReplaceMessage(files)
  }

  override def abort(): Unit = {
    open.values.foreach { acc =>
      try acc.w.close() catch { case _: Exception => () }
      try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(acc.w.path()))
      catch { case _: Exception => () }
    }
    open.clear()
  }

  override def close(): Unit = ()
}
