package graft.operators

import graft.model.Model
import graft.table.{LakeTable, ManifestRef, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.CollectionAccumulator

/** The engine core: apply one micro-batch of change events to a LakeTable as
  * an exactly-once, key-partitioned MERGE.
  *
  * This fuses the reference's two separate mechanisms —
  *   - the Redis max-version LWW dance (/root/reference SpecialCases.java:212-253)
  *   - the EC2 delete-then-import apply loop
  *     (incremental-updates-ingestion.py:29-63)
  * — into one distributed job per batch (the bucket-local merge):
  *
  * {{{
  *   batch ─ repartition(N, key) ──────────┐   partition i == bucket i
  *                                         ├─ zipPartitions: in-task LWW fold
  *   target ─ bucket-aligned parquet scan ─┘   ─ write touched buckets ─ atomic commit(batchId)
  * }}}
  *
  * ONE exchange total (the batch's); the table side never shuffles — its
  * bucket files are read directly by the task owning that bucket
  * (ScanBridge.bucketFilesRdd), and untouched buckets' tasks open no file.
  *
  * Correctness properties (tested in MergeSpec/StreamSpec):
  *   - idempotent: a replayed batchId is a no-op (ledger check before work)
  *   - cross-batch LWW: a later batch carrying an OLDER (ts, seq) for a key
  *     loses against the table row — including tombstones, so a stale insert
  *     cannot resurrect a deleted turn (the reference sidesteps this only by
  *     whole-folder ordering; we handle true out-of-order)
  *   - additive schema evolution: new columns widen the table schema; old
  *     files read back with nulls
  *
  * Scale notes (10^10 rows, 1000 executors):
  *   - within-batch dedup is `max_by` hash agg → map-side partial combine, so
  *     hot conversations collapse before the shuffle (no salting needed here)
  *   - the merge union re-shuffles only touched buckets' rows; write
  *     amplification is bounded by (touched buckets / total buckets)
  *   - tombstones are retained for LWW and dropped by [[compact]] once below
  *     an event-time watermark
  */
object MergeApplier {

  final case class ApplyResult(
      skipped: Boolean,
      version: Long,
      batchRows: Long,
      touchedBuckets: Int,
      upserts: Long,
      deletes: Long)

  /** One task attempt's write-side stats, deduplicated by partition id on
    * the driver: batch rows seen, batch deletes, rows written, and the
    * WRITTEN rows' key bounds — which become the commit's per-file
    * [[graft.table.FileStats]] (file skipping for point lookups) with zero
    * added I/O: the task already had every written row in hand.
    */
  private final case class TaskWriteStats(pid: Int, rows: Long, dels: Long,
      written: Long, range: Option[graft.table.FileStats])

  /** In-task LWW merge of one bucket: fold the batch partition's rows and
    * the bucket's stored rows into a per-key winner map under the SAME rule
    * as [[Lww.latestByKeyAgg]] — winner = max by (ts, seq), nulls lowest;
    * (ts, seq) ties keep the incumbent, which is unreachable in practice
    * because seq is unique per changelog. Emits winners (tombstones
    * included) tagged with the bucket id = partition id.
    *
    * Memory: the map holds one row per distinct key of (batch ∪ bucket) —
    * exactly the bucket's post-merge contents, which the COW contract sizes
    * to fit an executor anyway (a bucket IS the rewrite unit). Rows are
    * copied only when stored; losers are never copied.
    */
  private def mergeBucket(convI: Int, turnI: Int, tsI: Int, seqI: Int, opI: Int,
      statsAcc: CollectionAccumulator[TaskWriteStats])(
      batch: Iterator[InternalRow], target: Iterator[InternalRow]): Iterator[InternalRow] = {
    if (!batch.hasNext) return Iterator.empty // untouched bucket: no file opened
    val deleteOp = UTF8String.fromString(Model.OpDelete)
    val winners = new java.util.HashMap[(UTF8String, Int), InternalRow]()
    // fold() probes with a transient key view; copies row + key only on store
    def fold(r: InternalRow): Unit = {
      val cur = winners.get((r.getUTF8String(convI), r.getInt(turnI)))
      if (cur == null || BucketLocal.wins(r, cur, tsI, seqI)) {
        val c = r.copy()
        winners.put((c.getUTF8String(convI), c.getInt(turnI)), c)
      }
    }
    var nRows = 0L
    var nDel = 0L
    while (batch.hasNext) {
      val r = batch.next()
      nRows += 1
      if (!r.isNullAt(opI) && r.getUTF8String(opI).equals(deleteOp)) nDel += 1
      fold(r)
    }
    val partitionId = org.apache.spark.TaskContext.getPartitionId()
    while (target.hasNext) fold(target.next())
    // One (partitionId, rows, dels, winners) entry per task ATTEMPT; the
    // driver collapses duplicates by partition id, so a retried / recomputed
    // / speculated task (which re-reads the same deterministic partition and
    // produces the identical counts) cannot inflate the metrics — unlike raw
    // LongAccumulators, which double-count on any transformation
    // re-execution. `winners` = rows this bucket writes, so commit lineage
    // needs no post-write parquet footer reads on the hot path.
    // key stats over the WRITTEN rows (winner keys are safe copies): bounds
    // + conv bloom become the commit's per-file FileStats — free, the map
    // is in hand
    var minConv: UTF8String = null; var maxConv: UTF8String = null
    var minTurn = Int.MaxValue; var maxTurn = Int.MinValue
    val bloom = graft.table.ConvBloom.empty()
    val keys = winners.keySet().iterator()
    while (keys.hasNext) {
      val (c, t) = keys.next()
      if (minConv == null || c.compareTo(minConv) < 0) minConv = c
      if (maxConv == null || c.compareTo(maxConv) > 0) maxConv = c
      if (t < minTurn) minTurn = t
      if (t > maxTurn) maxTurn = t
      graft.table.ConvBloom.add(bloom, c)
    }
    // event-time bounds over the written rows (micros; null-ts rows excluded
    // — sound, a null ts satisfies no ts predicate): time-windowed scans
    // skip files exactly like key lookups skip on the conv bounds
    var minTs = Long.MaxValue; var maxTs = Long.MinValue
    val vals = winners.values().iterator()
    while (vals.hasNext) {
      val r = vals.next()
      if (!r.isNullAt(tsI)) {
        val ts = r.getLong(tsI)
        if (ts < minTs) minTs = ts
        if (ts > maxTs) maxTs = ts
      }
    }
    val tsLo = if (minTs == Long.MaxValue) None else Some(minTs)
    val tsHi = if (maxTs == Long.MinValue) None else Some(maxTs)
    val range = if (winners.isEmpty) None
      else Some(graft.table.FileStats(minConv.toString, maxConv.toString, minTurn, maxTurn,
        graft.table.ConvBloom.seal(bloom), None, tsLo, tsHi))
    statsAcc.add(TaskWriteStats(partitionId, nRows, nDel, winners.size.toLong, range))
    val bucketRow = new GenericInternalRow(Array[Any](partitionId))
    val joined = new JoinedRow
    import scala.jdk.CollectionConverters._
    winners.values().iterator().asScala.map(r => joined(r, bucketRow))
  }

  private def deleteDir(p: java.nio.file.Path): Unit =
    org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)

  /** Test seam: runs once per apply/compact ATTEMPT, after the data files are
    * staged but before the first CAS try — i.e. inside the race window.
    * Specs inject a concurrent winner here to exercise every conflict path
    * deterministically (rebase, re-run, split-brain skip, compaction yield);
    * the thread-race stress test covers the same paths nondeterministically.
    * Args: (writerId, batchId). No-op in production.
    */
  private[graft] var beforePublish: (String, Long) => Unit = (_, _) => ()

  /** Normalize an incoming changelog batch to the merged (evolved) schema. */
  private def evolve(table: LakeTable, batch: DataFrame): (DataFrame, StructType) = {
    val current = table.currentSnapshot().map(_.schema)
      .getOrElse(StructType(Seq.empty))
    val merged = if (current.isEmpty) batch.schema
      else Model.mergeSchemas(current, batch.schema)
    (Model.alignToSchema(batch, merged), merged)
  }

  /** Copy-on-write apply with OPTIMISTIC CONCURRENCY (Iceberg's multi-writer
    * contract, from scratch): the merge folds against a base snapshot; the
    * commit is a CAS on the snapshot version. A lost CAS is resolved by
    * [[cowAttempt]]'s conflict rule — rebase the metadata when the winner
    * left our touched buckets alone (disjoint writers, the common sharded-
    * ingest case: pure O(1) driver-side retry, no recompute), re-run the
    * whole merge when it rewrote or delta-appended any of them (our in-task
    * fold is stale — correctness over speed). LWW is order-independent, so
    * any interleaving of committed batches converges to the same state.
    */
  def applyBatch(spark: SparkSession, table: LakeTable, batch: DataFrame,
      writerId: String, batchId: Long): ApplyResult = {
    var attempts = 0
    while (attempts < 8) {
      attempts += 1
      // Optimistic first; after 4 lost races this writer is starved — its
      // re-run (a full Spark job) outlasts rivals' commit cadence, so pure
      // optimism livelocks. Escalate to the table's advisory commit lock:
      // rivals park at the commit gate while we fold, so the locked attempt
      // can lose at most once more (to a rival already past the gate when
      // we acquired), never twice. See LakeTable.withCommitLock.
      val attempt =
        if (attempts <= 4) cowAttempt(spark, table, batch, writerId, batchId, attempts)
        else table.withCommitLock(cowAttempt(spark, table, batch, writerId, batchId, attempts))
      attempt match {
        case Some(r) => return r
        case None => () // stale fold: merge re-runs against the new snapshot
      }
    }
    throw new IllegalStateException(
      s"COW apply $writerId/$batchId lost the commit race $attempts times " +
      "even under the exclusive commit lock — this indicates a lock breach " +
      "(stale-expiry misconfiguration), not ordinary contention")
  }

  /** Stage a COW merge WITHOUT publishing it — the WRITE of
    * write-audit-publish (Iceberg's WAP, from scratch). The full distributed
    * merge runs against the current snapshot; its output is recorded as a
    * staged ref (`meta/wap-<writerId>-<batchId>.json`) that pins the files
    * from vacuum but is invisible to every reader. Audit with
    * [[graft.table.LakeTable.readStaged]], then
    * [[graft.table.LakeTable.publishStaged]] (O(metadata) CAS) or
    * [[graft.table.LakeTable.dropStaged]]. Returns the staged ref name, or
    * None when the ledger already carries the batch (exactly-once holds
    * through staging too) or the batch was empty.
    */
  def stageBatch(spark: SparkSession, table: LakeTable, batch: DataFrame,
      writerId: String, batchId: Long): Option[String] = {
    val name = s"$writerId-$batchId"
    cowAttempt(spark, table, batch, writerId, batchId, stageName = Some(name)) match {
      case Some(r) if r.skipped || (r.batchRows == 0 && r.touchedBuckets == 0) => None
      case Some(_) => Some(name)
      case None => None // unreachable: staging never enters the publish race
    }
  }

  private def cowAttempt(spark: SparkSession, table: LakeTable, batch: DataFrame,
      writerId: String, batchId: Long, attempt: Int = 1,
      stageName: Option[String] = None): Option[ApplyResult] = {
    val t0 = System.nanoTime()
    val snap = table.currentSnapshot()
    val ledger = snap.map(_.maxBatchId(writerId)).getOrElse(-1L)
    if (batchId <= ledger) {
      // Exactly-once: this batch already landed in a published snapshot
      // (the streaming checkpoint replayed it after a crash). No-op.
      return Some(ApplyResult(skipped = true, snap.map(_.version).getOrElse(0L), 0, 0, 0, 0))
    }

    snap.foreach { s =>
      // The bucket function is part of the table's physical identity: pruning
      // and file layout both derive from it. A handle opened with a different
      // bucket count would silently mis-prune — fail loudly instead.
      require(s.numBuckets == table.numBuckets,
        s"table has ${s.numBuckets} buckets; handle opened with ${table.numBuckets}")
    }
    val (aligned, mergedSchema) = evolve(table, batch)
    val version = snap.map(_.version).getOrElse(0L) + 1
    val outDir = table.attemptDir(version, writerId, batchId)
    val keyCols = Model.KeyCols.map(col)

    // Shuffle-alignment trick: `bucket = pmod(hash(conv_id, turn_idx), N)`
    // uses the SAME murmur3 as Spark's hashpartitioning, so an explicit
    // repartition(N, key) (a) satisfies the LWW groupBy's clustering
    // requirement -- Catalyst inserts NO second exchange for the agg -- and
    // (b) leaves every output partition holding exactly one bucket, so the
    // bucketed write needs no further shuffle. One exchange per pass, total.
    def lwwByBucket(df: DataFrame): DataFrame =
      Lww.latestByKeyAgg(df.repartition(table.numBuckets, keyCols: _*))

    var batchRows = 0L
    var nDeletes = 0L
    var touchedCount = 0
    var statsWinners: Map[Int, Long] = Map.empty
    var keyRanges: Map[Int, graft.table.FileStats] = Map.empty

    val coldObs = new org.apache.spark.sql.Observation("cold-stats")
    snap match {
      case None =>
        // Cold start: no target to merge -- single pass, no persist, no
        // probe; stats piggyback on the write via observe() (zero extra jobs
        // -- an extra post-write scan was pure serial overhead in the
        // measured replay).
        lwwByBucket(aligned)
          .observe(coldObs,
            count(when(col("op") === Model.OpDelete, 1)).as("dels"))
          .withColumn("bucket", table.bucketCol)
          .write.mode("overwrite") // overwrite self-cleans a crashed attempt
          .partitionBy("bucket")
          .parquet(outDir.toString)
      case Some(s) =>
        // BUCKET-LOCAL MERGE — one job, one exchange (the batch's), ZERO
        // table-side shuffle, no probe job:
        //
        //   batch ─ repartition(N, key) ──┐ partition i == bucket i (same
        //                                 ├─ zipPartitions: in-task LWW fold
        //   target ─ bucket-aligned scan ─┘ (bucket i's files, read in task i)
        //
        // The target scan is ScanBridge.bucketFilesRdd: partition i reads
        // ONLY bucket i's data files through Spark's parquet reader function
        // (schema clipping = additive-evolution nulls), lazily — a partition
        // whose batch side is empty opens no file, which is the old probe's
        // file pruning for free, decided per task instead of via a separate
        // driver-side probe job. The in-task fold applies the same
        // associative (ts, seq)-max rule as Lww.latestByKeyAgg over a
        // hash map keyed by (conv_id, turn_idx); target buckets are already
        // key-unique in steady state (and MOR deltas fold correctly because
        // the rule is associative). Tombstones participate and are RETAINED,
        // so a later stale insert still loses.
        //
        // Alignment invariant (pinned by MergeSpec "partition id equals
        // bucket id"): repartition's HashPartitioning uses the same murmur3
        // (seed 42) as the table's bucketCol, so partition i holds exactly
        // bucket i's batch rows and the in-task bucket tag is the partition
        // id. Stats ride on a per-partition accumulator deduplicated by
        // partition id on the driver — exact even under task retry, stage
        // recompute, or speculation (a re-executed task re-emits the same
        // deterministic counts, which collapse).
        val statsAcc = spark.sparkContext
          .collectionAccumulator[TaskWriteStats]("graft.batchStats")
        val batchRdd = ScanBridge.toInternalRdd(
          aligned.repartition(table.numBuckets, keyCols: _*))
        val targetRdd = ScanBridge.bucketFilesRdd(spark, mergedSchema,
          BucketLocal.bucketArray(table, s))
        val tsI = mergedSchema.fieldIndex("ts")
        val seqI = mergedSchema.fieldIndex("seq")
        val opI = mergedSchema.fieldIndex("op")
        val convI = mergedSchema.fieldIndex("conv_id")
        val turnI = mergedSchema.fieldIndex("turn_idx")
        val merged = batchRdd.zipPartitions(targetRdd, preservesPartitioning = false)(
          mergeBucket(convI, turnI, tsI, seqI, opI, statsAcc))
        val outSchema = StructType(mergedSchema.fields :+
          StructField("bucket", org.apache.spark.sql.types.IntegerType, nullable = false))
        ScanBridge.internalDf(spark, merged, outSchema)
          .write.mode("overwrite")
          .partitionBy("bucket")
          .parquet(outDir.toString)
        import scala.jdk.CollectionConverters._
        val perPartition = statsAcc.value.asScala.groupBy(_.pid).values.map(_.head)
        batchRows = perPartition.map(_.rows).sum
        nDeletes = perPartition.map(_.dels).sum
        statsWinners = perPartition.map(s => s.pid -> s.written).toMap
        keyRanges = perPartition.flatMap(s => s.range.map(r => s.pid -> r)).toMap
        if (batchRows == 0) {
          // Idle trigger: nothing arrived. Emptiness detection piggybacks on
          // the merge job itself — an empty batch side makes every mergeBucket
          // task a no-op (no table file opened, no row written), so the job
          // costs one empty task wave. The former up-front `batch.isEmpty`
          // probe spent a separate Spark job on EVERY batch to spare only the
          // idle ones. Drop the empty output dir rather than commit an orphan
          // version; replay of an empty batch is trivially idempotent.
          deleteDir(outDir)
          return Some(ApplyResult(skipped = false, s.version, 0, 0, 0, 0))
        }
    }
    val tMeta = System.nanoTime()

    // key bounds from the merge fold ride into the manifest (file skipping
    // for point lookups); cold start has no per-partition stats — its base
    // files carry no bounds, which only disables skipping, never correctness
    val newBucketFiles = table.attachStats(table.listBucketFiles(outDir), keyRanges)
    if (snap.isEmpty && newBucketFiles.isEmpty) {
      // Empty FIRST batch on a cold table: same no-orphan-version contract as
      // the hot path's idle-trigger handling — commit nothing.
      deleteDir(outDir)
      return Some(ApplyResult(skipped = false, 0, 0, 0, 0, 0))
    }
    if (snap.nonEmpty) {
      // every touched bucket emits >=1 winner (tombstones retained), so the
      // written bucket set IS the touched set
      touchedCount = newBucketFiles.size
    }
    // Manifest-list commit: ONE new manifest file for the touched buckets;
    // prior refs keep their (untouched) buckets via mask subtraction — no
    // file list is ever rewritten, so commit metadata I/O is O(touched),
    // independent of how many data files the table holds. A COW rewrite of a
    // bucket also masks that bucket's MOR delta refs: the rewrite read and
    // folded them (the bucket-aligned scan reads base + deltas).
    val mine = newBucketFiles.keySet
    val myRef = ManifestRef(table.writeManifest(version, newBucketFiles),
      mine, delta = false)
    val manifests = snap.map(_.manifests).getOrElse(Seq.empty)
      .map(m => m.copy(buckets = m.buckets -- mine))
      .filter(_.buckets.nonEmpty) :+ myRef
    val prevRows = snap.map(_.bucketRows).getOrElse(Map.empty)
    // Hot path: per-bucket written rows are the merge fold's winner counts —
    // no re-opening of just-written parquet footers per micro-batch (driver
    // I/O off the tail's critical path). Cold start reads footers once.
    val newRows = if (snap.nonEmpty) statsWinners
      else table.footerRowCounts(newBucketFiles)
    if (snap.isEmpty) {
      // cold-start stats: totals from footers (free); tombstones from the
      // observed write metrics
      batchRows = newRows.values.sum
      touchedCount = newBucketFiles.size
      nDeletes = coldObs.get("dels").asInstanceOf[Long]
    }

    def metricsFor(extra: Map[String, Long]) = Map(
      "batchRows" -> batchRows,
      "upserts" -> (batchRows - nDeletes),
      "deletes" -> nDeletes,
      "touchedBuckets" -> touchedCount.toLong,
      "metaMs" -> (System.nanoTime() - tMeta) / 1000000,
      "durationMs" -> (System.nanoTime() - t0) / 1000000) ++
      // contention lineage: a commit whose merge had to RE-RUN against a
      // concurrent winner records which attempt landed (rebases record
      // "rebasedFrom" instead) — makes conflict cost auditable from history()
      (if (attempt > 1) Map("rerunAttempt" -> attempt.toLong) else Map.empty) ++
      extra

    stageName.foreach { n =>
      // WRITE of write-audit-publish: the full merge ran and its files +
      // manifest exist, but nothing is published — readers see the old head
      // until LakeTable.publishStaged CASes the staged ref in (O(metadata))
      // after LakeTable.readStaged's audit passes
      table.writeStaged(graft.table.StagedRef(n, snap.map(_.version).getOrElse(0L),
        mine, myRef.path, newRows, writerId, batchId, mergedSchema.json,
        metricsFor(Map.empty)))
      return Some(ApplyResult(skipped = false, snap.map(_.version).getOrElse(0L),
        batchRows, touchedCount, batchRows - nDeletes, nDeletes))
    }
    var cand = Snapshot(
      version = version,
      schemaJson = mergedSchema.json,
      numBuckets = table.numBuckets,
      manifests = manifests,
      committed = snap.map(_.committed).getOrElse(Map.empty) + (writerId -> batchId),
      bucketRows = prevRows ++ newRows,
      metrics = metricsFor(Map.empty),
      parentVersion = snap.map(_.version).getOrElse(0L),
      // a COW merge folds deltas only in the buckets it TOUCHED; untouched
      // buckets may still hold MOR deltas, so the flag clears only at compact
      morDeltas = snap.exists(_.morDeltas))

    // Optimistic publish. On a lost CAS: a concurrent commit that left OUR
    // buckets' resolved file lists exactly as the base snapshot had them
    // cannot have folded or superseded any row we merged — rebase is pure
    // metadata (mask our buckets out of the winner's manifest list, append
    // our ref, merge ledger/lineage/schema) and costs no recompute. Any
    // change to our buckets (COW rewrite, MOR delta, compaction, resize)
    // means our in-task fold is stale: drop the attempt's files and re-run
    // the merge (None → applyBatch loops).
    beforePublish(writerId, batchId)
    while (true) {
      try {
        table.commit(cand)
        return Some(ApplyResult(skipped = false, cand.version, batchRows,
          touchedCount, batchRows - nDeletes, nDeletes))
      } catch {
        case _: graft.table.CommitConflictException =>
          val cur = table.currentSnapshot().getOrElse(
            throw new IllegalStateException("commit conflict on an empty table"))
          if (cur.maxBatchId(writerId) >= batchId) {
            // split brain: another instance of this writer already landed the
            // batch — exactly-once holds, our attempt is redundant
            deleteDir(outDir)
            return Some(ApplyResult(skipped = true, cur.version, 0, 0, 0, 0))
          }
          require(cur.numBuckets == table.numBuckets,
            s"table was rebucketed to ${cur.numBuckets} buckets mid-apply " +
              s"(handle opened with ${table.numBuckets})")
          val baseFiles = snap.map(s => table.resolveFiles(s, Some(mine)))
            .getOrElse(Map.empty[Int, Seq[graft.table.FileEntry]])
          if (table.resolveFiles(cur, Some(mine)) != baseFiles) {
            deleteDir(outDir)
            return None
          }
          cand = Snapshot(
            version = cur.version + 1,
            schemaJson = Model.mergeSchemas(cur.schema, mergedSchema).json,
            numBuckets = table.numBuckets,
            manifests = cur.manifests.map(m => m.copy(buckets = m.buckets -- mine))
              .filter(_.buckets.nonEmpty) :+ myRef,
            committed = cur.committed + (writerId -> batchId),
            bucketRows = cur.bucketRows ++ newRows,
            metrics = metricsFor(Map("rebasedFrom" -> version)),
            parentVersion = cur.version,
            morDeltas = cur.morDeltas)
      }
    }
    None // unreachable
  }

  /** Merge-on-read apply: append the batch's events as DELTA files to each
    * touched bucket — NO target read, NO rewrite, NO aggregation (the LSM
    * "L0 append"); the read path (LakeTable.read) and the next [[compact]]
    * run the associative LWW fold, so COW and MOR commits interleave freely.
    *
    * Cost per batch is scan + ONE bucket-aligned exchange + write — strictly
    * O(batch), the high-throughput tail mode at 10^10 scale; compaction
    * amortizes the read-side merge (exactly Iceberg's v2 merge-on-read
    * contract, built from scratch). Within-batch LWW is deliberately NOT run
    * here: it collapses only the batch's own duplicate keys (~10% at the
    * measured skew) but costs a sort-aggregate over the whole batch — the
    * read/compact fold subsumes it for the same final state.
    */
  def applyBatchMor(spark: SparkSession, table: LakeTable, batch: DataFrame,
      writerId: String, batchId: Long): ApplyResult = {
    val t0 = System.nanoTime()
    val snap = table.currentSnapshot()
    if (batchId <= snap.map(_.maxBatchId(writerId)).getOrElse(-1L)) {
      return ApplyResult(skipped = true, snap.map(_.version).getOrElse(0L), 0, 0, 0, 0)
    }
    snap.foreach { s =>
      require(s.numBuckets == table.numBuckets,
        s"table has ${s.numBuckets} buckets; handle opened with ${table.numBuckets}")
    }
    val (aligned, mergedSchema) = evolve(table, batch)
    val version = snap.map(_.version).getOrElse(0L) + 1
    val outDir = table.attemptDir(version, writerId, batchId)
    val keyCols = Model.KeyCols.map(col)
    // Per-bucket lineage rides a per-partition accumulator (the COW
    // winner-count pattern): partition id == bucket id by the alignment
    // invariant, so the delta write needs neither a bucket-hash column per
    // row nor post-write parquet footer re-opens on the driver — the footer
    // reads were per-micro-batch driver I/O on the write-optimized tail's
    // critical path. One (pid, rows, dels) entry per task ATTEMPT; the
    // driver collapses duplicates by partition id (exact under retry /
    // speculation, like the COW stats).
    val statsAcc = spark.sparkContext
      .collectionAccumulator[TaskWriteStats]("graft.morStats")
    val opI = mergedSchema.fieldIndex("op")
    val convI = mergedSchema.fieldIndex("conv_id")
    val turnI = mergedSchema.fieldIndex("turn_idx")
    val tsI = mergedSchema.fieldIndex("ts")
    val deltaRdd = ScanBridge.toInternalRdd(
        aligned.repartition(table.numBuckets, keyCols: _*))
      .mapPartitions { it =>
        new Iterator[InternalRow] {
          private val pid = org.apache.spark.TaskContext.getPartitionId()
          private val deleteOp = UTF8String.fromString(Model.OpDelete)
          private val bucketRow = new GenericInternalRow(Array[Any](pid))
          private val joined = new JoinedRow
          private var nRows = 0L
          private var nDel = 0L
          // key stats of the delta file as it streams through — the
          // row's UTF8String points into a reused buffer, so min/max are
          // CLONED on update (rare after the first few rows); the bloom
          // hashes the buffer in place (no copies, 4 murmur probes/row)
          private var minConv: UTF8String = null
          private var maxConv: UTF8String = null
          private var minTurn = Int.MaxValue
          private var maxTurn = Int.MinValue
          private var minTs = Long.MaxValue
          private var maxTs = Long.MinValue
          private val bloom = graft.table.ConvBloom.empty()
          private var reported = false
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h && !reported) {
              reported = true
              val range = if (nRows == 0) None
                else Some(graft.table.FileStats(minConv.toString, maxConv.toString,
                  minTurn, maxTurn, graft.table.ConvBloom.seal(bloom), None,
                  if (minTs == Long.MaxValue) None else Some(minTs),
                  if (maxTs == Long.MinValue) None else Some(maxTs)))
              statsAcc.add(TaskWriteStats(pid, nRows, nDel, nRows, range))
            }
            h
          }
          override def next(): InternalRow = {
            val r = it.next()
            nRows += 1
            if (!r.isNullAt(opI) && r.getUTF8String(opI).equals(deleteOp)) nDel += 1
            val c = r.getUTF8String(convI)
            if (minConv == null || c.compareTo(minConv) < 0) minConv = c.clone()
            if (maxConv == null || c.compareTo(maxConv) > 0) maxConv = c.clone()
            graft.table.ConvBloom.add(bloom, c)
            val t = r.getInt(turnI)
            if (t < minTurn) minTurn = t
            if (t > maxTurn) maxTurn = t
            if (!r.isNullAt(tsI)) {
              val ts = r.getLong(tsI)
              if (ts < minTs) minTs = ts
              if (ts > maxTs) maxTs = ts
            }
            joined(r, bucketRow)
          }
        }
      }
    val outSchema = StructType(mergedSchema.fields :+
      StructField("bucket", org.apache.spark.sql.types.IntegerType, nullable = false))
    ScanBridge.internalDf(spark, deltaRdd, outSchema)
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(outDir.toString)
    import scala.jdk.CollectionConverters._
    val perPartition = statsAcc.value.asScala.groupBy(_.pid).values.map(_.head)
    val batchRows = perPartition.map(_.rows).sum
    val nDeletes = perPartition.map(_.dels).sum
    if (batchRows == 0) {
      // same no-orphan contract as the COW idle path: drop the empty dir
      deleteDir(outDir)
      return ApplyResult(skipped = false, snap.map(_.version).getOrElse(0L), 0, 0, 0, 0)
    }
    val tMeta = System.nanoTime()
    // delta files carry their key bounds + conv bloom (from the same
    // accumulator pass) — the skip input that keeps point lookups
    // O(files holding the key) on a delta-deep tail
    val keyRanges = perPartition.flatMap(s => s.range.map(r => s.pid -> r)).toMap
    val newBucketFiles = table.attachStats(table.listBucketFiles(outDir), keyRanges)
    val myRef = ManifestRef(table.writeManifest(version, newBucketFiles),
      newBucketFiles.keySet, delta = true)
    val prevRows = snap.map(_.bucketRows).getOrElse(Map.empty)
    // bucketRows counts STORED rows (incl. superseded versions until
    // compact); per-bucket counts come from the write-side accumulator — no
    // footer reads on the hot path
    val newRows = perPartition.filter(_.rows > 0).map(s => s.pid -> s.rows).toMap
    def rowsOn(base: Map[Int, Long]) = (base.keySet ++ newBucketFiles.keySet).map { b =>
      b -> (base.getOrElse(b, 0L) + newRows.getOrElse(b, 0L))
    }.toMap
    def metricsFor(extra: Map[String, Long]) = Map(
      "batchRows" -> batchRows,
      "upserts" -> (batchRows - nDeletes),
      "deletes" -> nDeletes,
      "touchedBuckets" -> newBucketFiles.size.toLong,
      "metaMs" -> (System.nanoTime() - tMeta) / 1000000,
      "durationMs" -> (System.nanoTime() - t0) / 1000000) ++ extra
    // Delta commit: append ONE delta manifest ref; no prior ref is touched.
    // Readers concatenate base + deltas per bucket in manifest-list order.
    var cand = Snapshot(
      version = version,
      schemaJson = mergedSchema.json,
      numBuckets = table.numBuckets,
      manifests = snap.map(_.manifests).getOrElse(Seq.empty) :+ myRef,
      committed = snap.map(_.committed).getOrElse(Map.empty) + (writerId -> batchId),
      bucketRows = rowsOn(prevRows),
      metrics = metricsFor(Map.empty),
      parentVersion = snap.map(_.version).getOrElse(0L),
      morDeltas = true)
    // Optimistic publish. A MOR delta is a pure append of not-yet-seen rows,
    // and the LWW fold is associative and order-independent — appending our
    // ref AFTER any concurrent commit (COW rewrite, another delta, a
    // compaction) folds to the same winners as any other order — so a lost
    // CAS always rebases as pure metadata: no conflict case re-runs the job.
    // (The one ordering caveat: concurrent compact(watermark) may expire a
    // tombstone our delta's late stale insert would have lost to; the
    // watermark contract — no in-flight source older than the watermark —
    // already forbids that input, exactly as in the sequential schedule.)
    beforePublish(writerId, batchId)
    while (true) {
      try {
        table.commit(cand)
        return ApplyResult(skipped = false, cand.version, batchRows,
          newBucketFiles.size, batchRows - nDeletes, nDeletes)
      } catch {
        case _: graft.table.CommitConflictException =>
          val cur = table.currentSnapshot().getOrElse(
            throw new IllegalStateException("commit conflict on an empty table"))
          if (cur.maxBatchId(writerId) >= batchId) {
            deleteDir(outDir) // split brain: the batch already landed once
            return ApplyResult(skipped = true, cur.version, 0, 0, 0, 0)
          }
          require(cur.numBuckets == table.numBuckets,
            s"table was rebucketed to ${cur.numBuckets} buckets mid-apply " +
              s"(handle opened with ${table.numBuckets})")
          cand = Snapshot(
            version = cur.version + 1,
            schemaJson = Model.mergeSchemas(cur.schema, mergedSchema).json,
            numBuckets = table.numBuckets,
            manifests = cur.manifests :+ myRef,
            committed = cur.committed + (writerId -> batchId),
            bucketRows = rowsOn(cur.bucketRows),
            metrics = metricsFor(Map("rebasedFrom" -> version)),
            parentVersion = cur.version,
            morDeltas = true)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Cold start (§3.1): single-pass full replay — read the whole changelog,
    * one global LWW, write every bucket, one commit. Replaces the reference's
    * two-pass detect-last-update + convert-winners workflow
    * (full-etl.asl.json:474-543) with one shuffle.
    */
  def replayFull(spark: SparkSession, table: LakeTable, changelog: DataFrame,
      writerId: String = "replay", batchId: Long = 0L): ApplyResult =
    applyBatch(spark, table, changelog, writerId, batchId)

  /** Maintenance: drop tombstones older than `watermark` and rewrite all
    * buckets (compaction). Safe once no in-flight source can still produce
    * events with ts < watermark.
    */
  /** Compaction that folds deltas but retains EVERY tombstone — the variant
    * maintenance policies (auto-compaction) must use, since they cannot know
    * how late the source can still run. Returns rows in the compacted table,
    * or -1 if compaction yielded to sustained concurrent commits (see
    * [[compactMicros]] — retry at the next maintenance trigger).
    */
  def compactRetainTombstones(spark: SparkSession, table: LakeTable,
      textIndex: Boolean = false): Long =
    compactMicros(spark, table, Long.MinValue, textIndex = textIndex)

  def compact(spark: SparkSession, table: LakeTable,
      watermark: java.sql.Timestamp, textIndex: Boolean = false): Long =
    compactMicros(spark, table,
      org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(watermark),
      textIndex = textIndex)

  /** SELECTIVE compaction: fold only the given buckets' deltas and commit a
    * masked manifest list (old refs lose the targets, one new non-delta ref
    * claims them) — the rewrite is O(target buckets), not O(table). This is
    * the maintenance unit that holds at scale: a skewed tail drives deltas
    * into a few hot buckets, and rewriting the other 99% of a 100-TB table
    * to fold them is the wrong cost class. Tombstones are retained (a
    * maintenance policy cannot know how late the source runs); the manifest
    * LIST still grows by one ref per partial pass, so a periodic full
    * [[compactRetainTombstones]] (which resets the list) remains the
    * list-length bound — [[graft.streaming.CdcStream]]'s policy does both.
    * Returns rows written for the targets, 0 when none of them hold files,
    * or -1 after yielding to sustained concurrent commits.
    */
  def compactBucketsRetainTombstones(spark: SparkSession, table: LakeTable,
      buckets: Set[Int], textIndex: Boolean = false): Long =
    compactMicros(spark, table, Long.MinValue, Some(buckets), textIndex)

  /** Maintenance: rewrite the table under a NEW bucket count — the resize
    * path for the COW rewrite unit. A bucket must fit an executor (it is
    * both the merge fold's memory bound and the rewrite granularity), so a
    * table that has grown 100× needs more buckets; the bucket function is
    * part of the table's physical identity, so this is necessarily a full
    * one-shuffle rewrite (read folded state → repartition by the new key
    * hash → write all buckets → one commit), the same cost class as a
    * compaction plus one exchange. Tombstones ride along (physical state is
    * preserved exactly); the idempotence ledger carries over unchanged, so
    * a live writer resumes against the resized table transparently —
    * EXCEPT that any open handle (including the caller's) is stale: the
    * bucket count is frozen per handle, and every apply path re-checks it
    * against the snapshot and fails loudly. Use the returned handle.
    */
  def rebucket(spark: SparkSession, table: LakeTable, newNumBuckets: Int): LakeTable = {
    require(newNumBuckets > 0, s"invalid bucket count $newNumBuckets")
    val snap = table.currentSnapshot().getOrElse(
      throw new IllegalStateException("empty table cannot be rebucketed"))
    require(snap.numBuckets == table.numBuckets,
      s"table has ${snap.numBuckets} buckets; handle opened with ${table.numBuckets}")
    val resized = new LakeTable(table.root, newNumBuckets)
    if (newNumBuckets == snap.numBuckets) return resized
    val version = snap.version + 1
    // a concurrent commit during the rewrite makes the CAS below throw
    // CommitConflictException — resizing under live writers is the caller's
    // coordination decision, so it propagates rather than silently retrying
    val outDir = table.attemptDir(version, "rebucket", snap.version)
    // fold deltas first if present (the rewrite must land key-unique rows);
    // COW state reads raw — tombstones included on both paths
    val state =
      if (snap.morDeltas) BucketLocal.readFoldedAuto(spark, table, snap)
      else table.readRaw(spark)
    val keyCols = Model.KeyCols.map(col)
    // same alignment trick as the merge: repartition(newN, key) partitions
    // equal the NEW bucket function, so the partitioned write needs no
    // second exchange. Row counts + FileStats come from the SAME write-side
    // accumulator lineage as every other write path (no driver footer
    // reads), deduplicated by partition id against task retries.
    val statsAcc = spark.sparkContext
      .collectionAccumulator[(Int, graft.table.FileStats, Long, Long)]("rebucketStats")
    val aligned = Model.alignToSchema(state, snap.schema)
    BucketLocal.clusterTagAndTrack(spark,
        aligned.repartition(newNumBuckets, keyCols: _*), snap.schema, statsAcc)
      .write.mode("overwrite").partitionBy("bucket").parquet(outDir.toString)
    val perBucket = {
      import scala.jdk.CollectionConverters._
      statsAcc.value.asScala.groupBy(_._1).map(_._2.head)
    }
    val newFiles = resized.attachStats(resized.listBucketFiles(outDir),
      perBucket.map(s => s._1 -> s._2).toMap)
    resized.commit(Snapshot(
      version = version,
      schemaJson = snap.schemaJson,
      numBuckets = newNumBuckets,
      manifests = Seq(ManifestRef(resized.writeManifest(version, newFiles),
        newFiles.keySet, delta = false)),
      committed = snap.committed,
      bucketRows = perBucket.map(s => s._1 -> s._3).toMap,
      metrics = Map("rebucketedFrom" -> snap.numBuckets.toLong),
      parentVersion = snap.version,
      morDeltas = false))
    resized
  }

  private def compactMicros(spark: SparkSession, table: LakeTable,
      watermarkMicros: Long, targets: Option[Set[Int]] = None,
      textIndex: Boolean = false): Long = {
    // Compaction rewrites EVERY bucket, so a concurrent commit (which by
    // construction touches some bucket or the ledger) always invalidates the
    // attempt — a lost CAS can never rebase, it re-runs against the fresh
    // snapshot. Bounded: under a sustained faster writer, compaction yields
    // (returns -1) rather than livelocking the maintenance thread; the next
    // maintenance trigger retries.
    var attempts = 0
    while (attempts < 4) {
      attempts += 1
      val snap = table.currentSnapshot().getOrElse(return 0L)
      // Same physical-identity guard as the apply paths: a handle opened with a
      // different bucket count would silently REBUCKET the table here (the
      // bucket column derives from the handle, not the snapshot).
      require(snap.numBuckets == table.numBuckets,
        s"table has ${snap.numBuckets} buckets; handle opened with ${table.numBuckets}")
      // Bucket-local compaction: fold + expire inside each bucket's own task —
      // ZERO shuffles; compaction cost is exactly read + write (BucketLocal).
      // With `targets`, read + write only THOSE buckets (the others' tasks
      // open no file).
      val claimed = snap.manifests.flatMap(_.buckets).toSet
      // a target set covering every claimed bucket IS a full compaction —
      // take the list-resetting branch so the manifest list stays bounded
      val sel = targets.map(_.intersect(claimed)).filterNot(_ == claimed)
      if (targets.nonEmpty && sel.exists(_.isEmpty)) return 0L // nothing to fold
      val version = snap.version + 1
      val outDir = table.attemptDir(version, "compact", snap.version)
      // spill policy (manifest metadata only): an oversized bucket compacts
      // through the disk-backed sort instead of OOMing the hash fold —
      // compaction is exactly how the operator SHRINKS such a bucket, so it
      // is the one pass that must survive it
      val spill = table.maxBucketBytes(snap, sel) > table.spillFoldBytes
      // write-side stats: compaction files get key bounds + conv bloom
      // (+ the opt-in token bloom) and their row counts from the SAME task
      // accumulator — no stat-less long-lived files, no driver footer reads
      val statsAcc = spark.sparkContext
        .collectionAccumulator[(Int, graft.table.FileStats, Long, Long)]("compactStats")
      BucketLocal.compactRows(spark, table, snap, watermarkMicros, spill, sel,
          Some(statsAcc), textIndex)
        .write.mode("overwrite").partitionBy("bucket").parquet(outDir.toString)
      val perBucket = {
        import scala.jdk.CollectionConverters._
        statsAcc.value.asScala.groupBy(_._1).map(_._2.head)
      }
      val newFiles = table.attachStats(table.listBucketFiles(outDir),
        perBucket.map(s => s._1 -> s._2).toMap)
      val rows = perBucket.map(s => s._1 -> s._3).toMap
      beforePublish("compact", snap.version)
      try {
        val cand = sel match {
          case None =>
            // Full compaction resets the manifest list to a single full
            // manifest — the bound on manifest-list growth (one delta ref
            // per MOR commit between compactions).
            // A FULL compaction knows the whole table's retained tombstone
            // count exactly (every live file was rewritten through the
            // stats pass) — recorded so metadata-only COUNT(*) pushdown can
            // answer live-row counts without touching a data file. Partial
            // passes can't know the un-rewritten buckets' tombstones, so
            // they don't record it (absent = unknown = no pushdown).
            Snapshot(version, snap.schemaJson, table.numBuckets,
              Seq(ManifestRef(table.writeManifest(version, newFiles),
                newFiles.keySet, delta = false)),
              snap.committed, rows,
              Map("compactedRows" -> rows.values.sum,
                "tombstoneRows" -> perBucket.map(_._4).sum), snap.version,
              morDeltas = false)
          case Some(t) =>
            // Partial: mask the targets out of every prior ref, append one
            // non-delta ref claiming them (a target whose rows all expired
            // simply ends up claimed-with-no-files = empty). Other buckets'
            // files and the ledger are untouched; morDeltas reflects
            // whatever deltas REMAIN on the un-compacted buckets.
            val masked = snap.manifests
              .map(m => m.copy(buckets = m.buckets -- t))
              .filter(_.buckets.nonEmpty)
            Snapshot(version, snap.schemaJson, table.numBuckets,
              masked :+ ManifestRef(table.writeManifest(version, newFiles), t,
                delta = false),
              snap.committed, (snap.bucketRows -- t) ++ rows,
              Map("compactedRows" -> rows.values.sum,
                "compactedBuckets" -> t.size.toLong), snap.version,
              morDeltas = masked.exists(_.delta))
        }
        table.commit(cand)
        return rows.values.sum
      } catch {
        case _: graft.table.CommitConflictException => deleteDir(outDir)
      }
    }
    -1L
  }
}
