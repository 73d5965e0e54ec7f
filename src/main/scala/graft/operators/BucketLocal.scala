package graft.operators

import graft.model.Model
import graft.table.{ConvBloom, FileStats, LakeTable, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.CollectionAccumulator

/** Bucket-local (zero-shuffle) table passes. The table's bucket layout means
  * every per-key operation — LWW fold, tombstone expiry, rewrite — is fully
  * decided inside one bucket, so reads and maintenance can run as one
  * narrow-dependency pass: bucket-aligned scan (partition i = bucket i's
  * files) → in-task fold → emit. No exchange at any table size; the unit of
  * parallelism is the bucket, which is exactly how the table scales.
  *
  * The fold applies the same associative (ts, seq)-max rule as
  * [[Lww.latestByKeyAgg]] (winner per (conv_id, turn_idx); nulls lowest;
  * ties keep the incumbent — unreachable, seq is unique).
  */
object BucketLocal {

  private[operators] def ver(r: InternalRow, i: Int): Long =
    if (r.isNullAt(i)) Long.MinValue else r.getLong(i)

  private[operators] def wins(r: InternalRow, cur: InternalRow, tsI: Int, seqI: Int): Boolean = {
    val a = ver(r, tsI); val c = ver(cur, tsI)
    a > c || (a == c && ver(r, seqI) > ver(cur, seqI))
  }

  /** Fold an iterator to its per-key winner MAP. Rows are copied only when
    * stored (the scan reuses row buffers); losers are never copied. Exposed
    * (package-private) so the change feed can DIFF two folded states in-task.
    */
  private[operators] def foldWinnersMap(rows: Iterator[InternalRow],
      convI: Int, turnI: Int, tsI: Int, seqI: Int)
      : java.util.HashMap[(UTF8String, Int), InternalRow] = {
    val winners = new java.util.HashMap[(UTF8String, Int), InternalRow]()
    while (rows.hasNext) {
      val r = rows.next()
      val cur = winners.get((r.getUTF8String(convI), r.getInt(turnI)))
      if (cur == null || wins(r, cur, tsI, seqI)) {
        val c = r.copy()
        winners.put((c.getUTF8String(convI), c.getInt(turnI)), c)
      }
    }
    winners
  }

  private[graft] def foldWinners(rows: Iterator[InternalRow],
      convI: Int, turnI: Int, tsI: Int, seqI: Int): Iterator[InternalRow] = {
    import scala.jdk.CollectionConverters._
    foldWinnersMap(rows, convI, turnI, tsI, seqI).values().iterator().asScala
  }

  /** Streaming last-per-key fold over rows already SORTED by
    * (conv_id, turn_idx, ts ASC NULLS FIRST, seq ASC NULLS FIRST): within a
    * key group ascending (ts, seq) order makes the LAST row the LWW winner
    * (nulls-first == `ver()`'s nulls-lowest), so the fold holds ONE row at a
    * time — O(1) memory regardless of bucket size. This is the spill-safe
    * twin of [[foldWinnersMap]]: the upstream sort is Spark's SortExec,
    * which spills to disk, so a bucket that outgrew its executor degrades
    * to disk-backed sorting instead of OOMing the hash fold.
    *
    * Semantics caveat (shared with every LWW path): a full (ts, seq) tie is
    * resolved arbitrarily here (sort order among equal keys is unstable)
    * where the hash fold keeps the first-scanned — unreachable in practice
    * because seq is unique per changelog.
    */
  private[graft] def foldWinnersSorted(rows: Iterator[InternalRow],
      convI: Int, turnI: Int): Iterator[InternalRow] = new Iterator[InternalRow] {
    // `pending` is a COPY (sorted-scan rows reuse buffers): the winner-so-far
    // (= last row seen) of the current key group
    private var pending: InternalRow = null
    private var out: InternalRow = null
    private var done = false
    private def advance(): Unit = {
      while (out == null && !done) {
        if (!rows.hasNext) { done = true; out = pending; pending = null }
        else {
          val r = rows.next()
          if (pending != null &&
              pending.getUTF8String(convI).equals(r.getUTF8String(convI)) &&
              pending.getInt(turnI) == r.getInt(turnI)) {
            pending = r.copy() // same key, later in (ts, seq) order: r wins
          } else {
            out = pending // may be null on the very first row
            pending = r.copy()
          }
        }
      }
    }
    override def hasNext: Boolean = { advance(); out != null }
    override def next(): InternalRow = {
      advance(); val o = out; out = null
      if (o == null) throw new NoSuchElementException("empty fold")
      o
    }
  }

  /** Partition-local (conv_id, turn_idx, ts, seq) sort — the spill-safe
    * fold's upstream. sortWithinPartitions is a NARROW dependency: partition
    * count and the partition-i == bucket-i alignment are preserved, and
    * SortExec's UnsafeExternalSorter spills to disk under memory pressure.
    * ASC NULLS FIRST on ts/seq mirrors `ver()`'s null → Long.MinValue
    * ordering (nulls lowest).
    */
  private def sortedByKeyVersion(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.sortWithinPartitions(col("conv_id").asc, col("turn_idx").asc,
      col("ts").asc_nulls_first, col("seq").asc_nulls_first)
  }

  private[graft] def keyIdx(schema: StructType): (Int, Int, Int, Int) =
    (schema.fieldIndex("conv_id"), schema.fieldIndex("turn_idx"),
      schema.fieldIndex("ts"), schema.fieldIndex("seq"))

  private[operators] def bucketArray(table: LakeTable, snap: Snapshot,
      buckets: Option[Set[Int]] = None): Array[Array[(String, Long)]] = {
    // sized from the SNAPSHOT, not the handle: the snapshot's manifest is
    // the authority on the bucket layout (a stale handle after a rebucket
    // would otherwise under-allocate and overflow on the new bucket ids)
    val files = Array.fill(snap.numBuckets)(Array.empty[(String, Long)])
    table.resolveFiles(snap, buckets).foreach { case (b, fs) =>
      files(b) = fs.map(f => (f.path, f.bytes)).toArray
    }
    files
  }

  /** Read the table with the MOR delta fold done bucket-locally — ZERO
    * exchanges at any number of un-compacted deltas (the repartition+agg
    * formulation costs one). Used by LakeTable.read when the snapshot
    * carries deltas; column pruning is moot there because the fold's winner
    * semantics need whole rows anyway.
    */
  def readFolded(spark: SparkSession, table: LakeTable, snap: Snapshot,
      buckets: Option[Set[Int]] = None): DataFrame = {
    val schema = snap.schema
    val (convI, turnI, tsI, seqI) = keyIdx(schema)
    val folded = ScanBridge.bucketFilesRdd(spark, schema, bucketArray(table, snap, buckets))
      .mapPartitions(rows => foldWinners(rows, convI, turnI, tsI, seqI))
    ScanBridge.internalDf(spark, folded, schema)
  }

  /** Spill-safe twin of [[readFolded]]: bucket-aligned scan →
    * partition-local SORT (SortExec, spills to disk) → streaming
    * last-per-key fold (O(1) task memory). Still ZERO exchanges — the sort
    * is narrow, so partition i remains bucket i. Slower than the hash fold
    * on healthy buckets (copies every row once, pays the sort), which is
    * why [[graft.table.LakeTable.read]] picks it only when a bucket's
    * manifest byte size exceeds the handle's `spillFoldBytes` policy — the
    * graceful-degradation path for a bucket that outgrew its executor,
    * keeping the table readable (and compactable / rebucketable) so the
    * operator can restore the sizing invariant with `rebucket`.
    */
  def readFoldedSpill(spark: SparkSession, table: LakeTable, snap: Snapshot,
      buckets: Option[Set[Int]] = None): DataFrame = {
    val schema = snap.schema
    val (convI, turnI, _, _) = keyIdx(schema)
    val raw = ScanBridge.internalDf(spark,
      ScanBridge.bucketFilesRdd(spark, schema, bucketArray(table, snap, buckets)), schema)
    val folded = ScanBridge.toInternalRdd(sortedByKeyVersion(raw))
      .mapPartitions(rows => foldWinnersSorted(rows, convI, turnI))
    ScanBridge.internalDf(spark, folded, schema)
  }

  /** Policy switch for every delta-carrying read: the hash fold while each
    * requested bucket fits the executor-sized contract (fast path), the
    * sort-spill fold once any exceeds `table.spillFoldBytes`. The decision
    * reads only manifest metadata (file sizes travel in the manifest).
    */
  def readFoldedAuto(spark: SparkSession, table: LakeTable, snap: Snapshot,
      buckets: Option[Set[Int]] = None): DataFrame =
    if (table.maxBucketBytes(snap, buckets) > table.spillFoldBytes) {
      lastFoldWasSpill = true
      readFoldedSpill(spark, table, snap, buckets)
    } else {
      lastFoldWasSpill = false
      readFolded(spark, table, snap, buckets)
    }

  /** Test observability only: which branch the last [[readFoldedAuto]] call
    * took (the sort is inside the bridged inner plan, invisible to the outer
    * DataFrame's executedPlan).
    */
  @volatile private[graft] var lastFoldWasSpill: Boolean = false

  /** Bucket-local fold over an EXPLICIT per-bucket file subset — the read
    * behind the key-addressed lookups after file skipping (a pruned file's
    * key bounds exclude the looked-up key, so the fold of every key the
    * caller then filters FOR is unchanged). Same zero-exchange shape as
    * [[readFolded]]; `spill` selects the sort-spill fold for oversized
    * buckets.
    */
  def readFoldedFiles(spark: SparkSession, schema: StructType, numBuckets: Int,
      files: Map[Int, Seq[graft.table.FileEntry]], spill: Boolean = false): DataFrame = {
    val arr = Array.fill(numBuckets)(Array.empty[(String, Long)])
    files.foreach { case (b, fs) => arr(b) = fs.map(f => (f.path, f.bytes)).toArray }
    val (convI, turnI, tsI, seqI) = keyIdx(schema)
    if (spill) {
      val raw = ScanBridge.internalDf(spark,
        ScanBridge.bucketFilesRdd(spark, schema, arr), schema)
      val folded = ScanBridge.toInternalRdd(sortedByKeyVersion(raw))
        .mapPartitions(rows => foldWinnersSorted(rows, convI, turnI))
      ScanBridge.internalDf(spark, folded, schema)
    } else {
      val folded = ScanBridge.bucketFilesRdd(spark, schema, arr)
        .mapPartitions(rows => foldWinners(rows, convI, turnI, tsI, seqI))
      ScanBridge.internalDf(spark, folded, schema)
    }
  }

  /** One bucket-local compaction pass: fold deltas (when present), drop
    * tombstones older than the watermark, CLUSTER the bucket's rows by
    * (conv_id, turn_idx), tag rows with the bucket id (= partition id, the
    * alignment invariant). ZERO shuffles — compaction cost is exactly
    * read + sort-in-task + write, the property that keeps maintenance
    * feasible at 10^10 rows.
    *
    * Clustering: the rewritten parquet gets tight per-row-group min/max
    * statistics on the key columns (a conversation's turns are contiguous),
    * so any analytical scan with a conv_id/turn_idx predicate — including
    * [[graft.table.LakeTable.lookupTurn]]'s pushed filter — skips row
    * groups instead of scanning the bucket, and runs of one conversation
    * compress better. Memory: the in-task sort materializes one bucket —
    * the SAME bound the delta fold and the COW merge already have (a bucket
    * is the rewrite unit, sized to the executor via numBuckets).
    */
  /** Per-partition (= per-bucket) write-side stats for compaction output:
    * key bounds + conv bloom (+ opt-in token bloom over whitespace-split
    * `text`) + row count, reported through a CollectionAccumulator exactly
    * like the COW merge's TaskWriteStats. Compaction rewrites are the
    * LONG-LIVED majority of a mature table's files; without this they were
    * stat-less (never skippable) and their row counts cost driver footer
    * reads per maintenance pass.
    */
  private final class CompactStats(convI: Int, turnI: Int, textI: Int,
      textIndex: Boolean, opI: Int, tsI: Int) {
    private var n = 0L
    private var nTomb = 0L
    private var minConv: UTF8String = null
    private var maxConv: UTF8String = null
    private var minTurn = Int.MaxValue
    private var maxTurn = Int.MinValue
    private var minTs = Long.MaxValue
    private var maxTs = Long.MinValue
    private val convBloom = ConvBloom.empty()
    private val tokBloom = if (textIndex) ConvBloom.empty() else null
    private var reported = false

    def observe(r: InternalRow): Unit = {
      n += 1
      if (!r.isNullAt(opI) &&
        r.getUTF8String(opI).toString == Model.OpDelete) nTomb += 1
      val c = r.getUTF8String(convI)
      // clone on update only (rare after the first rows): the scan reuses
      // its row buffer, so held extrema must own their bytes
      if (minConv == null || c.compareTo(minConv) < 0) minConv = c.clone()
      if (maxConv == null || c.compareTo(maxConv) > 0) maxConv = c.clone()
      val t = r.getInt(turnI)
      if (t < minTurn) minTurn = t
      if (t > maxTurn) maxTurn = t
      if (!r.isNullAt(tsI)) {
        val ts = r.getLong(tsI)
        if (ts < minTs) minTs = ts
        if (ts > maxTs) maxTs = ts
      }
      ConvBloom.add(convBloom, c)
      if (textIndex && !r.isNullAt(textI)) {
        val toks = r.getUTF8String(textI).toString.split("\\s+")
        var i = 0
        while (i < toks.length) {
          if (toks(i).nonEmpty) ConvBloom.add(tokBloom, UTF8String.fromString(toks(i)))
          i += 1
        }
      }
    }

    def report(acc: CollectionAccumulator[(Int, FileStats, Long, Long)]): Unit =
      if (n > 0 && !reported) {
        reported = true
        acc.add((org.apache.spark.TaskContext.getPartitionId(),
          FileStats(minConv.toString, maxConv.toString, minTurn, maxTurn,
            ConvBloom.seal(convBloom),
            if (textIndex) ConvBloom.seal(tokBloom) else None,
            if (minTs == Long.MaxValue) None else Some(minTs),
            if (maxTs == Long.MinValue) None else Some(maxTs)), n, nTomb))
      }
  }

  private def keyComparator(convI: Int, turnI: Int): java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] {
      override def compare(a: InternalRow, b: InternalRow): Int = {
        val c = a.getUTF8String(convI).compareTo(b.getUTF8String(convI))
        if (c != 0) c else Integer.compare(a.getInt(turnI), b.getInt(turnI))
      }
    }

  /** The shared in-task tail of every clustered rewrite (compaction's hash
    * path, rebucket, SQL overwrite): buffer the partition, CLUSTER by
    * (conv_id, turn_idx), observe write-side [[CompactStats]], tag rows with
    * the bucket id (= partition id). `copyRows = false` only when the input
    * rows are already safe copies (e.g. a hash fold's map values).
    */
  private def clusterStatsTag(rows: Iterator[InternalRow], copyRows: Boolean,
      convI: Int, turnI: Int, tsI: Int, opI: Int, textI: Int, textIndex: Boolean,
      statsAcc: Option[CollectionAccumulator[(Int, FileStats, Long, Long)]])
      : Iterator[InternalRow] = {
    val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
    rows.foreach(r => buf += (if (copyRows) r.copy() else r))
    val arr = buf.toArray
    java.util.Arrays.sort(arr, keyComparator(convI, turnI))
    statsAcc.foreach { acc =>
      val st = new CompactStats(convI, turnI, textI, textIndex, opI, tsI)
      arr.foreach(st.observe)
      st.report(acc)
    }
    val bucketRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.TaskContext.getPartitionId()))
    val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
    arr.iterator.map(r => joined(r, bucketRow): InternalRow)
  }

  /** Rebucket write support: `state` arrives already repartitioned by the
    * NEW bucket function, so partition id == new bucket id (the same
    * alignment every apply path uses). Each partition is clustered by key
    * in-task (the layout compaction emits), observed through the SAME
    * write-side stats accumulator as the COW/MOR/compaction writes — so
    * rebucket needs no driver footer reads AND its long-lived files carry
    * [[graft.table.FileStats]] (they previously had none and were never
    * skippable) — and tagged with the bucket column from the partition id.
    */
  def clusterTagAndTrack(spark: SparkSession, state: DataFrame, schema: StructType,
      statsAcc: CollectionAccumulator[(Int, FileStats, Long, Long)]): DataFrame = {
    val (convI, turnI, tsI, _) = keyIdx(schema)
    val opI = schema.fieldIndex("op")
    val tagged = ScanBridge.toInternalRdd(state).mapPartitions { rows =>
      // rows reuse upstream buffers → copy
      clusterStatsTag(rows, copyRows = true, convI, turnI, tsI, opI,
        textI = -1, textIndex = false, Some(statsAcc))
    }
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    ScanBridge.internalDf(spark, tagged, outSchema)
  }

  def compactRows(spark: SparkSession, table: LakeTable, snap: Snapshot,
      watermarkMicros: Long, spill: Boolean = false,
      buckets: Option[Set[Int]] = None,
      statsAcc: Option[CollectionAccumulator[(Int, FileStats, Long, Long)]] = None,
      textIndex: Boolean = false): DataFrame = {
    val schema = snap.schema
    val (convI, turnI, tsI, seqI) = keyIdx(schema)
    val opI = schema.fieldIndex("op")
    val textI = if (textIndex) schema.fieldIndex("text") else -1
    val fold = snap.morDeltas
    val deleteOp = UTF8String.fromString(Model.OpDelete)
    // a null-ts tombstone has UNKNOWN event time — it must never expire
    // (ver() maps null to Long.MinValue for ordering, which would
    // otherwise make it "older than" any watermark)
    def expired(r: InternalRow): Boolean =
      !r.isNullAt(opI) && r.getUTF8String(opI).equals(deleteOp) &&
        !r.isNullAt(tsI) && r.getLong(tsI) < watermarkMicros
    def tag(rows: Iterator[InternalRow]): Iterator[InternalRow] = {
      val bucketRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](org.apache.spark.TaskContext.getPartitionId()))
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      rows.map(r => joined(r, bucketRow): InternalRow)
    }
    // streaming stats wrapper (spill path): observe each emitted row, report
    // once on exhaustion — the parquet writer always drains its iterator
    def tracked(rows: Iterator[InternalRow]): Iterator[InternalRow] =
      statsAcc match {
        case None => rows
        case Some(acc) =>
          val st = new CompactStats(convI, turnI, textI, textIndex, opI, tsI)
          new Iterator[InternalRow] {
            override def hasNext: Boolean = {
              val h = rows.hasNext
              if (!h) st.report(acc)
              h
            }
            override def next(): InternalRow = { val r = rows.next(); st.observe(r); r }
          }
      }
    val compacted = if (spill) {
      // Spill-safe compaction — THE maintenance pass that must survive an
      // oversized bucket (it is how the operator shrinks one): partition-
      // local SortExec (spills) already clusters by key, so the streaming
      // fold + expiry filter hold O(1) rows per task. Zero shuffles, same
      // key-clustered output contract as the hash path.
      val raw = ScanBridge.internalDf(spark,
        ScanBridge.bucketFilesRdd(spark, schema, bucketArray(table, snap, buckets)), schema)
      ScanBridge.toInternalRdd(sortedByKeyVersion(raw)).mapPartitions { rows =>
        // un-folded rows come off the sorter's buffers too — foldWinnersSorted
        // copies its survivors; the raw (COW, key-unique) branch streams the
        // sorted iterator straight into the write, which consumes each row
        // before pulling the next, so no copy is needed there
        val resolved =
          if (fold) foldWinnersSorted(rows, convI, turnI) else rows
        tag(tracked(resolved.filter(r => !expired(r))))
      }
    } else ScanBridge.bucketFilesRdd(spark, schema, bucketArray(table, snap, buckets))
      .mapPartitions { rows =>
        val resolved =
          if (fold) foldWinners(rows, convI, turnI, tsI, seqI) else rows
        // fold-path rows are already safe copies (map values); raw-scan rows
        // reuse the reader's buffer and must be copied to be held for the sort
        clusterStatsTag(resolved.filter(r => !expired(r)), copyRows = !fold,
          convI, turnI, tsI, opI, textI, textIndex, statsAcc)
      }
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    ScanBridge.internalDf(spark, compacted, outSchema)
  }
}
