package graft.operators

import graft.model.Model
import graft.table.{LakeTable, Snapshot}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

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
  def compactRows(spark: SparkSession, table: LakeTable, snap: Snapshot,
      watermarkMicros: Long): DataFrame = {
    val schema = snap.schema
    val (convI, turnI, tsI, seqI) = keyIdx(schema)
    val opI = schema.fieldIndex("op")
    val fold = snap.morDeltas
    val compacted = ScanBridge.bucketFilesRdd(spark, schema, bucketArray(table, snap))
      .mapPartitions { rows =>
        val deleteOp = UTF8String.fromString(Model.OpDelete)
        // a null-ts tombstone has UNKNOWN event time — it must never expire
        // (ver() maps null to Long.MinValue for ordering, which would
        // otherwise make it "older than" any watermark)
        def expired(r: InternalRow): Boolean =
          !r.isNullAt(opI) && r.getUTF8String(opI).equals(deleteOp) &&
            !r.isNullAt(tsI) && r.getLong(tsI) < watermarkMicros
        val resolved =
          if (fold) foldWinners(rows, convI, turnI, tsI, seqI) else rows
        // cluster by key: fold-path rows are already safe copies (map
        // values); raw-scan rows reuse the reader's buffer and must be
        // copied to be held for the sort
        val buf = new scala.collection.mutable.ArrayBuffer[InternalRow]
        resolved.filter(r => !expired(r))
          .foreach(r => buf += (if (fold) r else r.copy()))
        val arr = buf.toArray
        java.util.Arrays.sort(arr, new java.util.Comparator[InternalRow] {
          override def compare(a: InternalRow, b: InternalRow): Int = {
            val c = a.getUTF8String(convI).compareTo(b.getUTF8String(convI))
            if (c != 0) c else Integer.compare(a.getInt(turnI), b.getInt(turnI))
          }
        })
        val bucketRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.TaskContext.getPartitionId()))
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        arr.iterator.map(r => joined(r, bucketRow): InternalRow)
      }
    val outSchema = StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false))
    ScanBridge.internalDf(spark, compacted, outSchema)
  }
}
