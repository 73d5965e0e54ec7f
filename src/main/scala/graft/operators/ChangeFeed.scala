package graft.operators

import graft.model.Model
import graft.table.LakeTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.graftbridge.ScanBridge
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Change Data Feed: the incremental READ side of the CDC engine — what
  * changed between two committed snapshots, as a changelog a downstream
  * consumer can apply (the Iceberg changelog-scan / Delta CDF capability,
  * built from scratch on the manifest-list metadata).
  *
  * The reference pipeline EMITS deltas per converted file (insert `.trig.gz`
  * + `_delete.txt.gz` per source, /root/reference
  * etl-pipeline-modules/.../ConvertToRDFLambda.java:308,321) but its sink
  * (GraphDB) cannot be asked "what changed since release X" — consumers
  * re-scan. Here the table's own metadata answers it:
  *
  *   - the manifest lists of the two snapshots name each bucket's file set;
  *     a bucket whose file list is IDENTICAL in both cannot have changed —
  *     it is skipped without opening a file. Cost is O(changed buckets),
  *     not O(table): at 10^10 rows a feed across a tail window reads only
  *     the buckets the tail touched, twice.
  *   - each changed bucket is diffed IN-TASK: fold both versions' bucket
  *     files to their per-key LWW winners (the same associative rule the
  *     writer uses) and compare. zipPartitions over two bucket-aligned
  *     scans — ZERO exchanges at any table size, same as the merge itself.
  *
  * Emitted schema: the table's columns (minus the internal `op`) plus
  * `change_type` ∈ insert | update | delete. insert/update carry the
  * POST-image (the new winner); delete carries the PRE-image (the row that
  * disappeared — its ts/seq are the deleted version's, matching the
  * reference's delete lists which name the removed record, not the delete
  * event). A key whose winner is identical in both snapshots emits nothing,
  * even inside a rewritten bucket.
  *
  * Caveats (documented contract):
  *   - additive schema evolution between the versions is fine — the old
  *     files are read with the NEW schema (parquet clipping → nulls for
  *     late columns), so pre-images carry null in columns that did not
  *     exist yet.
  *   - a COMPACTION between the versions rewrites every bucket's file list,
  *     so the bucket-skip optimization degrades to a full 2× scan (the diff
  *     itself stays correct — equal winners emit nothing). Consumers should
  *     tail between compactions; the row-level feed is exact either way.
  */
object ChangeFeed {

  val ChangeTypeCol = "change_type"

  /** Changes from `fromVersion` up to the CURRENT snapshot. */
  def changesSince(spark: SparkSession, table: LakeTable, fromVersion: Long,
      withUpdatePreImages: Boolean = false): DataFrame = {
    val cur = table.currentSnapshot().getOrElse(
      throw new IllegalArgumentException("empty table has no change feed")).version
    changesBetween(spark, table, fromVersion, cur, withUpdatePreImages)
  }

  /** `withUpdatePreImages`: additionally emit each update's PRE-image as a
    * `change_type = "update_preimage"` row (Delta CDF's contract) right
    * from the in-task diff, which already holds both winners — no extra
    * read. Pre+post pairs make every SUBTRACTABLE aggregate maintainable
    * incrementally from the feed alone (state' = state − f(pre) + f(post)),
    * the input contract of [[IncrementalAgg.maintain]].
    */
  def changesBetween(spark: SparkSession, table: LakeTable,
      fromVersion: Long, toVersion: Long,
      withUpdatePreImages: Boolean = false): DataFrame = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    def snap(v: Long) = table.snapshotAt(v).getOrElse(
      throw new IllegalArgumentException(s"no snapshot v$v (vacuumed?)"))
    val sFrom = snap(fromVersion)
    val sTo = snap(toVersion)
    require(sFrom.numBuckets == sTo.numBuckets,
      s"bucket layout changed between v$fromVersion and v$toVersion")
    val n = sTo.numBuckets
    // read BOTH sides with the newer schema: additive evolution guarantees
    // it is a superset, and parquet schema clipping fills late columns of
    // old files with nulls — pre- and post-images line up column-for-column
    val schema = sTo.schema
    val filesFrom = table.resolveFiles(sFrom)
    val filesTo = table.resolveFiles(sTo)
    // identical file list ⇒ identical bucket contents ⇒ skip without a
    // read: a COW rewrite REPLACES the list, a MOR append EXTENDS it, so
    // any change to the bucket changes the list
    val changed = (0 until n).filter { b =>
      filesFrom.getOrElse(b, Seq.empty) != filesTo.getOrElse(b, Seq.empty)
    }.toSet
    val (convI, turnI, tsI, seqI) = BucketLocal.keyIdx(schema)
    val opI = schema.fieldIndex("op")
    val fromRdd = ScanBridge.bucketFilesRdd(spark, schema,
      BucketLocal.bucketArray(table, sFrom, Some(changed)))
    val toRdd = ScanBridge.bucketFilesRdd(spark, schema,
      BucketLocal.bucketArray(table, sTo, Some(changed)))
    val diffed = fromRdd.zipPartitions(toRdd, preservesPartitioning = false)(
      diffPartition(convI, turnI, tsI, seqI, opI, withUpdatePreImages))
    val outSchema = StructType(schema.fields :+
      StructField(ChangeTypeCol, StringType, nullable = false))
    ScanBridge.internalDf(spark, diffed, outSchema).drop("op")
  }

  /** In-task diff of one bucket's two folded states. Memory: the two winner
    * maps — bounded by the bucket's contents at each version, the same unit
    * the COW merge and the delta fold already hold (the rewrite unit, sized
    * to the executor via numBuckets).
    *
    * `deleteTombstones`: emit the TOMBSTONE row (the delete's own ts/seq)
    * instead of the pre-image for deletes — the REPLICATION contract: a
    * downstream LWW apply needs the deleting version to beat the replica's
    * live row, which the pre-image (that very row's version) cannot. The
    * tombstone exists whenever the key is present-but-dead at the `to`
    * snapshot (tombstones are retained across merges and
    * compactRetainTombstones); a key VANISHED by an explicit
    * tombstone-expiring compact(watermark) mid-window has no tombstone left
    * and falls back to the pre-image — replication across such a compaction
    * is not exactly-once (same contract as Delta CDF across VACUUM:
    * coordinate retention with consumers, or re-bootstrap).
    *
    * Shared verbatim by the batch feed and the [[graft.streaming
    * .LakeCdfSource]] micro-batch reader (package-private for the latter).
    */
  private[graft] def diffPartition(convI: Int, turnI: Int, tsI: Int, seqI: Int, opI: Int,
      preImages: Boolean, deleteTombstones: Boolean = false)(
      from: Iterator[InternalRow], to: Iterator[InternalRow]): Iterator[InternalRow] = {
    if (!from.hasNext && !to.hasNext) return Iterator.empty // skipped bucket
    val deleteOp = UTF8String.fromString(Model.OpDelete)
    def isDelete(r: InternalRow): Boolean =
      !r.isNullAt(opI) && r.getUTF8String(opI).equals(deleteOp)
    def sameVersion(a: InternalRow, b: InternalRow): Boolean =
      BucketLocal.ver(a, tsI) == BucketLocal.ver(b, tsI) &&
        BucketLocal.ver(a, seqI) == BucketLocal.ver(b, seqI)
    val fromMap = BucketLocal.foldWinnersMap(from, convI, turnI, tsI, seqI)
    val toMap = BucketLocal.foldWinnersMap(to, convI, turnI, tsI, seqI)
    val joined = new JoinedRow
    // a SECOND mutable JoinedRow for the pre-image half of an update pair:
    // emitting two rows from one flatMap element materializes both joins
    // before the consumer copies either, so they cannot share a buffer
    val joinedPre = new JoinedRow
    def tag(t: String) = new GenericInternalRow(Array[Any](UTF8String.fromString(t)))
    val tInsert = tag("insert"); val tUpdate = tag("update"); val tDelete = tag("delete")
    val tUpdatePre = tag("update_preimage")
    import scala.jdk.CollectionConverters._
    val changes = toMap.entrySet().iterator().asScala.flatMap { e =>
      val toRow = e.getValue
      val fromRow = fromMap.remove(e.getKey)
      val fromLive = fromRow != null && !isDelete(fromRow)
      val toLive = !isDelete(toRow)
      if (!fromLive && toLive) Seq(joined(toRow, tInsert): InternalRow)
      else if (fromLive && !toLive)
        // on this branch toRow IS the tombstone (present but dead at `to`)
        Seq(joined(if (deleteTombstones) toRow else fromRow, tDelete): InternalRow)
      else if (fromLive && toLive && !sameVersion(fromRow, toRow)) {
        if (preImages)
          Seq(joinedPre(fromRow, tUpdatePre): InternalRow, joined(toRow, tUpdate): InternalRow)
        else Seq(joined(toRow, tUpdate): InternalRow)
      }
      else Seq.empty // unchanged winner, or tombstone→tombstone (nothing visible)
    }
    // keys present at fromVersion with NO row at toVersion: unreachable via
    // merge alone (tombstones are retained), but a compaction between the
    // versions expires tombstones — a vanished TOMBSTONE is not a visible
    // change, while a vanished live row (defensive) is a delete. The
    // leftover iterator MUST be created only after `changes` is exhausted:
    // `changes` removes matched keys from fromMap as it is consumed, and a
    // HashMap iterator opened before those removals would fail fast.
    changes ++ Iterator.single(()).flatMap { _ =>
      fromMap.values().iterator().asScala
        .filter(r => !isDelete(r))
        .map(r => joined(r, tDelete): InternalRow)
    }
  }
}
