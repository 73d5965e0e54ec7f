package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.streaming.CdcStream
import graft.table.LakeTable

import java.sql.Timestamp

/** The north-star path END TO END in one test: cold-start bulk load, a COW
  * streaming tail, a MOR streaming tail with auto-compaction, a crash/resume
  * mid-tail, final compaction, and a zero-grace vacuum — the composed
  * lifecycle a production table actually lives, pinned against the
  * independent in-memory oracle fold. The pieces are each covered by their
  * own suites; this pins their COMPOSITION (mode switches, ledger handoffs
  * between writers, maintenance between phases).
  */
class LifecycleSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  test("full lifecycle: cold start → COW tail → MOR tail + auto-compaction → resume → compact → vacuum ≡ oracle") {
    val all = Generator.events(spark, 9000, numConvs = 40, turnsPerConv = 8, seed = 207)
      .as[ChangeEvent].collect().toSeq
    val oracle = Generator.oracleFold(all).map { case (k, e) => k -> ((e.text, e.seq)) }
    val phases = all.sortBy(_.seq).grouped(3000).toSeq // arrival-ordered thirds

    def writeChunks(dir: String, evs: Seq[ChangeEvent], chunks: Int,
        offset: Int = 0): Unit =
      evs.grouped(math.max(1, (evs.size + chunks - 1) / chunks)).zipWithIndex
        .foreach { case (c, i) =>
          writeFlatParquet(spark.createDataset(c).toDF(), dir,
            f"chunk-${offset + i}%03d.parquet")
        }

    // phase 1: cold-start bulk load (a distinct writer id — the ledger is
    // per-writer, so the streaming tail's batch 0 must still apply after it)
    val table = new LakeTable(tmpDir("life-table"), numBuckets = 8)
    MergeApplier.replayFull(spark, table,
      spark.createDataset(phases(0)).toDF(), writerId = "bulk")
    assert(table.currentSnapshot().get.version == 1)

    // phase 2: COW streaming tail over arrival-ordered files
    val cowSrc = tmpDir("life-cow-src")
    writeChunks(cowSrc, phases(1), chunks = 4)
    CdcStream.runAvailableNow(spark, cowSrc, table, tmpDir("life-cow-ckpt"),
      maxFilesPerTrigger = 2, mode = "cow")

    // phase 3: switch to the MOR tail with auto-compaction, and "crash"
    // after the first half — resume from the same checkpoint must continue
    // without duplicates or gaps
    def state(): Map[(String, Int), (String, Long)] =
      table.read(spark).collect()
        .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
          ((r.getAs[String]("text"), r.getAs[Long]("seq")))).toMap
    val oracleP12 = Generator.oracleFold(phases(0) ++ phases(1))
      .map { case (k, e) => k -> ((e.text, e.seq)) }
    assert(state() == oracleP12, "after COW phase")

    val morSrc = tmpDir("life-mor-src")
    val morCkpt = tmpDir("life-mor-ckpt")
    // A FRESH checkpoint restarts batchIds at 0, so it needs a FRESH writer
    // id — reusing the COW run's id would make the ledger (correctly!)
    // swallow the first batches as replays of that writer's committed ids.
    // One pipeline identity = (writerId, checkpoint); resume keeps both.
    writeChunks(morSrc, phases(2).take(1500), chunks = 3)
    CdcStream.runAvailableNow(spark, morSrc, table, morCkpt, writerId = "mor",
      maxFilesPerTrigger = 1, mode = "mor", autoCompactEvery = 2)
    val oracleP12h = Generator.oracleFold(phases(0) ++ phases(1) ++ phases(2).take(1500))
      .map { case (k, e) => k -> ((e.text, e.seq)) }
    assert(state() == oracleP12h, "after first MOR run")
    writeChunks(morSrc, phases(2).drop(1500), chunks = 3, offset = 3)
    CdcStream.runAvailableNow(spark, morSrc, table, morCkpt, writerId = "mor",
      maxFilesPerTrigger = 1, mode = "mor", autoCompactEvery = 2)
    assert(state() == oracle, "after resumed MOR run")

    // maintenance: fold remaining deltas + expire tombstones, then a
    // zero-grace vacuum (no live writer); table must stay oracle-equal,
    // time-travel history collapses to the compacted snapshot
    MergeApplier.compact(spark, table, Timestamp.valueOf("2030-01-01 00:00:00"))
    assert(!table.currentSnapshot().get.morDeltas)
    val deleted = table.vacuum(keepLast = 1, graceMs = 0)
    assert(deleted > 0)
    assert(table.versions().size == 1)
    assert(state() == oracle)
    assert(table.currentSnapshot().get.totalRows == oracle.size) // no tombstones

    // the table survives maintenance as a live table: one more commit lands
    val extra = ChangeEvent("life-extra", 0, "user", "post-vacuum", None,
      Timestamp.valueOf("2031-01-01 00:00:00"), Model.OpInsert,
      all.map(_.seq).max + 1)
    MergeApplier.applyBatch(spark, table,
      spark.createDataset(Seq(extra)).toDF(), "bulk", 1L)
    assert(state() == oracle + ((("life-extra", 0)) -> (("post-vacuum", extra.seq))))
  }
}
