package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.streaming.Replicate
import graft.table.LakeTable
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp
import scala.collection.mutable.ArrayBuffer

/** The DSv2 streaming change-feed source (`format("lake-cdf")`) and the
  * table→table replication built on it.
  */
class LakeCdfSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(conv: String, turn: Int, text: String, t: String, op: String,
      seq: Long): ChangeEvent =
    ChangeEvent(conv, turn, "user", text, None, ts(t), op, seq)

  private def apply(table: LakeTable, batch: Seq[ChangeEvent], id: Long): Long = {
    MergeApplier.applyBatch(spark, table, spark.createDataset(batch).toDF(), "w", id)
    table.currentSnapshot().get.version
  }

  /** Drain the feed AvailableNow through foreachBatch, collecting rows and
    * counting non-empty micro-batches.
    */
  private def drain(root: String, checkpoint: String,
      options: Map[String, String] = Map.empty): (Seq[Row], Int) = {
    val out = ArrayBuffer.empty[Row]
    var batches = 0
    val reader = spark.readStream.format("lake-cdf").option("path", root)
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        out.synchronized { out ++= rows; if (rows.nonEmpty) batches += 1 }
        ()
      }
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    (out.toSeq, batches)
  }

  private def key(r: Row) = (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"))

  test("bootstrap emits current state as inserts; resumed tail emits only changes") {
    val root = tmpDir("cdf-src")
    val table = new LakeTable(root, numBuckets = 4)
    apply(table, Seq(
      ev("cA", 0, "a0", "2025-01-01 00:00:00", "insert", 1),
      ev("cA", 1, "a1", "2025-01-01 00:00:01", "insert", 2),
      ev("cB", 0, "b0", "2025-01-01 00:00:02", "insert", 3)), 0L)

    val ckpt = tmpDir("cdf-ckpt")
    val (boot, _) = drain(root, ckpt)
    assert(boot.size == 3 && boot.forall(_.getAs[String]("change_type") == "insert"))
    assert(!boot.head.schema.fieldNames.contains("op")) // internal column hidden

    // same checkpoint, no new commits → empty run
    assert(drain(root, ckpt)._1.isEmpty)

    apply(table, Seq(
      ev("cA", 1, "a1'", "2025-01-01 00:01:00", "update", 4),
      ev("cB", 0, null, "2025-01-01 00:01:01", "delete", 5)), 1L)
    val (inc, _) = drain(root, ckpt)
    val byKey = inc.map(r => key(r) -> r).toMap
    assert(inc.size == 2)
    assert(byKey(("cA", 1)).getAs[String]("change_type") == "update" &&
      byKey(("cA", 1)).getAs[String]("text") == "a1'")
    // delete carries the TOMBSTONE's version (replication contract), so its
    // ts/seq are the delete event's and its text is the tombstone's null
    val del = byKey(("cB", 0))
    assert(del.getAs[String]("change_type") == "delete" &&
      del.getAs[Long]("seq") == 5L &&
      del.getAs[Timestamp]("ts") == ts("2025-01-01 00:01:01") &&
      del.getAs[String]("text") == null)
  }

  test("maxVersionsPerTrigger=1 paces one commit per micro-batch; startingVersion=latest skips history") {
    val root = tmpDir("cdf-pace")
    val table = new LakeTable(root, numBuckets = 2)
    apply(table, Seq(ev("c", 0, "v0", "2025-01-01 00:00:00", "insert", 1)), 0L)
    apply(table, Seq(ev("c", 1, "v1", "2025-01-01 00:00:01", "insert", 2)), 1L)
    apply(table, Seq(ev("c", 0, "v0'", "2025-01-01 00:00:02", "update", 3)), 2L)

    // bootstrap (−1→0) + two single-version windows = 3 non-empty batches
    val (rows, batches) = drain(root, tmpDir("cdf-pace-ck"),
      Map("maxVersionsPerTrigger" -> "1"))
    assert(batches == 3, s"expected 3 paced batches, got $batches")
    assert(rows.size == 3) // 1 insert + 1 insert + 1 update

    // latest: nothing until a commit happens after stream start
    val ckLatest = tmpDir("cdf-latest-ck")
    assert(drain(root, ckLatest, Map("startingVersion" -> "latest"))._1.isEmpty)
    apply(table, Seq(ev("c", 2, "v2", "2025-01-01 00:00:03", "insert", 4)), 3L)
    val (tail, _) = drain(root, ckLatest, Map("startingVersion" -> "latest"))
    assert(tail.map(r => (key(r), r.getAs[String]("change_type"))) == Seq((("c", 2), "insert")))
  }

  test("batch read surface: spark.read.format(lake-cdf) between explicit versions") {
    val root = tmpDir("cdf-batch")
    val table = new LakeTable(root, numBuckets = 2)
    val v1 = apply(table, Seq(ev("c", 0, "x", "2025-01-01 00:00:00", "insert", 1)), 0L)
    val v2 = apply(table, Seq(ev("c", 0, null, "2025-01-01 00:00:01", "delete", 2)), 1L)
    val full = spark.read.format("lake-cdf").option("path", root).load().collect()
    // full window (empty baseline → current): key is dead at the end → nothing
    assert(full.isEmpty)
    val win = spark.read.format("lake-cdf").option("path", root)
      .option("fromVersion", v1).option("toVersion", v2).load().collect()
    assert(win.map(_.getAs[String]("change_type")).toSeq == Seq("delete"))
  }

  test("table-to-table replication converges exactly under random ops, deletes, compaction, resume") {
    val rootA = tmpDir("cdf-repl-a")
    val a = new LakeTable(rootA, numBuckets = 8)
    val b = new LakeTable(tmpDir("cdf-repl-b"), numBuckets = 8)

    val all = Generator.events(spark, 3000, numConvs = 15, turnsPerConv = 5, seed = 77)
      .as[ChangeEvent].collect().toSeq
    val chunks = all.grouped(600).toSeq
    chunks.take(3).zipWithIndex.foreach { case (c, i) => apply(a, c, i.toLong) }

    val ckpt = tmpDir("cdf-repl-ck")
    Replicate.runAvailableNow(spark, rootA, b, ckpt, maxVersionsPerTrigger = 2)
    def state(t: LakeTable): Seq[Seq[Any]] =
      t.read(spark).collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(state(b) == state(a) && state(a).nonEmpty)

    // a compaction between feed windows (full-rescan diff path) + more ops
    MergeApplier.compactRetainTombstones(spark, a)
    chunks.drop(3).zipWithIndex.foreach { case (c, i) => apply(a, c, 3L + i) }
    Replicate.runAvailableNow(spark, rootA, b, ckpt, maxVersionsPerTrigger = 2)
    assert(state(b) == state(a))

    // replication is idempotent: re-run with nothing new changes nothing
    val v = b.currentSnapshot().get.version
    Replicate.runAvailableNow(spark, rootA, b, ckpt)
    assert(b.currentSnapshot().get.version == v)
  }

  test("additive schema evolution mid-stream: pinned schema keeps reading; restart surfaces the column") {
    val root = tmpDir("cdf-evolve")
    val table = new LakeTable(root, numBuckets = 2)
    // v1 written WITHOUT tool (schema v1)
    MergeApplier.applyBatch(spark, table,
      spark.createDataset(Seq(ev("c", 0, "old", "2025-01-01 00:00:00", "insert", 1)))
        .toDF().drop("tool"), "w", 0L)
    val ckpt = tmpDir("cdf-evolve-ck")
    val (boot, _) = drain(root, ckpt)
    assert(!boot.head.schema.fieldNames.contains("tool")) // pinned pre-evolution schema

    // additive evolution: a later batch carries `tool`
    apply(table, Seq(ev("c", 1, "new", "2025-01-01 00:01:00", "insert", 2)
      .copy(tool = Some("search"))), 1L)
    // resumed stream still uses the CHECKPOINT's pinned schema? No — the
    // scan re-infers at (re)start; what must hold is the Delta-CDF contract:
    // the run reads the evolved table fine and surfaces the new column,
    // with pre-evolution rows carrying null
    val (inc, _) = drain(root, ckpt)
    assert(inc.size == 1 && inc.head.getAs[String]("tool") == "search")
    val (reboot, _) = drain(root, tmpDir("cdf-evolve-ck2")) // fresh bootstrap
    val byKey = reboot.map(r => key(r) -> r.getAs[String]("tool")).toMap
    assert(byKey(("c", 0)) == null && byKey(("c", 1)) == "search")
  }

  test("update pre-images flow through the stream when asked") {
    val root = tmpDir("cdf-pre")
    val table = new LakeTable(root, numBuckets = 2)
    apply(table, Seq(ev("c", 0, "v1", "2025-01-01 00:00:00", "insert", 1)), 0L)
    val ckpt = tmpDir("cdf-pre-ck")
    drain(root, ckpt, Map("updatePreImages" -> "true"))
    apply(table, Seq(ev("c", 0, "v2", "2025-01-01 00:01:00", "update", 2)), 1L)
    val (inc, _) = drain(root, ckpt, Map("updatePreImages" -> "true"))
    val byType = inc.map(r => r.getAs[String]("change_type") -> r.getAs[String]("text")).toMap
    assert(byType == Map("update_preimage" -> "v1", "update" -> "v2"))
  }

  test("a MID-RUN type widening fails the stream loudly; a restart adopts the wide schema") {
    val root = tmpDir("cdf-widen")
    val table = new LakeTable(root, numBuckets = 2)
    MergeApplier.applyBatch(spark, table,
      spark.createDataset(Seq(ev("c", 0, "x", "2025-01-01 00:00:00", "insert", 1)))
        .toDF().withColumn("score",
          org.apache.spark.sql.functions.lit(1).cast("int")), "w", 0L)
    val ckpt = tmpDir("cdf-widen-ck")
    // a LIVE stream (its read schema pinned at score:int) must not silently
    // misread the wider files a mid-run widening commits — the next trigger's
    // planning detects the retype and kills the query with a restart hint
    val q = spark.readStream.format("lake-cdf").option("path", root).load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(100))
      .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      .start()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    try {
      val t0 = System.currentTimeMillis()
      while (q.recentProgress.isEmpty) {
        assert(System.currentTimeMillis() - t0 < 60000, "bootstrap never triggered")
        Thread.sleep(50)
      }
      MergeApplier.applyBatch(spark, table,
        spark.createDataset(Seq(ev("c", 1, "y", "2025-01-01 00:01:00", "insert", 2)))
          .toDF().withColumn("score",
            org.apache.spark.sql.functions.lit(6000000000L)), "w", 1L)
      val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        assert(q.awaitTermination(60000), "stream neither failed nor stopped")
      }
      assert(msgs(e).exists(_.contains("retyped")))
    } finally if (q.isActive) q.stop()
    // a RESTART re-pins the widened schema: the checkpointed offset window
    // replays over old int32 files promoted to long — and so does a fresh
    // bootstrap
    val (inc, _) = drain(root, ckpt)
    assert(inc.map(r => key(r) -> r.getAs[Long]("score")).toMap == Map(("c", 1) -> 6000000000L))
    val (reboot, _) = drain(root, tmpDir("cdf-widen-ck2"))
    val scores = reboot.map(r => key(r) -> r.getAs[Long]("score")).toMap
    assert(scores == Map(("c", 0) -> 1L, ("c", 1) -> 6000000000L))
  }

  test("a rebucket inside the offset window fails the stream loudly") {
    val root = tmpDir("cdf-rebucket")
    val table = new LakeTable(root, numBuckets = 2)
    apply(table, Seq(ev("c", 0, "x", "2025-01-01 00:00:00", "insert", 1)), 0L)
    val ckpt = tmpDir("cdf-rebucket-ck")
    drain(root, ckpt)
    val resized = MergeApplier.rebucket(spark, table, 4)
    MergeApplier.applyBatch(spark, resized,
      spark.createDataset(Seq(ev("c", 1, "y", "2025-01-01 00:01:00", "insert", 2))).toDF(), "w", 1L)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(root, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("bucket layout changed")))
  }

  test("column pruning reaches the scan: a two-column projection reads two+fold columns") {
    val root = tmpDir("cdf-prune")
    val table = new LakeTable(root, numBuckets = 2)
    apply(table, Seq(
      ev("c", 0, "alpha", "2025-01-01 00:00:00", "insert", 1),
      ev("c", 1, "beta", "2025-01-01 00:00:01", "insert", 2)), 0L)
    val df = spark.read.format("lake-cdf").option("path", root).load()
      .select("conv_id", "change_type")
    // the DSv2 scan's output after pushdown IS the pruned column set
    val scans = df.queryExecution.executedPlan.collectLeaves()
    assert(scans.exists(_.output.map(_.name) == Seq("conv_id", "change_type")),
      s"scan not pruned: ${scans.map(_.output.map(_.name))}")
    assert(df.collect().map(r => (r.getString(0), r.getString(1))).toSet ==
      Set(("c", "insert")))
    // and the pruned read still classifies correctly after a delete
    apply(table, Seq(ev("c", 1, null, "2025-01-01 00:01:00", "delete", 3)), 1L)
    val types = spark.read.format("lake-cdf").option("path", root).load()
      .select("change_type").collect().map(_.getString(0)).sorted
    assert(types.count(_ == "insert") == 1) // c/0 alive; c/1 dead at head
  }

  test("source metrics report replica lag and diff width per trigger") {
    val root = tmpDir("cdf-metrics")
    val table = new LakeTable(root, numBuckets = 4)
    apply(table, Seq(ev("c", 0, "a", "2025-01-01 00:00:00", "insert", 1)), 0L)
    apply(table, Seq(ev("c", 1, "b", "2025-01-01 00:00:01", "insert", 2)), 1L)
    val q = spark.readStream.format("lake-cdf").option("path", root)
      .option("maxVersionsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", tmpDir("cdf-metrics-ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
      .start()
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val perTrigger = q.recentProgress.toSeq.map(_.sources.head.metrics)
    assert(perTrigger.nonEmpty, "no progress with source metrics captured")
    assert(perTrigger.forall(_.containsKey("lastBatchChangedBuckets")))
    assert(perTrigger.forall(m => // absent on a trigger with no consumed offset yet
      !m.containsKey("versionsBehind") || m.get("versionsBehind").toLong >= 0))
    // once caught up, the reported replica lag is zero
    assert(perTrigger.exists(_.get("versionsBehind") == "0"))
  }

  test("source vacuum past the checkpoint fails loudly; fresh-replica re-bootstrap recovers") {
    val rootA = tmpDir("cdf-vac-a")
    val a = new LakeTable(rootA, numBuckets = 2)
    val b = new LakeTable(tmpDir("cdf-vac-b"), numBuckets = 2)
    apply(a, Seq(ev("c", 0, "x", "2025-01-01 00:00:00", "insert", 1)), 0L)
    val ckpt = tmpDir("cdf-vac-ck")
    Replicate.runAvailableNow(spark, rootA, b, ckpt)
    // the source moves on and expires the replicated-from snapshot,
    // INCLUDING a delete the stale replica never saw
    apply(a, Seq(ev("c", 0, null, "2025-01-01 00:01:00", "delete", 2),
      ev("c", 1, "y", "2025-01-01 00:01:01", "insert", 3)), 1L)
    a.vacuum(keepLast = 1, graceMs = 0)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      Replicate.runAvailableNow(spark, rootA, b, ckpt)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("vacuumed")))
    // recovery contract: a FRESH replica re-bootstraps to the source's
    // exact current state (the stale replica cannot — the bootstrap window
    // has no tombstone for the missed delete)
    val b2 = new LakeTable(tmpDir("cdf-vac-b2"), numBuckets = 2)
    Replicate.runAvailableNow(spark, rootA, b2, tmpDir("cdf-vac-ck2"))
    def state(t: LakeTable) =
      t.read(spark).collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(state(b2) == state(a))
    assert(state(b2).nonEmpty && state(b2) != state(b))
  }

  test("replication chains: A to B to C converges to A") {
    val rootA = tmpDir("cdf-chain-a")
    val a = new LakeTable(rootA, numBuckets = 4)
    val b = new LakeTable(tmpDir("cdf-chain-b"), numBuckets = 4)
    val c = new LakeTable(tmpDir("cdf-chain-c"), numBuckets = 4)
    val all = Generator.events(spark, 1200, numConvs = 8, turnsPerConv = 4, seed = 91)
      .as[ChangeEvent].collect().toSeq
    val (ckB, ckC) = (tmpDir("cdf-chain-ckb"), tmpDir("cdf-chain-ckc"))
    all.grouped(400).zipWithIndex.foreach { case (chunk, i) =>
      apply(a, chunk, i.toLong)
      Replicate.runAvailableNow(spark, rootA, b, ckB, writerId = "b")
      Replicate.runAvailableNow(spark, b.root, c, ckC, writerId = "c")
    }
    def state(t: LakeTable) =
      t.read(spark).collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(state(c) == state(a) && state(a).nonEmpty)
  }

  test("streaming materialized view equals full recompute across paced runs, conv death, resume") {
    val rootA = tmpDir("cdf-view-a")
    val a = new LakeTable(rootA, numBuckets = 8)
    val view = new LakeTable(tmpDir("cdf-view-v"), numBuckets = 8)
    val ckpt = tmpDir("cdf-view-ck")
    def viewState(): Set[(String, Long, Long, Long)] =
      view.read(spark).collect().map(r => (r.getAs[String]("conv_id"),
        r.getAs[Long]("turns"), r.getAs[Long]("total_chars"),
        r.getAs[Long]("user_turns"))).toSet
    def oracle(): Set[(String, Long, Long, Long)] =
      graft.operators.IncrementalAgg.convStats(a.read(spark)).collect()
        .map(r => (r.getAs[String]("conv_id"), r.getAs[Long]("turns"),
          r.getAs[Long]("total_chars"), r.getAs[Long]("user_turns"))).toSet

    val all = Generator.events(spark, 2400, numConvs = 12, turnsPerConv = 5, seed = 55)
      .as[ChangeEvent].collect().toSeq
    // several maintenance cycles, each folding a different number of base
    // commits per trigger (pacing must not change the result)
    all.grouped(800).zipWithIndex.foreach { case (chunk, i) =>
      chunk.grouped(400).zipWithIndex.foreach { case (c, j) => apply(a, c, i * 2L + j) }
      graft.streaming.StreamingView.runAvailableNow(spark, rootA, view, ckpt,
        maxVersionsPerTrigger = 1 + i)
      assert(viewState() == oracle(), s"cycle $i diverged")
    }
    assert(viewState().nonEmpty)

    // conversation death: delete every live turn of one conversation → it
    // must drop out of the view (tombstoned, not zero-row)
    val victim = a.read(spark).select("conv_id").head().getString(0)
    val dead = a.read(spark)
      .filter(org.apache.spark.sql.functions.col("conv_id") === victim)
      .select("conv_id", "turn_idx").collect()
      .zipWithIndex.map { case (r, i) =>
        ev(victim, r.getInt(1), null, "2030-01-01 00:00:00", "delete", 900000L + i) }
    apply(a, dead.toSeq, 99L)
    graft.streaming.StreamingView.runAvailableNow(spark, rootA, view, ckpt)
    assert(!viewState().exists(_._1 == victim) && viewState() == oracle())

    // caught up: a re-run commits nothing (exactly-once, no phantom refresh)
    val vv = view.currentSnapshot().get.version
    graft.streaming.StreamingView.runAvailableNow(spark, rootA, view, ckpt)
    assert(view.currentSnapshot().get.version == vv)
  }

  test("replicated delete cannot be resurrected by a stale insert arriving at the replica") {
    val rootA = tmpDir("cdf-lww-a")
    val a = new LakeTable(rootA, numBuckets = 2)
    val b = new LakeTable(tmpDir("cdf-lww-b"), numBuckets = 2)
    apply(a, Seq(ev("c", 0, "live", "2025-01-01 00:00:00", "insert", 1)), 0L)
    val ckpt = tmpDir("cdf-lww-ck")
    Replicate.runAvailableNow(spark, rootA, b, ckpt)
    apply(a, Seq(ev("c", 0, null, "2025-01-01 00:02:00", "delete", 3)), 1L)
    Replicate.runAvailableNow(spark, rootA, b, ckpt)
    assert(b.read(spark).count() == 0)
    // a stale insert (older version than the replicated tombstone) applied
    // DIRECTLY to the replica loses LWW — the tombstone's ts/seq protect it
    MergeApplier.applyBatch(spark, b,
      spark.createDataset(Seq(ev("c", 0, "stale", "2025-01-01 00:01:00", "insert", 2))).toDF(),
      "side", 0L)
    assert(b.read(spark).count() == 0)
  }
}
