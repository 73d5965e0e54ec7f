package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.operators.{ChangeFeed, IncrementalAgg, MergeApplier}
import graft.table.LakeTable

import java.sql.Timestamp

/** Incremental materialized-aggregate maintenance: the pre/post-image feed
  * contract, the subtractable-fold equivalence (incremental == full
  * recompute, the defining invariant of view maintenance), and the
  * table-backed O(Δ) refresh across multiple cycles with deletes, updates,
  * conversation death, and exactly-once replay.
  */
class IncrementalAggSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(conv: String, turn: Int, text: String, t: String, op: String,
      seq: Long, role: String = "user") =
    ChangeEvent(conv, turn, role, text, None, ts(t), op, seq)

  private def apply(table: LakeTable, batch: Seq[ChangeEvent], id: Long): Long = {
    MergeApplier.applyBatch(spark, table, spark.createDataset(batch).toDF(), "w", id)
    table.currentSnapshot().get.version
  }

  private def statsMap(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getAs[String]("conv_id") ->
      ((r.getAs[Long]("turns"), r.getAs[Long]("total_chars"),
        r.getAs[Long]("user_turns")))).toMap

  test("update pre-images: every update pairs a preimage row with identical key and OLD values") {
    val table = new LakeTable(tmpDir("preimg"), numBuckets = 4)
    val v1 = apply(table, Seq(
      ev("cA", 0, "old-a", "2025-01-01 00:00:00", "insert", 1),
      ev("cB", 0, "stay", "2025-01-01 00:00:01", "insert", 2)), 0L)
    val v2 = apply(table, Seq(
      ev("cA", 0, "new-a", "2025-01-01 00:01:00", "update", 3),
      ev("cC", 0, "born", "2025-01-01 00:01:01", "insert", 4),
      ev("cB", 0, null, "2025-01-01 00:01:02", "delete", 5)), 1L)

    val rows = ChangeFeed.changesBetween(spark, table, v1, v2,
        withUpdatePreImages = true)
      .collect().map(r => (r.getAs[String]("change_type"),
        r.getAs[String]("conv_id"), r.getAs[String]("text"), r.getAs[Long]("seq")))
      .toSet
    assert(rows == Set(
      ("update_preimage", "cA", "old-a", 1L),
      ("update", "cA", "new-a", 3L),
      ("insert", "cC", "born", 4L),
      ("delete", "cB", "stay", 2L)))
    // the flag is additive-only: without it the feed is exactly the old shape
    val plain = ChangeFeed.changesBetween(spark, table, v1, v2)
      .collect().map(_.getAs[String]("change_type")).sorted.toSeq
    assert(plain == Seq("delete", "insert", "update"))
  }

  test("maintain(prev, feed) == full recompute over a random changelog split") {
    val all = Generator.events(spark, 3000, numConvs = 20, turnsPerConv = 6, seed = 42)
      .as[ChangeEvent].collect().toSeq
    val table = new LakeTable(tmpDir("incr-rand"), numBuckets = 8)
    val (h1, h2) = all.partition(_.seq % 2 == 0)
    val v1 = apply(table, h1, 0L)
    val v2 = apply(table, h2, 1L)

    val prev = IncrementalAgg.convStats(table.read(spark, asOfVersion = Some(v1)))
    val feed = ChangeFeed.changesBetween(spark, table, v1, v2, withUpdatePreImages = true)
    val incremental = statsMap(IncrementalAgg.maintain(prev, feed))
    val full = statsMap(IncrementalAgg.convStats(table.read(spark)))
    assert(incremental == full)
  }

  test("table-backed refresh: O(Δ) cycles track the base exactly, incl. conversation death") {
    val base = new LakeTable(tmpDir("view-base"), numBuckets = 8)
    val view = new LakeTable(tmpDir("view-stats"), numBuckets = 4)
    var from = 0L

    def refreshAndCheck(): Unit = {
      from = IncrementalAgg.refreshIntoTable(spark, base, view, from)
      val viewState = statsMap(view.read(spark)
        .select("conv_id", "turns", "total_chars", "user_turns"))
      val expected = statsMap(IncrementalAgg.convStats(base.read(spark)))
      assert(viewState == expected)
    }

    // cycle 1: bootstrap from empty view
    apply(base, Seq(
      ev("c1", 0, "hello", "2025-01-01 00:00:00", "insert", 1),
      ev("c1", 1, "world!", "2025-01-01 00:00:01", "insert", 2, role = "assistant"),
      ev("c2", 0, "solo", "2025-01-01 00:00:02", "insert", 3)), 0L)
    refreshAndCheck()

    // cycle 2: update (chars change), new conv, new turn
    apply(base, Seq(
      ev("c1", 0, "hello there", "2025-01-01 00:01:00", "update", 4),
      ev("c3", 0, "fresh", "2025-01-01 00:01:01", "insert", 5),
      ev("c2", 1, "more", "2025-01-01 00:01:02", "insert", 6, role = "assistant")), 1L)
    refreshAndCheck()

    // cycle 3: conversation death — c2 loses BOTH turns, must leave the view
    apply(base, Seq(
      ev("c2", 0, null, "2025-01-01 00:02:00", "delete", 7),
      ev("c2", 1, null, "2025-01-01 00:02:01", "delete", 8)), 2L)
    refreshAndCheck()
    assert(!statsMap(view.read(spark)
      .select("conv_id", "turns", "total_chars", "user_turns")).contains("c2"))

    // exactly-once: re-running the refresh at the same base version is a no-op
    val viewVer = view.currentSnapshot().get.version
    val again = IncrementalAgg.refreshIntoTable(spark, base, view, 0L)
    assert(again == from)
    assert(view.currentSnapshot().get.version == viewVer,
      "a replayed refresh (same base version) must hit the ledger and not commit")

    // cycle 4: rebirth after death + a larger random batch
    val more = Generator.events(spark, 800, numConvs = 6, turnsPerConv = 4, seed = 7)
      .as[ChangeEvent].collect().toSeq.map(e => e.copy(seq = e.seq + 100))
    apply(base, ev("c2", 0, "reborn", "2025-01-01 00:03:00", "insert", 99) +: more, 3L)
    refreshAndCheck()
  }

  test("above pruneCap the refresh still writes only O(Δ) rows, not the whole view") {
    val base = new LakeTable(tmpDir("cap-base"), numBuckets = 4)
    val view = new LakeTable(tmpDir("cap-view"), numBuckets = 4)
    val boot = (0 until 24).map(i =>
      ev(s"conv$i", 0, s"t$i", "2025-01-01 00:00:00", "insert", i.toLong))
    apply(base, boot, 0L)
    var from = IncrementalAgg.refreshIntoTable(spark, base, view, 0L)
    val vBefore = view.currentSnapshot().get.version

    // delta touches ONE conversation; pruneCap = 0 forces the full-view-read
    // branch — the refresh must still MERGE only the changed row, never
    // re-upsert the 23 untouched ones (O(state) write amplification)
    apply(base, Seq(ev("conv3", 1, "xx", "2025-01-01 00:01:00", "insert", 100L)), 1L)
    from = IncrementalAgg.refreshIntoTable(spark, base, view, from, pruneCap = 0)
    val vAfter = view.currentSnapshot().get.version
    val written = ChangeFeed.changesBetween(spark, view, vBefore, vAfter)
      .select("conv_id").collect().map(_.getString(0)).toSeq
    assert(written == Seq("conv3"),
      s"full-read refresh must write only delta conversations, wrote: $written")
    // and the view state is still exactly the base's stats
    val viewState = statsMap(view.read(spark)
      .select("conv_id", "turns", "total_chars", "user_turns"))
    assert(viewState == statsMap(IncrementalAgg.convStats(base.read(spark))))
  }

  test("refresh prunes: the view read opens only affected conversations' buckets") {
    val base = new LakeTable(tmpDir("prune-base"), numBuckets = 8)
    val view = new LakeTable(tmpDir("prune-view"), numBuckets = 8)
    // bootstrap with many convs
    val boot = (0 until 32).map(i =>
      ev(s"conv$i", 0, s"t$i", "2025-01-01 00:00:00", "insert", i.toLong))
    apply(base, boot, 0L)
    var from = IncrementalAgg.refreshIntoTable(spark, base, view, 0L)

    // small delta touching ONE conv; physically delete every OTHER view
    // bucket's files — if pruning works the refresh never opens them
    apply(base, Seq(ev("conv0", 1, "x", "2025-01-01 00:01:00", "insert", 100L)), 1L)
    val snap = view.currentSnapshot().get
    val keep = {
      import org.apache.spark.sql.catalyst.expressions.{Literal, Murmur3Hash}
      val h = Murmur3Hash(Seq(
        Literal.create("conv0", org.apache.spark.sql.types.StringType),
        Literal(0)), 42).eval(null).asInstanceOf[Int]
      ((h % snap.numBuckets) + snap.numBuckets) % snap.numBuckets
    }
    view.resolveFiles(snap).foreach { case (b, fs) =>
      if (b != keep) fs.foreach(f =>
        java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    }
    from = IncrementalAgg.refreshIntoTable(spark, base, view, from)
    // conv0's row is correct even though the rest of the view is unreadable
    val row = view.lookupTurn(spark, "conv0", 0).collect()
    assert(row.length == 1 && row.head.getAs[Long]("turns") == 2L)
  }
}
