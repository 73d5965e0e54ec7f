package graft

import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.table.LakeTable

import java.sql.Timestamp

class TableOpsSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(conv: String, turn: Int, text: String, t: String, op: String,
      seq: Long) =
    ChangeEvent(conv, turn, "user", text, None, ts(t), op, seq)

  private def state(table: LakeTable): Map[(String, Int), (String, Long)] =
    table.read(spark).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        ((r.getAs[String]("text"), r.getAs[Long]("seq")))).toMap

  /** The key's bucket, derived through the TABLE's own bucket expression —
    * independent of lookupTurn's driver-side murmur3 (pins their agreement).
    */
  private def bucketOf(table: LakeTable, conv: String, turn: Int): Int = {
    import spark.implicits._
    Seq((conv, turn)).toDF("conv_id", "turn_idx")
      .select(table.bucketCol.as("b")).head().getInt(0)
  }

  private def hideOtherBuckets(table: LakeTable, keep: Int): Unit = {
    val s = table.currentSnapshot().get
    table.resolveFiles(s).foreach { case (b, fs) =>
      if (b != keep) fs.foreach { fe =>
        val p = java.nio.file.Paths.get(fe.path)
        if (java.nio.file.Files.exists(p))
          java.nio.file.Files.move(p, p.resolveSibling(p.getFileName.toString + ".hidden"))
      }
    }
  }

  test("rollback: head serves the target state; ledger rolls back so replay converges") {
    val table = new LakeTable(tmpDir("ops-rollback"), numBuckets = 4)
    MergeApplier.applyBatch(spark, table, spark.createDataset(Seq(
      ev("c1", 0, "v1-a", "2025-01-01 00:00:00", "insert", 1),
      ev("c2", 0, "v1-b", "2025-01-01 00:00:01", "insert", 2))).toDF(), "w", 0L)
    val v1 = table.currentSnapshot().get.version
    val s1 = state(table)
    val batch2 = spark.createDataset(Seq(
      ev("c1", 0, "v2-a", "2025-01-01 00:01:00", "update", 3),
      ev("c3", 0, "v2-c", "2025-01-01 00:01:01", "insert", 4))).toDF()
    MergeApplier.applyBatch(spark, table, batch2, "w", 1L)
    val v2 = table.currentSnapshot().get.version
    val s2 = state(table)
    assert(s1 != s2)

    val rb = table.rollback(v1)
    assert(rb.version == v2 + 1 && rb.parentVersion == v2)
    assert(rb.metrics == Map("rollbackTo" -> v1))
    assert(state(table) == s1, "rolled-back head must serve the v1 state")
    // O(1) metadata: the rollback commit references v1's manifests verbatim
    assert(rb.manifests == table.snapshotAt(v1).get.manifests)

    // the LEDGER rolled back too: the writer's checkpoint replays batch 1
    // and the table accepts it again (not skipped), converging forward
    assert(rb.maxBatchId("w") == 0L)
    val r = MergeApplier.applyBatch(spark, table, batch2, "w", 1L)
    assert(!r.skipped)
    assert(state(table) == s2)

    // guards: future version and empty table
    intercept[IllegalArgumentException] { table.rollback(999L) }
    intercept[IllegalStateException] {
      new LakeTable(tmpDir("ops-rollback-empty"), 2).rollback(0L)
    }
  }

  test("rollback + vacuum: rolled-over files sweep; the restored head keeps reading") {
    val table = new LakeTable(tmpDir("ops-rb-vacuum"), numBuckets = 2)
    MergeApplier.applyBatch(spark, table, spark.createDataset(Seq(
      ev("c1", 0, "keep", "2025-01-01 00:00:00", "insert", 1))).toDF(), "w", 0L)
    val v1 = table.currentSnapshot().get.version
    MergeApplier.applyBatch(spark, table, spark.createDataset(Seq(
      ev("c1", 0, "discard", "2025-01-01 00:01:00", "update", 2))).toDF(), "w", 1L)
    table.rollback(v1)
    // keepLast=1: only the rollback head survives; the discarded commit's
    // rewrite is unreferenced and sweeps, v1's files stay (referenced)
    val deleted = table.vacuum(keepLast = 1, graceMs = 0L)
    assert(deleted > 0)
    assert(state(table) == Map(("c1", 0) -> (("keep", 1L))))
  }

  test("lookupTurn: COW point read opens only the key's bucket; filters push to parquet") {
    val table = new LakeTable(tmpDir("ops-lookup"), numBuckets = 8)
    val base = (0 until 64).map(i =>
      ev(s"c$i", i % 4, s"t$i", "2025-01-01 00:00:00", "insert", i.toLong))
    MergeApplier.applyBatch(spark, table, spark.createDataset(base).toDF(), "w", 0L)

    val row = table.lookupTurn(spark, "c5", 1).collect()
    assert(row.map(r => (r.getAs[String]("conv_id"), r.getAs[String]("text"))).toSeq ==
      Seq(("c5", "t5")))
    // key predicate reaches the parquet scan (row-group skipping on a
    // clustered table)
    val plan = table.lookupTurn(spark, "c5", 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(conv_id,c5)"), plan)

    // physical pruning: with every OTHER bucket's files gone, the lookup
    // still works — it never opens them
    hideOtherBuckets(table, bucketOf(table, "c5", 1))
    assert(table.lookupTurn(spark, "c5", 1).count() == 1)
    // a key that hashes elsewhere now fails (its bucket is hidden) — proving
    // the hidden files are genuinely required for other keys, i.e. the c5
    // success above was pruning, not luck
    val other = (0 until 64).map(i => (s"c$i", i % 4))
      .find { case (c, t) => bucketOf(table, c, t) != bucketOf(table, "c5", 1) }.get
    intercept[Exception] {
      table.lookupTurn(spark, other._1, other._2).collect()
    }
  }

  test("lookupTurn: MOR snapshot folds the one bucket; tombstoned key reads empty") {
    val table = new LakeTable(tmpDir("ops-lookup-mor"), numBuckets = 8)
    val base = (0 until 32).map(i =>
      ev(s"c$i", 0, s"t$i", "2025-01-01 00:00:00", "insert", i.toLong))
    MergeApplier.applyBatch(spark, table, spark.createDataset(base).toDF(), "w", 0L)
    MergeApplier.applyBatchMor(spark, table, spark.createDataset(Seq(
      ev("c5", 0, "fresh", "2025-01-01 00:01:00", "update", 100),
      ev("c6", 0, null, "2025-01-01 00:01:01", "delete", 101))).toDF(), "w", 1L)
    assert(table.currentSnapshot().get.morDeltas)
    val got = table.lookupTurn(spark, "c5", 0).collect()
    assert(got.map(_.getAs[String]("text")).toSeq == Seq("fresh"))
    assert(table.lookupTurn(spark, "c6", 0).count() == 0) // tombstoned
    assert(table.lookupTurn(spark, "nope", 3).count() == 0) // absent key
    // physical pruning on the folded path too
    hideOtherBuckets(table, bucketOf(table, "c5", 0))
    assert(table.lookupTurn(spark, "c5", 0).count() == 1)
  }

  test("compaction clusters each bucket by (conv_id, turn_idx); state is unchanged") {
    val table = new LakeTable(tmpDir("ops-cluster"), numBuckets = 4)
    // interleaved arrival: two batches whose keys alternate, so pre-compact
    // file order is NOT key order
    val b0 = (0 until 200).map(i =>
      ev(s"c${199 - i}", i % 5, s"a$i", "2025-01-01 00:00:00", "insert", i.toLong))
    val b1 = (0 until 200).map(i =>
      ev(s"c${i % 50}", 5 + i % 3, s"b$i", "2025-01-01 00:01:00", "insert", 1000L + i))
    MergeApplier.applyBatch(spark, table, spark.createDataset(b0).toDF(), "w", 0L)
    MergeApplier.applyBatchMor(spark, table, spark.createDataset(b1).toDF(), "w", 1L)
    val before = state(table)
    MergeApplier.compactRetainTombstones(spark, table)
    assert(state(table) == before)

    val s = table.currentSnapshot().get
    assert(!s.morDeltas)
    table.resolveFiles(s).foreach { case (b, fs) =>
      fs.foreach { fe =>
        val keys = spark.read.parquet(fe.path)
          .select("conv_id", "turn_idx").collect()
          .map(r => (r.getString(0), r.getInt(1))).toSeq
        assert(keys == keys.sortBy(identity),
          s"bucket $b file ${fe.path} is not key-clustered")
      }
    }
  }
}
