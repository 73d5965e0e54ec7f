package graft

import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.table.LakeTable

import java.sql.Timestamp

/** Metadata-only COUNT(*): after a FULL compaction (which records the
  * retained-tombstone count), `SELECT COUNT(*)` answers from the snapshot
  * without opening a data file; any state the metadata cannot prove exact
  * (deltas, unknown tombstones) falls back to the real scan.
  */
class CountPushdownSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ev(conv: String, turn: Int, text: String, t: String, seq: Long,
      op: String = "insert") =
    ChangeEvent(conv, turn, "user", text, None, Timestamp.valueOf(t), op, seq)

  private def build(root: String): LakeTable = {
    val t = new LakeTable(root, numBuckets = 4)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(
      (0 until 30).map(i => ev(s"c$i", i % 3, s"v$i", "2025-01-01 10:00:00", i.toLong))).toDF(),
      "w", 0L)
    // delete 5 keys (tombstones retained by the maintenance compaction)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(
      (0 until 5).map(i => ev(s"c$i", i % 3, null, "2025-01-02 10:00:00", 100L + i,
        op = "delete"))).toDF(), "w", 1L)
    t
  }

  test("compacted table: COUNT(*) is metadata-only (answers with data files gone)") {
    val root = tmpDir("cp-meta")
    val t = build(root)
    MergeApplier.compactRetainTombstones(spark, t)
    val df = spark.read.format("lake").option("path", root).load()
    assert(df.count() == 25L) // 30 inserts − 5 tombstoned
    assert(t.read(spark).count() == 25L, "pushdown must equal the real read")
    // the plan must be the count scan, not a parquet pass
    val plan = df.groupBy().count().queryExecution.executedPlan.toString
    assert(plan.contains("LakeCountScan"), s"expected pushed count:\n$plan")
    // physical proof: with every data file deleted the count still answers
    t.resolveFiles(t.currentSnapshot().get).values.flatten.foreach(f =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(spark.read.format("lake").option("path", root).load().count() == 25L)
    intercept[Exception] {
      spark.read.format("lake").option("path", root).load().collect()
    }
  }

  test("unsound states fall back to the scan: deltas present or filters applied") {
    val root = tmpDir("cp-fallback")
    val t = build(root)
    // no compaction yet: delta-carrying snapshot must NOT push down, and
    // must still count correctly through the fold
    val df0 = spark.read.format("lake").option("path", root).load()
    assert(df0.count() == 25L)
    assert(!df0.groupBy().count().queryExecution.executedPlan.toString
      .contains("LakeCountScan"))
    // compaction turns pushdown on; a subsequent MOR append turns it off
    MergeApplier.compactRetainTombstones(spark, t)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(Seq(
      ev("c999", 0, "new", "2025-01-03 10:00:00", 500L))).toDF(), "w", 2L)
    val df1 = spark.read.format("lake").option("path", root).load()
    assert(df1.count() == 26L)
    assert(!df1.groupBy().count().queryExecution.executedPlan.toString
      .contains("LakeCountScan"))
    // a filtered count never pushes (the residual Filter blocks the rule)
    MergeApplier.compactRetainTombstones(spark, t)
    val filtered = spark.read.format("lake").option("path", root).load()
      .filter(org.apache.spark.sql.functions.col("conv_id") === "c999")
    assert(filtered.count() == 1L)
    assert(!filtered.groupBy().count().queryExecution.executedPlan.toString
      .contains("LakeCountScan"))
  }

  test("SQL COUNT(*) through the catalog pushes down") {
    val base = tmpDir("cp-sql")
    val t = build(s"$base/t")
    MergeApplier.compactRetainTombstones(spark, t)
    spark.conf.set("spark.sql.catalog.cpcat", classOf[graft.table.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.cpcat.base", base)
    val q = spark.sql("SELECT COUNT(*) AS n FROM cpcat.t")
    assert(q.collect().head.getLong(0) == 25L)
    assert(q.queryExecution.executedPlan.toString.contains("LakeCountScan"))
  }
}
