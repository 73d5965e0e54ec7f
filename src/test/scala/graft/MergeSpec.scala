package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.table.LakeTable
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class MergeSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(conv: String, turn: Int, text: String, t: String, op: String,
      seq: Long, tool: Option[String] = None) =
    ChangeEvent(conv, turn, "user", text, tool, ts(t), op, seq)

  private def finalState(table: LakeTable): Map[(String, Int), (String, Long)] =
    table.read(spark).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        ((r.getAs[String]("text"), r.getAs[Long]("seq")))).toMap

  test("golden: batched replay equals the independent in-memory oracle fold") {
    val all = Generator.events(spark, 8000, numConvs = 30, turnsPerConv = 8, seed = 11)
      .as[ChangeEvent].collect().toSeq
    val oracle = Generator.oracleFold(all)
      .map { case (k, e) => k -> ((e.text, e.seq)) }

    val table = new LakeTable(tmpDir("merge-golden"), numBuckets = 8)
    // apply in 5 arrival-order batches
    val sorted = all.sortBy(_.seq)
    sorted.grouped(1600).zipWithIndex.foreach { case (chunk, i) =>
      val df = spark.createDataset(chunk).toDF()
      MergeApplier.applyBatch(spark, table, df, "t", i.toLong)
    }
    assert(finalState(table) == oracle)
  }

  test("idle trigger: empty batch commits no version, leaves no orphan dir") {
    val table = new LakeTable(tmpDir("merge-idle"), numBuckets = 4)
    MergeApplier.applyBatch(spark, table, spark.createDataset(Seq(
      ev("c1", 0, "x", "2025-01-01 00:00:00", Model.OpInsert, 1))).toDF(), "w", 0L)
    val before = table.versions()
    val r = MergeApplier.applyBatch(spark, table,
      spark.createDataset(Seq.empty[ChangeEvent]).toDF(), "w", 1L)
    assert(!r.skipped && r.batchRows == 0 && r.touchedBuckets == 0)
    assert(table.versions() == before)
    // same contract on the MOR path
    val rm = MergeApplier.applyBatchMor(spark, table,
      spark.createDataset(Seq.empty[ChangeEvent]).toDF(), "w", 1L)
    assert(!rm.skipped && rm.batchRows == 0)
    assert(table.versions() == before)
    // the empty merge output dir was cleaned up, not left as an orphan
    val dataDir = java.nio.file.Paths.get(table.root, "data")
    val dirs = { val s = java.nio.file.Files.list(dataDir)
      try { import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.getFileName.toString).toSet } finally s.close() }
    assert(dirs.size == 1) // only the v1 commit dir
    // and a real batch after the idle one still applies
    MergeApplier.applyBatch(spark, table, spark.createDataset(Seq(
      ev("c1", 1, "y", "2025-01-01 00:01:00", Model.OpInsert, 2))).toDF(), "w", 2L)
    assert(finalState(table).keySet == Set(("c1", 0), ("c1", 1)))
  }

  test("golden: out-of-order batch split converges to the same state") {
    val all = Generator.events(spark, 6000, numConvs = 25, turnsPerConv = 6, seed = 23)
      .as[ChangeEvent].collect().toSeq
    val oracle = Generator.oracleFold(all).map { case (k, e) => k -> ((e.text, e.seq)) }

    val table = new LakeTable(tmpDir("merge-ooo"), numBuckets = 8)
    // pathological order: batches sliced by ts DESC — every batch is "late"
    val sorted = all.sortBy(e => (-e.ts.getTime, -e.seq))
    sorted.grouped(1500).zipWithIndex.foreach { case (chunk, i) =>
      MergeApplier.applyBatch(spark, table, spark.createDataset(chunk).toDF(), "t", i.toLong)
    }
    assert(finalState(table) == oracle)
  }

  test("idempotence: re-applying a committed batchId is a no-op") {
    val table = new LakeTable(tmpDir("merge-idem"), numBuckets = 4)
    val b = spark.createDataset(Seq(
      ev("c1", 0, "hello", "2025-01-01 00:00:00", "insert", 1),
      ev("c1", 1, "world", "2025-01-01 00:00:01", "insert", 2))).toDF()
    val r1 = MergeApplier.applyBatch(spark, table, b, "w", 0L)
    assert(!r1.skipped && r1.batchRows == 2)
    val v1 = table.currentSnapshot().get.version
    val r2 = MergeApplier.applyBatch(spark, table, b, "w", 0L)
    assert(r2.skipped)
    assert(table.currentSnapshot().get.version == v1)
    assert(table.read(spark).count() == 2)
    // a different writer with the same batchId is NOT deduped (per-writer ledger)
    val r3 = MergeApplier.applyBatch(spark, table, b, "w2", 0L)
    assert(!r3.skipped)
    assert(table.read(spark).count() == 2) // same keys, LWW keeps one copy
  }

  test("tombstone: stale insert after delete does not resurrect the turn") {
    val table = new LakeTable(tmpDir("merge-tomb"), numBuckets = 4)
    val b0 = spark.createDataset(Seq(
      ev("c1", 0, "v1", "2025-01-01 00:00:00", "insert", 1))).toDF()
    MergeApplier.applyBatch(spark, table, b0, "w", 0L)
    val b1 = spark.createDataset(Seq(
      ev("c1", 0, null, "2025-01-01 00:00:10", "delete", 2))).toDF()
    MergeApplier.applyBatch(spark, table, b1, "w", 1L)
    assert(table.read(spark).count() == 0)
    // late batch carries an OLDER insert for the same key
    val b2 = spark.createDataset(Seq(
      ev("c1", 0, "stale", "2025-01-01 00:00:05", "insert", 3))).toDF()
    MergeApplier.applyBatch(spark, table, b2, "w", 2L)
    assert(table.read(spark).count() == 0, "stale insert must not resurrect")
    // a genuinely NEWER insert does revive the key
    val b3 = spark.createDataset(Seq(
      ev("c1", 0, "fresh", "2025-01-01 00:00:20", "insert", 4))).toDF()
    MergeApplier.applyBatch(spark, table, b3, "w", 3L)
    assert(finalState(table) == Map(("c1", 0) -> (("fresh", 4L))))
  }

  test("compaction drops old tombstones, preserves live rows") {
    val table = new LakeTable(tmpDir("merge-compact"), numBuckets = 4)
    val b = spark.createDataset(Seq(
      ev("c1", 0, "keep", "2025-01-01 00:00:00", "insert", 1),
      ev("c1", 1, null, "2025-01-01 00:00:00", "delete", 2))).toDF()
    MergeApplier.applyBatch(spark, table, b, "w", 0L)
    assert(table.readRaw(spark).count() == 2) // live + tombstone
    MergeApplier.compact(spark, table, ts("2025-06-01 00:00:00"))
    assert(table.readRaw(spark).count() == 1)
    assert(finalState(table) == Map(("c1", 0) -> (("keep", 1L))))
  }

  test("additive schema evolution: v1 events (no tool) then v2 events widen the table") {
    val table = new LakeTable(tmpDir("merge-evolve"), numBuckets = 4)
    val v1 = spark.createDataset(Seq(
      ev("c1", 0, "old", "2025-01-01 00:00:00", "insert", 1))).toDF().drop("tool")
    MergeApplier.applyBatch(spark, table, v1, "w", 0L)
    assert(!table.currentSnapshot().get.schema.fieldNames.contains("tool"))

    val v2 = spark.createDataset(Seq(
      ev("c2", 0, "new", "2025-01-01 00:00:01", "insert", 2, tool = Some("search")),
      ev("c2", 1, "new2", "2025-01-01 00:00:02", "insert", 3))).toDF()
    MergeApplier.applyBatch(spark, table, v2, "w", 1L)
    val out = table.read(spark)
    assert(out.schema.fieldNames.contains("tool"))
    val rows = out.collect().map(r =>
      (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r.getAs[String]("tool")).toMap
    // old rows read back with null tool; new rows carry it
    assert(rows(("c1", 0)) == null)
    assert(rows(("c2", 0)) == "search")
    assert(rows(("c2", 1)) == null)
    // non-additive change (type flip) is rejected
    intercept[IllegalArgumentException] {
      Model.mergeSchemas(table.currentSnapshot().get.schema,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("turn_idx",
            org.apache.spark.sql.types.StringType))))
    }
  }

  test("late v1 batch (missing evolved column) after evolution aligns with nulls") {
    val table = new LakeTable(tmpDir("merge-late-v1"), numBuckets = 4)
    val v2 = spark.createDataset(Seq(
      ev("c1", 0, "new", "2025-01-01 00:00:00", "insert", 1, tool = Some("search")))).toDF()
    MergeApplier.applyBatch(spark, table, v2, "w", 0L)
    // a straggler writer still on the v1 schema (no tool column)
    val v1 = spark.createDataset(Seq(
      ev("c2", 0, "old", "2025-01-01 00:00:01", "insert", 2))).toDF().drop("tool")
    MergeApplier.applyBatch(spark, table, v1, "w", 1L)
    val rows = table.read(spark).collect().map(r =>
      r.getAs[String]("conv_id") -> r.getAs[String]("tool")).toMap
    assert(rows == Map("c1" -> "search", "c2" -> null))
  }

  test("mismatched bucket-count handle is rejected loudly") {
    val dir = tmpDir("merge-buckets")
    val t4 = new LakeTable(dir, numBuckets = 4)
    MergeApplier.applyBatch(spark, t4, spark.createDataset(Seq(
      ev("c1", 0, "x", "2025-01-01 00:00:00", "insert", 1))).toDF(), "w", 0L)
    val t8 = new LakeTable(dir, numBuckets = 8)
    intercept[IllegalArgumentException] {
      MergeApplier.applyBatch(spark, t8, spark.createDataset(Seq(
        ev("c1", 1, "y", "2025-01-01 00:00:01", "insert", 2))).toDF(), "w", 1L)
    }
  }

  test("alignment invariant: repartition(N, key) partition id equals bucketCol for every row") {
    // The bucket-local merge (MergeApplier.mergeBucket) reads bucket i's
    // target files in partition i of the batch's key shuffle and tags output
    // rows with the partition id. That is sound ONLY if Spark's
    // HashPartitioning (murmur3, seed 42) equals pmod(hash(key), N) — this
    // test pins the invariant against any Spark-internals drift.
    import org.apache.spark.sql.functions.{col, spark_partition_id}
    val table = new LakeTable(tmpDir("merge-align"), numBuckets = 8)
    val df = spark.createDataset((0 until 5000).map(i =>
      ev(s"c${i % 311}", i % 29, s"t$i", "2025-01-01 00:00:00", "insert", i.toLong))).toDF()
    val mismatched = df.repartition(table.numBuckets, col("conv_id"), col("turn_idx"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__bucket", table.bucketCol)
      .filter(col("__pid") =!= col("__bucket"))
      .count()
    assert(mismatched == 0L)
  }

  test("flooded bucket: merge stays correct; numBuckets bounds the rewrite unit on a fresh table") {
    // Pathological skew: every key lands in ONE bucket (numBuckets = 1 is the
    // degenerate worst case — one bucket holds the whole table). The merge
    // contract is that a bucket is the COW rewrite unit and must be SIZED to
    // an executor via numBuckets; this pins (a) correctness under a flooded
    // bucket and (b) that a fresh table with more buckets shrinks the unit.
    val all = Generator.events(spark, 6000, numConvs = 12, turnsPerConv = 8, seed = 41)
      .as[ChangeEvent].collect().toSeq
    val oracle = Generator.oracleFold(all).map { case (k, e) => k -> ((e.text, e.seq)) }
    val t1 = new LakeTable(tmpDir("skew-one"), numBuckets = 1)
    all.sortBy(_.seq).grouped(2000).zipWithIndex.foreach { case (chunk, i) =>
      MergeApplier.applyBatch(spark, t1, spark.createDataset(chunk).toDF(), "w", i.toLong)
    }
    assert(finalState(t1) == oracle)
    val s1 = t1.currentSnapshot().get
    assert(s1.bucketRows.keySet == Set(0))
    // fresh table, 16 buckets: same state, rewrite unit ~1/16th the rows
    val t16 = new LakeTable(tmpDir("skew-sixteen"), numBuckets = 16)
    all.sortBy(_.seq).grouped(2000).zipWithIndex.foreach { case (chunk, i) =>
      MergeApplier.applyBatch(spark, t16, spark.createDataset(chunk).toDF(), "w", i.toLong)
    }
    assert(finalState(t16) == oracle)
    val s16 = t16.currentSnapshot().get
    assert(s16.totalRows == s1.totalRows)
    val hottest = s16.bucketRows.values.max
    assert(hottest < s1.bucketRows(0) / 4,
      s"16 buckets did not shrink the rewrite unit: max $hottest vs ${s1.bucketRows(0)}")
    // lineage invariant under the flood: per-bucket counts match the files
    assert(s16.bucketRows == t16.footerRowCounts(t16.resolveFiles(s16)))
  }

  test("lineage: snapshot records per-bucket rows, metrics, and ledger") {
    val table = new LakeTable(tmpDir("merge-lineage"), numBuckets = 4)
    val b = spark.createDataset((0 until 100).map(i =>
      ev(s"c${i % 7}", i % 5, s"t$i", f"2025-01-01 00:${i % 60}%02d:00", "insert", i.toLong))).toDF()
    MergeApplier.applyBatch(spark, table, b, "w", 0L)
    val s = table.currentSnapshot().get
    assert(s.committed == Map("w" -> 0L))
    assert(s.totalRows == table.read(spark).count() + 0) // no tombstones here
    assert(s.bucketRows.values.sum == s.totalRows)
    assert(s.metrics("deletes") == 0L)
    assert(s.metrics("batchRows") > 0L)
  }
}
