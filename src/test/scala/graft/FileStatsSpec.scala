package graft

import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.table.{FileEntry, FileStats, LakeTable}
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** Per-file key bounds in the manifest (Iceberg's column-bounds file
  * skipping, for the table's key columns): written by the hot apply paths
  * from their existing accumulators — zero added I/O — and used by the
  * key-addressed lookups to open only the files that can hold the key.
  * The physical proofs DELETE the skippable files from disk: a lookup that
  * still answers exactly cannot have opened them.
  */
class FileStatsSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ev(conv: String, turn: Int, text: String, t: String, seq: Long,
      op: String = "insert") =
    ChangeEvent(conv, turn, "user", text, None, Timestamp.valueOf(t), op, seq)

  private def batch(convPrefix: String, n: Int, seq0: Long): Seq[ChangeEvent] =
    (0 until n).flatMap(i => (0 until 4).map(turn =>
      ev(s"$convPrefix$i", turn, s"$convPrefix$i-t$turn", "2025-01-01 10:00:00", seq0 + i * 4 + turn)))

  private def allEntries(t: LakeTable): Seq[FileEntry] =
    t.resolveFiles(t.currentSnapshot().get).values.flatten.toSeq

  test("MOR delta commits carry exact key bounds in the manifest") {
    val t = new LakeTable(tmpDir("fs-mor"), numBuckets = 1) // one bucket: skipping is purely file-level
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("a", 5, 0)).toDF(), "w", 0L)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("b", 5, 100)).toDF(), "w", 1L)
    val entries = allEntries(t)
    assert(entries.nonEmpty && entries.forall(_.stats.nonEmpty),
      s"every delta file must carry bounds: $entries")
    val byMin = entries.flatMap(_.stats).sortBy(_.minConv)
    assert(byMin.head == FileStats("a0", "a4", 0, 3))
    assert(byMin.last == FileStats("b0", "b4", 0, 3))
  }

  test("COW merge commits carry the written bucket's key bounds") {
    val t = new LakeTable(tmpDir("fs-cow"), numBuckets = 2)
    // cold start files legitimately have no bounds (no accumulator pass)
    MergeApplier.applyBatch(spark, t, spark.createDataset(batch("a", 3, 0)).toDF(), "w", 0L)
    assert(allEntries(t).forall(_.stats.isEmpty))
    // the hot COW merge attaches the fold's winner bounds
    MergeApplier.applyBatch(spark, t, spark.createDataset(batch("b", 3, 100)).toDF(), "w", 1L)
    val entries = allEntries(t)
    assert(entries.exists(_.stats.nonEmpty), "merged buckets must carry bounds")
    entries.flatMap(_.stats).foreach { st =>
      // post-merge winners include batch a and b keys: bounds must span both
      assert(st.minConv.startsWith("a") && st.maxConv.startsWith("b"), st.toString)
      assert(st.minTurn >= 0 && st.maxTurn <= 3)
    }
  }

  test("physical skip: lookupTurn answers with the other deltas deleted from disk") {
    val t = new LakeTable(tmpDir("fs-skip"), numBuckets = 1)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("a", 5, 0)).toDF(), "w", 0L)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("b", 5, 100)).toDF(), "w", 1L)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("c", 5, 200)).toDF(), "w", 2L)
    // delete every file whose bounds exclude the probe key — if the lookup
    // opened any of them it would crash
    val (keep, skip) = allEntries(t).partition(_.stats.get.mightContain("a2", 3))
    assert(skip.size == 2, s"b and c deltas must be skippable: $skip")
    skip.foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val row = t.lookupTurn(spark, "a2", 3).collect()
    assert(row.length == 1 && row.head.getAs[String]("text") == "a2-t3")
    // a key in a deleted file's range now (rightly) fails loudly
    intercept[Exception] { t.lookupTurn(spark, "b1", 0).collect() }
    assert(keep.nonEmpty)
  }

  test("physical skip: lookupConversation prunes by conv bounds alone") {
    val t = new LakeTable(tmpDir("fs-skip-conv"), numBuckets = 2)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("a", 4, 0)).toDF(), "w", 0L)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("b", 4, 100)).toDF(), "w", 1L)
    allEntries(t).filter(f => !f.stats.get.mightContainConv("a1"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    val got = t.lookupConversation(spark, "a1").collect()
      .map(r => (r.getAs[Int]("turn_idx"), r.getAs[String]("text"))).toSet
    assert(got == (0 until 4).map(i => (i, s"a1-t$i")).toSet)
  }

  test("pruned lookups agree with the full read on a mixed stats/stat-less table") {
    val t = new LakeTable(tmpDir("fs-mixed"), numBuckets = 4)
    MergeApplier.applyBatch(spark, t, spark.createDataset(batch("a", 6, 0)).toDF(), "w", 0L) // no stats
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(
      batch("a", 6, 100) ++ batch("z", 3, 400)).toDF(), "w", 1L) // stats
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(Seq(
      ev("a3", 1, "newer", "2025-01-02 10:00:00", 999),
      ev("a4", 2, "", "2025-01-02 10:00:00", 1000, op = "delete"))).toDF(), "w", 2L)
    val full = t.read(spark).collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) -> r.getAs[String]("text")).toMap
    for (conv <- Seq("a0", "a3", "a4", "z2", "nope"); turn <- 0 until 4) {
      val got = t.lookupTurn(spark, conv, turn).collect()
      full.get((conv, turn)) match {
        case Some(text) => assert(got.length == 1 && got.head.getAs[String]("text") == text,
          s"($conv,$turn): got ${got.toSeq}")
        case None => assert(got.isEmpty, s"($conv,$turn) should be absent, got ${got.toSeq}")
      }
    }
    val conv = t.lookupConversation(spark, "a3").collect()
      .map(r => r.getAs[Int]("turn_idx") -> r.getAs[String]("text")).toMap
    assert(conv == full.collect { case ((c, tu), tx) if c == "a3" => tu -> tx })
  }

  test("manifest format: stat-less entries keep the legacy string form; both round-trip") {
    val t = new LakeTable(tmpDir("fs-manifest"), numBuckets = 2)
    val files = Map(
      0 -> Seq(FileEntry("/x/old.parquet", 10L),
        FileEntry("/x/new.parquet", 20L, Some(FileStats("c|0", "c|9", 0, 7)))), // '|' in conv ids survives
      1 -> Seq(FileEntry("/x/plain.parquet", 30L)))
    val path = t.writeManifest(1L, files)
    assert(t.readManifest(path) == files)
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    assert(raw.contains("\"10|/x/old.parquet\""), s"legacy string form expected: $raw")
    assert(raw.contains("\"c0\""), "stats object form expected")
  }

  test("streaming sink epochs carry bounds; sink deltas are skippable") {
    val src = tmpDir("fs-sink-src")
    val root = s"${tmpDir("fs-sink")}/t"
    val ckpt = tmpDir("fs-sink-ckpt")
    val t = new LakeTable(root, numBuckets = 1)
    MergeApplier.applyBatchMor(spark, t, spark.createDataset(batch("a", 3, 0)).toDF(), "seed", 0L)
    writeFlatParquet(spark.createDataset(batch("q", 3, 100)).toDF().drop("op"), src, "e0.parquet")
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        Model.changeEventSchema.fields.filterNot(_.name == "op")))
      .parquet(src)
      .writeStream.format("lake")
      .option("path", root).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val entries = allEntries(t)
    assert(entries.forall(_.stats.nonEmpty), s"sink files must carry bounds: $entries")
    val sinkStats = entries.flatMap(_.stats).filter(_.minConv.startsWith("q"))
    assert(sinkStats.nonEmpty && sinkStats.forall(_ == FileStats("q0", "q2", 0, 3)))
    // and they skip: drop the sink delta, the seed conversation still reads
    entries.filter(!_.stats.get.mightContainConv("a1"))
      .foreach(f => java.nio.file.Files.delete(java.nio.file.Paths.get(f.path)))
    assert(t.lookupTurn(spark, "a1", 2).collect().map(_.getAs[String]("text")).toSeq == Seq("a1-t2"))
  }
}
