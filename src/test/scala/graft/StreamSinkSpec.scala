package graft

import graft.model.{ChangeEvent, Model}
import graft.operators.MergeApplier
import graft.table.LakeTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.sql.Timestamp

/** The native DSv2 streaming sink (`writeStream.format("lake")`): delta
  * appends per epoch, ledger exactly-once across checkpoint replays, LWW
  * upsert semantics at read time, interchangeability with the engine paths.
  */
class StreamSinkSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  private def ts(s: String) = Timestamp.valueOf(s)
  private def ev(conv: String, turn: Int, text: String, t: String, seq: Long): ChangeEvent =
    ChangeEvent(conv, turn, "user", text, None, ts(t), "insert", seq)

  private def runSink(srcDir: String, root: String, ckpt: String,
      writerId: Option[String] = None): Unit = {
    val w = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        Model.changeEventSchema.fields.filterNot(_.name == "op")))
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .format("lake")
      .option("path", root)
      .option("checkpointLocation", ckpt)
    writerId.foreach(w.option("writerId", _))
    w.trigger(Trigger.AvailableNow()).start().awaitTermination()
  }

  test("epoch appends: rows land exactly-once, LWW upserts resolve at read, compaction folds") {
    val src = tmpDir("sink-src")
    val root = s"${tmpDir("sink-tbl")}/t"
    val ckpt = tmpDir("sink-ckpt")
    // seed the table through the engine path (the sink appends to live tables)
    val t = new LakeTable(root, numBuckets = 4)
    MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
      ev("c", 0, "v0", "2025-01-01 00:00:00", 1))).toDF(), "seed", 0L)

    def chunk(name: String, evs: Seq[ChangeEvent]): Unit =
      writeFlatParquet(spark.createDataset(evs).toDF().drop("op"), src, name)
    chunk("a.parquet", Seq(
      ev("c", 0, "v1", "2025-01-01 00:10:00", 10),
      ev("d", 0, "d0", "2025-01-01 00:10:00", 11)))
    chunk("b.parquet", Seq(
      ev("c", 0, "stale", "2025-01-01 00:05:00", 5), // older: loses LWW
      ev("e", 2, "e2", "2025-01-01 00:11:00", 12)))

    runSink(src, root, ckpt)
    val snap = t.currentSnapshot().get
    assert(snap.morDeltas, "sink epochs must be delta appends")
    assert(snap.version == 3, s"2 non-empty epochs after seed, got v${snap.version}")
    val got = t.read(spark).orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx"), r.getAs[String]("text"))).toSeq
    assert(got == Seq(("c", 0, "v1"), ("d", 0, "d0"), ("e", 2, "e2")))

    // re-run on the SAME checkpoint with no new data: no new commits
    runSink(src, root, ckpt)
    assert(t.currentSnapshot().get.version == 3)

    // a FRESH checkpoint with the SAME writerId restarts epochs at 0 — the
    // ledger treats them as replays and commits nothing (lost-checkpoint
    // safety, same contract as the foreachBatch tail)
    val wid = s"stream-${
      java.nio.file.Files.readString(java.nio.file.Paths.get(ckpt, "metadata"))
        .split("\"id\"\\s*:\\s*\"")(1).split("\"")(0)}"
    runSink(src, root, tmpDir("sink-ckpt2"), Some(wid))
    assert(t.currentSnapshot().get.version == 3,
      "replayed epochs under the same writerId must be ledger no-ops")
    assert(t.read(spark).count() == 3)

    // compaction folds the sink's deltas like any MOR state
    MergeApplier.compact(spark, t, ts("2024-01-01 00:00:00"))
    assert(!t.currentSnapshot().get.morDeltas)
    assert(t.read(spark).count() == 3)
  }

  test("additive evolution through the sink: a new stream column widens the snapshot schema") {
    val src = tmpDir("sink3-src")
    val root = s"${tmpDir("sink3-tbl")}/t"
    val t = new LakeTable(root, numBuckets = 4)
    MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
      ev("a", 0, "a0", "2025-01-01 00:00:00", 1))).toDF(), "seed", 0L)

    // stream schema = table minus op PLUS a new nullable column
    val evolved = spark.createDataset(Seq(
      ev("b", 0, "b0", "2025-01-01 00:10:00", 10))).toDF()
      .drop("op").withColumn("lang", lit("en"))
    writeFlatParquet(evolved, src, "c1.parquet")
    spark.readStream.schema(evolved.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream.format("lake")
      .option("path", root).option("checkpointLocation", tmpDir("sink3-ckpt"))
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

    val snap = t.currentSnapshot().get
    assert(snap.schema.fieldNames.contains("lang"), s"schema not widened: ${snap.schema}")
    val rows = t.read(spark).orderBy("conv_id")
      .select("conv_id", "text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    // the old (pre-evolution) row reads the new column as null
    assert(rows == Seq(("a", "a0", null), ("b", "b0", "en")))
  }

  test("sink epochs interleave with engine applies and SQL reads") {
    val src = tmpDir("sink2-src")
    val base = tmpDir("sink2-tbl")
    val root = s"$base/t"
    val t = new LakeTable(root, numBuckets = 4)
    MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
      ev("a", 0, "a0", "2025-01-01 00:00:00", 1))).toDF(), "seed", 0L)
    writeFlatParquet(spark.createDataset(Seq(
      ev("b", 0, "b0", "2025-01-01 00:10:00", 10))).toDF().drop("op"), src, "c1.parquet")
    runSink(src, root, tmpDir("sink2-ckpt"))
    // engine delete event against a sink-written row
    MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
      ChangeEvent("b", 0, null, null, None, ts("2025-01-01 00:20:00"), "delete", 20))).toDF(),
      "seed", 1L)
    spark.conf.set("spark.sql.catalog.sinkcat", classOf[graft.table.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.sinkcat.base", base)
    assert(spark.sql("SELECT conv_id FROM sinkcat.t").collect().map(_.getString(0)).toSeq
      == Seq("a"))
  }

  test("distribute=bucket clusters epochs: delta files per epoch == touched buckets") {
    val base = tmpDir("sinkd-tbl")
    val root = s"$base/t"
    val src = tmpDir("sinkd-src")
    val t = new LakeTable(root, numBuckets = 4)
    MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
      ev("seed", 0, "v", "2025-01-01 00:00:00", 1))).toDF(), "seed", 0L)
    spark.conf.set("spark.sql.catalog.distcat", classOf[graft.table.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.distcat.base", base)
    // 4 source FILES consumed in one epoch (maxFilesPerTrigger=4) → ≥4 input
    // partitions, each holding keys of every bucket: unshuffled this epoch
    // would write up to 4 × 4 delta files; clustered it must write exactly
    // the touched-bucket count
    (0 until 4).foreach { f =>
      writeFlatParquet(spark.createDataset((0 until 16).map(i =>
        ev(s"k${f}_$i", 0, s"v$i", "2025-01-01 00:10:00", 100L + f * 16 + i)))
        .toDF().drop("op"), src, s"c$f.parquet")
    }
    val before = t.currentSnapshot().get
    val nBefore = t.resolveFiles(before).values.flatten.size
    spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        Model.changeEventSchema.fields.filterNot(_.name == "op")))
      .option("maxFilesPerTrigger", 4)
      .parquet(src)
      .writeStream
      .option("checkpointLocation", tmpDir("sinkd-ckpt"))
      .option("distribute", "bucket")
      .trigger(Trigger.AvailableNow())
      .toTable("distcat.t")
      .awaitTermination()
    val after = t.currentSnapshot().get
    assert(after.version == before.version + 1, "one epoch, one commit")
    val touched = after.metrics("touchedBuckets")
    val added = t.resolveFiles(after).values.flatten.size - nBefore
    assert(added == touched,
      s"clustered epoch must write one file per touched bucket: added=$added touched=$touched")
    assert(t.read(spark).count() == 65L) // 64 sink rows + seed
  }

  test("sink rejects a stream missing or retyping a key/version column at plan time") {
    // a seq-less stream would COMMIT fine (the task writer never touches
    // seq) and then fail EVERY read/compaction on BucketLocal.keyIdx — the
    // sink must fail the query at plan time, before any file lands
    def startSink(df: org.apache.spark.sql.DataFrame, src: String, root: String,
        ckpt: String): Throwable = {
      df.write.parquet(src)
      val q = spark.readStream.schema(df.schema).parquet(src)
        .writeStream.format("lake").option("path", root)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination()
      }
    }
    val base = spark.createDataset(Seq(
      ev("c1", 0, "x", "2025-01-01 00:00:00", 1L))).toDF().drop("op")
    def seeded(name: String): LakeTable = {
      val t = new LakeTable(s"${tmpDir(name)}/t", numBuckets = 2)
      MergeApplier.applyBatch(spark, t, spark.createDataset(Seq(
        ev("seed", 0, "v0", "2025-01-01 00:00:00", 1))).toDF(), "seed", 0L)
      t
    }
    def msgChain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")

    val tA = seeded("sink-noseq")
    val vA = tA.currentSnapshot().get.version
    val eA = startSink(base.drop("seq"), s"${tmpDir("sink-noseq-src")}/src", tA.root,
      tmpDir("sink-noseq-ckpt"))
    assert(msgChain(eA).contains("seq"), msgChain(eA))
    assert(tA.currentSnapshot().get.version == vA, "nothing may commit")

    val tB = seeded("sink-retype")
    val vB = tB.currentSnapshot().get.version
    val eB = startSink(base.withColumn("turn_idx", col("turn_idx").cast("long")),
      s"${tmpDir("sink-retype-src")}/src", tB.root, tmpDir("sink-retype-ckpt"))
    assert(msgChain(eB).contains("turn_idx"), msgChain(eB))
    assert(tB.currentSnapshot().get.version == vB, "nothing may commit")
  }
}
