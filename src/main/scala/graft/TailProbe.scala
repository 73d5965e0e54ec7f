package graft

import graft.changelog.Generator
import graft.streaming.CdcStream
import graft.table.LakeTable
import org.apache.spark.sql.SparkSession

/** Tail-throughput diagnosis: run the streaming tail over a synthetic
  * changelog and decompose per-batch time from the committed snapshots'
  * phase metrics (metaMs / durationMs). The residual between the
  * stream's wall time and Σ durationMs is Structured Streaming trigger
  * overhead (offset WAL, file listing, commit log).
  *
  * Usage: runMain graft.TailProbe [events] [chunks] [chunksPerTrigger] [mode] [cpus] [partsPerChunk]
  */
object TailProbe {
  def main(args: Array[String]): Unit = {
    val events = args.headOption.map(_.toLong).getOrElse(5000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(10)
    val chunksPerTrigger = args.lift(2).map(_.toInt).getOrElse(2)
    val mode = args.lift(3).getOrElse("cow")
    val cpus = args.lift(4).map(_.toInt)
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val parts = args.lift(5).map(_.toInt).getOrElse(16)
    val mft = chunksPerTrigger * parts
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tailprobe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MPB", "134217728"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "8")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString
    val src = tmp("tailprobe-src")
    Generator.writeChangelog(spark, src, events, math.max(1000, (events / 200).toInt),
      turnsPerConv = 25, numFiles = files, seed = 555, partsPerChunk = parts)

    // warmup pass (smaller) to load codegen/classes
    val wsrc = tmp("tailprobe-wsrc")
    Generator.writeChangelog(spark, wsrc, events / 10, math.max(100, (events / 2000).toInt),
      turnsPerConv = 25, numFiles = files, seed = 99, partsPerChunk = parts)
    CdcStream.runAvailableNow(spark, wsrc, new LakeTable(tmp("tailprobe-wtab"), 32),
      tmp("tailprobe-wckpt"), maxFilesPerTrigger = mft, mode = mode)

    val table = new LakeTable(tmp("tailprobe-table"), 32)
    val t0 = System.nanoTime()
    CdcStream.runAvailableNow(spark, src, table, tmp("tailprobe-ckpt"),
      maxFilesPerTrigger = mft, mode = mode)
    val wall = (System.nanoTime() - t0) / 1e9
    var sumApply = 0L
    table.versions().foreach { v =>
      val s = table.snapshotAt(v).get
      println(s"v$v: ${s.metrics.toSeq.sortBy(_._1).map { case (k, x) => s"$k=$x" }.mkString(" ")}")
      sumApply += s.metrics.getOrElse("durationMs", 0L)
    }
    println(f"mode=$mode wall=$wall%.2fs applySum=${sumApply / 1000.0}%.2fs " +
      f"streamOverhead=${wall - sumApply / 1000.0}%.2fs thr=${(events / wall).toLong} ev/s")
    spark.stop()
  }
}
