package graft.changelog

import graft.model.{ChangeEvent, Model}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Seeded synthetic changelog generator for engine tests and throughput
  * benchmarks (the correctness-gate queries instead derive their changelog
  * from the driver's events.parquet — see [[Changelog]]).
  *
  * Properties exercised:
  *   - zipf-skewed hot conversations (north_rule skew handling)
  *   - out-of-order event time: `ts` is decorrelated from arrival order `seq`
  *   - duplicate keys (multiple versions per (conv_id, turn_idx))
  *   - ~10% deletes, with late stale inserts that must NOT resurrect them
  *   - additive schema evolution: events before `evolveAt` lack the `tool`
  *     column (v1 schema), later ones carry it
  *
  * Generation is distributed: `spark.range` → expression pipeline, no driver
  * materialization — the same generator scales to 10^10 rows on a cluster.
  */
object Generator {

  /** Deterministic pseudo-random column in [0,1) from (seed, i). */
  private def rnd(i: org.apache.spark.sql.Column, seed: Long, salt: Int) =
    pmod(xxhash64(i, lit(seed), lit(salt)), lit(1000000L)).cast("double") / 1000000.0

  def events(spark: SparkSession, n: Long, numConvs: Int, turnsPerConv: Int,
      seed: Long = 42L, zipfSkew: Double = 3.0,
      baseTs: String = "2025-01-01 00:00:00"): DataFrame = {
    val ids = spark.range(0, n, 1, spark.sparkContext.defaultParallelism)
    val i = col("id")
    // zipf-ish conversation pick: u^skew concentrates mass near conv 0.
    val u = rnd(i, seed, 1)
    val conv = floor(pow(u, lit(zipfSkew)) * numConvs).cast("int")
    val turn = pmod(xxhash64(i, lit(seed), lit(2)), lit(turnsPerConv)).cast("int")
    val opR = rnd(i, seed, 3)
    // ts: event time scrambled against arrival order (seq = i): each event's
    // ts is base + (i jittered by ±window), producing genuine out-of-order.
    val jitter = (rnd(i, seed, 4) * 2000000.0 - 1000000.0).cast("long")
    val tsSec = greatest(i + jitter, lit(0L))
    ids.select(
      concat(lit("conv_"), conv.cast("string")).as("conv_id"),
      turn.as("turn_idx"),
      when(pmod(i, lit(2)) === 0, lit("user")).otherwise(lit("assistant")).as("role"),
      concat(lit("text of conv "), conv.cast("string"), lit(" turn "),
        turn.cast("string"), lit(" v"), i.cast("string")).as("text"),
      when(rnd(i, seed, 5) < 0.3,
        element_at(array(lit("search"), lit("browser"), lit("python")),
          (pmod(xxhash64(i, lit(seed), lit(6)), lit(3)) + 1).cast("int")))
        .otherwise(lit(null).cast("string")).as("tool"),
      (to_timestamp(lit(baseTs)) + make_dt_interval(lit(0), lit(0), lit(0),
        tsSec.cast("double"))).as("ts"),
      when(opR < 0.10, lit(Model.OpDelete))
        .when(opR < 0.30, lit(Model.OpUpdate))
        .otherwise(lit(Model.OpInsert)).as("op"),
      i.as("seq"))
  }

  /** Write a changelog as `numFiles` arrival chunks of parquet under `dir`,
    * ordered by seq ranges (arrival order) — the stream tail consumes them
    * as the binlog. Events with seq < evolveAt are written WITHOUT the
    * `tool` column (schema v1); later files carry the evolved schema.
    *
    * `partsPerChunk` controls the PHYSICAL file count per arrival chunk
    * (chunk f → chunk_f_pNNN.parquet × parts). A real binlog tail at 10^10
    * scale pulls many files per trigger, so the merge's map side has natural
    * parallelism; a miniature with one fat file per chunk would starve the
    * batch scan to partsPerChunk map tasks (parquet files with a single row
    * group do not split) and measure the miniature, not the engine.
    */
  def writeChangelog(spark: SparkSession, dir: String, n: Long, numConvs: Int,
      turnsPerConv: Int, numFiles: Int, seed: Long = 42L,
      evolveAt: Long = -1L, partsPerChunk: Int = 1): Unit = {
    val ev = events(spark, n, numConvs, turnsPerConv, seed)
    val perFile = math.max(1L, n / numFiles)
    val fileId = least(floor(col("seq") / perFile), lit(numFiles - 1)).cast("int")
    val withFile = ev.withColumn("__file", fileId)
    import java.nio.file.{Files, Paths, StandardCopyOption}
    Files.createDirectories(Paths.get(dir))
    (0 until numFiles).foreach { f =>
      val lo = f * perFile
      val slice = withFile.filter(col("__file") === f).drop("__file")
      val out = if (evolveAt >= 0 && lo + perFile <= evolveAt) slice.drop("tool") else slice
      // flat files named in arrival order so the file source tails them
      // deterministically (lexicographic = seq order; parts of a chunk sort
      // inside their chunk)
      val tmp = s"$dir/.tmp_$f"
      (if (partsPerChunk == 1) out.coalesce(1) else out.repartition(partsPerChunk))
        .write.mode("overwrite").parquet(tmp)
      var p = 0
      sortedParquet(tmp).foreach { part =>
        Files.move(part, Paths.get(f"$dir/chunk_$f%05d_p$p%03d.parquet"),
          StandardCopyOption.REPLACE_EXISTING)
        p += 1
      }
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  /** Parquet part files of a write dir, name-sorted (deterministic rename). */
  private def sortedParquet(dir: String): Seq[java.nio.file.Path] = {
    val s = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(_.getFileName.toString.endsWith(".parquet"))
        .toSeq.sortBy(_.getFileName.toString)
    } finally s.close()
  }

  /** The oracle: an in-memory fold of the changelog in (ts, seq) LWW order —
    * independent of the engine (no window, no max_by). Small inputs only.
    */
  def oracleFold(events: Seq[ChangeEvent]): Map[(String, Int), ChangeEvent] =
    events.groupBy(e => (e.conv_id, e.turn_idx)).map { case (k, es) =>
      k -> es.maxBy(e => (e.ts.getTime, e.seq))
    }.filter { case (_, e) => e.op != Model.OpDelete }
}
