package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort retention analysis: group keys by their first-activity day (the
  * cohort), then count how many of each cohort's keys are active again k
  * days later — the third leg of the event-analytics trio next to
  * [[Sessionize]] and [[Funnel]] (for transcripts: of the conversations
  * that started on day D, how many were still receiving turns on D+k).
  *
  * Day arithmetic is exact integer division of epoch microseconds (no
  * timezone, no calendar functions), so Spark and external engines compute
  * bit-identical day numbers.
  *
  * Plan shape: distinct active (key, day) pairs (one hash aggregation),
  * cohort day as a per-key window min (ONE shuffle on key, no join —
  * the aggregated frame is already one row per (key, day)), then a hash
  * aggregation to the (cohort, offset) matrix. The matrix itself is tiny
  * (days²), so the final percentage window costs nothing. No step is
  * proportional to anything but the distinct activity set — at 10^10
  * events the first aggregation's map-side combine collapses per-day
  * duplicates before the only data-sized shuffle.
  */
object Retention {

  private final val MicrosPerDay = 86400000000L

  /** Retention matrix: one row per (cohort_day, day_offset) with the number
    * of distinct keys active at that offset and the retention percentage
    * relative to the cohort's size (its offset-0 cell, which by
    * construction counts every key of the cohort).
    *
    * @param events input frame
    * @param keyCol cohort subject (user / conversation)
    * @param tsCol  event-time column
    * @return cohort_day (epoch days, long), day_offset (long), n_active
    *         (long), retention_pct (double, 6dp)
    */
  def cohortRetention(events: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val day = floor(unix_micros(col(tsCol).cast("timestamp")) / MicrosPerDay).cast("long")
    val acts = events.select(col(keyCol).as("__k"), day.as("__day"))
      .groupBy("__k", "__day").agg(count(lit(1))).select("__k", "__day")
    val withCohort = acts.withColumn("cohort_day",
      min(col("__day")).over(Window.partitionBy(col("__k"))))
    val cells = withCohort
      .groupBy(col("cohort_day"), (col("__day") - col("cohort_day")).as("day_offset"))
      .agg(count(lit(1)).as("n_active")) // rows are distinct (key, day) pairs
    // cohort size = the offset-0 cell; matrix is days² rows, window is free
    val byCohort = Window.partitionBy(col("cohort_day"))
    cells.withColumn("retention_pct",
      round(col("n_active").cast("double") * 100.0 /
        max(when(col("day_offset") === 0, col("n_active"))).over(byCohort), 6))
  }
}
