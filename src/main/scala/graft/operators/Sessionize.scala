package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: split each key's event stream into sessions
  * wherever the inter-event gap exceeds a threshold — the canonical
  * event-analytics operator (user sessions, conversation episodes, device
  * activity bursts) and the batch twin of Structured Streaming's
  * `session_window` (which `streaming.WindowedStats` already covers for
  * the live path; this is the backfill/replay path over stored events).
  *
  * Plan shape: ONE shuffle+sort per key — the lag and the running sum use
  * different frames so Spark plans two WindowExec nodes, but they share
  * the same (key, ts) ordering, so the second adds no Sort and no Exchange
  * — then a hash aggregation for the per-session rollup. Linear in the data,
  * no self-join, no iteration; a hot key sorts on one reducer — the
  * windowed-operator contract, same as the as-of join.
  *
  * Determinism: session ids are (key, ordinal) pairs — dense, no RNG, no
  * monotonically_increasing_id (partitioning-dependent). Equal-timestamp
  * runs are safe without a tie-break: within a run exactly the FIRST row
  * (whichever it is) can carry a boundary flag, and every row of the run
  * accumulates the same flag total, so each row's session_idx is invariant
  * under permutation of ties. A gap EXACTLY equal to the threshold stays
  * in-session (`>` starts a new one); both conventions are mirrored in the
  * DuckDB oracle.
  */
object Sessionize {

  /** Assign a session ordinal to every event.
    *
    * @param events     input frame
    * @param keyCol     partition key (user / conversation / device)
    * @param tsCol      event-time timestamp column
    * @param gapSeconds max in-session gap in seconds
    * @return input columns + `session_idx` (0-based per key, LongType)
    */
  def assignSessions(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    require(gapSeconds > 0, s"gapSeconds must be positive: $gapSeconds")
    // exact integer microseconds (no second-truncation ambiguity across
    // engines); NTZ-tolerant cast as in RangeJoin
    val us = unix_micros(col(tsCol).cast("timestamp"))
    val byTs = Window.partitionBy(col(keyCol)).orderBy(col(tsCol).asc)
    val boundary = when(
      us - lag(us, 1).over(byTs) > gapSeconds * 1000000L, 1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(boundary).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: one row per (key, session_idx) with
    * session_start, session_end, duration_us (exact), n_events.
    */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long): DataFrame = {
    val us = unix_micros(col(tsCol).cast("timestamp"))
    assignSessions(events, keyCol, tsCol, gapSeconds)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        (max(us) - min(us)).as("duration_us"),
        count(lit(1)).as("n_events"))
  }
}
