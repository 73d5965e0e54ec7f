package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RANGE (interval) join: points joined to the windows containing them —
  * `w.start <= p.ts < w.end` — with NO equality key. Spark plans a pure
  * range predicate as BroadcastNestedLoopJoin (O(|P|·|W|) comparisons, and
  * a full cartesian when neither side is broadcastable): the classic
  * scale cliff.
  *
  * This is the BINNED equi-join formulation instead (the published
  * interval-join technique used by Flink's interval join and Spark range
  * join accelerators): quantize time into fixed bins, explode each window
  * to the bins it overlaps, map each point to its single bin, equi-join on
  * the bin, and re-check the exact predicate. Because a point lives in
  * exactly ONE bin, every qualifying (point, window) pair meets in exactly
  * one join row — no duplicate elimination pass. Cost: shuffle of
  * |P| + |W|·(avg window span / bin) rows on a well-distributed key, a
  * hash join, and a codegen'd residual filter — survives sides that are
  * both too big to broadcast.
  *
  * Bin sizing: `binMicros` ≈ the typical window length keeps the window
  * expansion factor ≤ 2 while keeping each bin's population small; the
  * expansion is the only tuning knob and is visible as the exploded row
  * count. Degenerate skew (one bin holding everything — all windows
  * overlapping one instant) degrades to the per-bin nested loop, never to
  * a global cartesian.
  */
object RangeJoin {

  /** Join `points` to every window of `windows` containing them.
    *
    * @param points    point side; `pointTs` is a timestamp column
    * @param pointTs   point timestamp column name
    * @param windows   interval side with [startTs, endTs) timestamp columns;
    *                  empty/negative windows are dropped (contain nothing)
    * @param binMicros bin width in microseconds (≈ typical window length)
    * @return points.columns ++ windows.columns (names must be disjoint),
    *         one row per (point, containing window) — an inner join
    */
  def rangeJoin(points: DataFrame, pointTs: String, windows: DataFrame,
      startTs: String, endTs: String, binMicros: Long): DataFrame = {
    require(binMicros > 0, "rangeJoin: binMicros must be positive")
    val overlap = points.columns.toSet.intersect(windows.columns.toSet)
    require(overlap.isEmpty,
      s"rangeJoin: column names must be disjoint, both sides have $overlap")
    // NTZ-tolerant epoch micros: unix_micros demands TIMESTAMP; a
    // TIMESTAMP_NTZ column (parquet's usual flavor) casts through the
    // session zone, identically on every use here, so bin and predicate
    // stay consistent
    def micros(c: String) = unix_micros(col(c).cast("timestamp"))
    val p = points.withColumn("__bin", floor(micros(pointTs) / binMicros))
    // end is EXCLUSIVE: the last covered instant is end-1μs, so the bin
    // sequence is floor(start/B)..floor((end-1)/B); windows with end<=start
    // cover nothing and are dropped before sequence() can see a reversed
    // range (its default step would silently walk backwards)
    val w = windows
      .filter(micros(endTs) > micros(startTs))
      .withColumn("__bin", explode(sequence(
        floor(micros(startTs) / binMicros),
        floor((micros(endTs) - 1) / binMicros))))
    p.join(w, Seq("__bin"))
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bin")
  }
}
