package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join: for each left row, the most recent right row whose timestamp
  * is at-or-before the left row's (per join key) — the temporal lookup a
  * transcript/event pipeline constantly needs ("state of X when this turn
  * happened": latest profile version, last tool result, last page view
  * before the click).
  *
  * Spark has no asof operator (SPARK-22947 open since 2017); the naive
  * encodings are a non-equi range join (O(n·m) nested loop without an equi
  * key, and even with one, a hash join whose post-filter keeps ALL earlier
  * right rows then re-aggregates — the right side is re-materialized per
  * match) or a per-left-row correlated subquery (not expressible). This
  * implementation is the MERGE formulation instead: union the two sides
  * tagged, one window sort per key, and carry the latest right payload
  * forward with `last(..., ignoreNulls)` over a running frame. Cost is ONE
  * shuffle + sort of |L| + |R| rows — the same cost class as any windowed
  * operator on the key, linear in the data, no pair blowup, and the
  * map-side stays in whole-stage codegen (the window itself is Spark's
  * battle-tested WindowExec).
  *
  * Tie semantics: a right row AT the left row's timestamp wins (inclusive
  * `<=`, the asof convention — right rows sort before left rows at equal
  * ts). Multiple right rows sharing (key, ts) are resolved arbitrarily —
  * pre-deduplicate the right side (e.g. [[Lww.latestByKeyAgg]]) when that
  * matters, exactly as DuckDB/Pandas document for their ASOF joins.
  *
  * Skew: a hot key sorts on one reducer — the window operator's contract.
  * For adversarially hot keys, pre-aggregate the right side per (key,
  * coarse time bucket) first; the left side is never expanded.
  */
object AsofJoin {

  /** Left as-of join.
    *
    * @param left      probe side; ALL its columns survive
    * @param right     build side; only `rightCols` survive, each prefixed
    * @param keys      equality keys present on both sides
    * @param leftTs    left timestamp column name
    * @param rightTs   right timestamp column name
    * @param rightCols right columns to carry (must not include keys)
    * @param prefix    output prefix for carried right columns
    * @return left.columns ++ rightCols.map(prefix + _), right cols null
    *         where no right row is at-or-before the left row
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(rightCols.nonEmpty, "asofJoin: rightCols must be non-empty")
    require(!rightCols.exists(keys.contains),
      s"asofJoin: rightCols must not include join keys $keys")
    val leftCols = left.columns.toSeq
    // one merged frame: keys, event time, side tag, carried right payload as
    // ONE struct (null on left rows), left payload struct (null on right
    // rows). The payload must travel as a single struct so `last(...,
    // ignoreNulls)` picks the whole matched right ROW atomically: per-column
    // carries would skip a null VALUE in the matched row and back-fill it
    // from an older row — emitting a mix of right rows that never coexisted.
    // A right row whose carried values are all null still forms a non-null
    // struct, so it correctly shadows older rows with nulls.
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTs).as("__t"), lit(0).as("__side"),
          struct(rightCols.map(col): _*).as("__r")): _*)
    val l = left.select(
      keys.map(col) ++
        Seq(col(leftTs).as("__t"), lit(1).as("__side"),
          struct(leftCols.map(col): _*).as("__l"),
          lit(null).cast(r.schema("__r").dataType).as("__r")): _*)
    val rTagged = r.withColumn("__l", lit(null).cast(l.schema("__l").dataType))
    // right-before-left at equal __t ⇒ inclusive asof (<=)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(rTagged)
      .select(col("__side"), col("__l"),
        last(col("__r"), ignoreNulls = true).over(w).as("__rm"))
    filled.filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightCols.map(c => col(s"__rm.$c").as(s"$prefix$c")): _*)
  }
}
