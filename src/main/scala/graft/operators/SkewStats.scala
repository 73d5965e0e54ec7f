package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Key-distribution diagnostics: the operational input to every skew knob
  * this engine exposes (LWW salting in [[Lww]], `numBuckets` sizing, the
  * dedup bucket caps). A CDC operator watching a transcript firehose asks
  * exactly two questions — "which conversations are hot?" and "how skewed
  * is the key space overall?" — and both must be answerable WITHOUT a
  * global sort of the key counts.
  *
  * Plan shape: one map-side-combined hash aggregation to per-key counts
  * (the only data-sized pass), then top-k via `orderBy(...).limit(k)` —
  * Spark plans TakeOrderedAndProject, a per-partition heap + driver merge
  * of k rows, never a total-order shuffle — and the grand total rides a
  * broadcast one-row frame. The summary reduces the same counts frame to
  * ONE row with plain aggregates. Both outputs are O(k)/O(1); the inputs
  * to every step after the first aggregation are key-cardinality-sized.
  */
object SkewStats {

  private def keyCounts(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_rows"))

  /** Top-k hottest keys with their share of all rows. Deterministic
    * tie-break on the key itself; rank is dense over the k-row result
    * (single tiny partition — fine).
    */
  def topKeys(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"topKeys: k must be positive: $k")
    val top = keyCounts(df, keyCol)
      .orderBy(col("n_rows").desc, col(keyCol).asc)
      .limit(k)
    val total = df.agg(count(lit(1)).as("__total"))
    val w = Window.orderBy(col("n_rows").desc, col(keyCol).asc)
    top.crossJoin(broadcast(total))
      .withColumn("share", round(col("n_rows").cast("double") / col("__total"), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .drop("__total")
  }

  /** One-row skew summary over the key distribution: key cardinality, row
    * count, the hottest key's count and share, and the max/mean ratio (the
    * number a salting factor is chosen from). All integer or 6dp-rounded —
    * reproducible across engines.
    */
  def skewSummary(df: DataFrame, keyCol: String): DataFrame =
    keyCounts(df, keyCol).agg(
      count(lit(1)).as("n_keys"),
      sum(col("n_rows")).as("n_rows_total"),
      max(col("n_rows")).as("max_key_rows"),
      round(avg(col("n_rows")), 6).as("avg_key_rows"),
      round(max(col("n_rows")).cast("double") * count(lit(1)) / sum(col("n_rows")), 6)
        .as("skew_ratio"))
}
