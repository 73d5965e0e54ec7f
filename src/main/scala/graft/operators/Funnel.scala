package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: for each key, the earliest time every step of
  * an ordered event sequence is reached, where step i counts only at-or-
  * after step i-1's reach time (the product-analytics "conversion funnel";
  * for transcripts: did the conversation reach tool-call → tool-result →
  * resolution, and when).
  *
  * Formulation: k chained per-key aggregations — step i is one filtered
  * scan (`type = steps(i)`) aggregated to min-ts-after-prev per key, LEFT
  * joined onto the running frame (keys that never reach a step carry nulls
  * forward and never match later steps, since `ts >= null` is null). All
  * joins and aggregations share the SAME key, so after the first shuffle
  * every stage is co-partitioned (AQE plans them without re-exchanging a
  * side that is already hashed on the key); k is small and fixed — the
  * funnel definition — so the chain is k map-side-filtered passes over the
  * events, never a per-key sort or a collect_list that would buffer a hot
  * key's whole history.
  *
  * Tie semantics: a step at EXACTLY the previous step's reach time counts
  * (`>=`) — simultaneous view+click converts; mirrored in the oracle.
  */
object Funnel {

  /** @param events  input frame
    * @param keyCol  funnel subject (user / conversation)
    * @param tsCol   event-time column
    * @param typeCol event-type column
    * @param steps   ordered step types (≥ 1)
    * @return one row per key that reached step 0: key, `ts_<step>` per
    *         step (null = never reached), `funnel_depth` (1..k)
    */
  def funnelReach(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelReach: steps must be non-empty")
    require(steps.distinct == steps, s"funnelReach: duplicate steps in $steps")
    def tsName(s: String) = s"ts_$s"
    val head = events.filter(col(typeCol) === steps.head)
      .groupBy(col(keyCol)).agg(min(col(tsCol)).as(tsName(steps.head)))
    val reach = steps.zip(steps.drop(1)).foldLeft(head) { case (frame, (prev, st)) =>
      val stepAgg = events.filter(col(typeCol) === st)
        .select(col(keyCol).as("__k"), col(tsCol).as("__t"))
      frame.join(stepAgg,
          frame(keyCol) === col("__k") && col("__t") >= frame(tsName(prev)), "left")
        .groupBy(frame.columns.map(frame(_)): _*)
        .agg(min(col("__t")).as(tsName(st)))
    }
    val depth = steps.map(s => when(col(tsName(s)).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    reach.withColumn("funnel_depth", depth.cast("long"))
  }

  /** Step-level rollup: one row per step with the number of keys that
    * reached it — the classic funnel chart input. Computed from ONE
    * [[funnelReach]] pass; counts are monotonically non-increasing.
    */
  def funnelCounts(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    val reach = funnelReach(events, keyCol, tsCol, typeCol, steps)
    val perStep = steps.zipWithIndex.map { case (s, i) =>
      sum(when(col(s"ts_$s").isNotNull, 1L).otherwise(0L))
        .as(s"n_$i") -> ((i.toLong, s)) }
    val agg = reach.agg(perStep.head._1, perStep.tail.map(_._1): _*).collect().head
    val spark = events.sparkSession
    import spark.implicits._
    steps.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, Option(agg.getAs[java.lang.Long](s"n_$i")).map(_.toLong).getOrElse(0L))
    }.toDF("step_idx", "step", "n_keys")
  }
}
