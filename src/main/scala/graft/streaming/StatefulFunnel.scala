package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Live funnel tracking over the event stream — the streaming twin of
  * [[graft.operators.Funnel]] (batch): per key, advance through an ordered
  * step sequence and emit a progress row whenever the key's funnel DEPTH
  * increases (an append-mode change feed of conversions; for transcripts:
  * "this conversation just reached tool-call → tool-result → resolution").
  *
  * Semantics: GREEDY ADVANCE — an event counts for step i only when it is
  * the next expected step and its event time is at-or-after the previous
  * step's reach time (ties convert, mirroring the batch operator's `>=`).
  * Within a micro-batch, a key's events are processed in (ts, step-index)
  * order, so intra-batch disorder is repaired for free; ACROSS batches the
  * operator is exact whenever each key's events arrive in event-time order
  * (the common per-key-ordered CDC delivery). Under cross-batch disorder it
  * degrades monotonically (a late earlier event cannot retro-improve an
  * already-advanced funnel) — exact retro-repair would require retaining
  * every rejected event per step, an unbounded state footprint; batch
  * [[graft.operators.Funnel.funnelReach]] over the stored table is the
  * exact replay for that regime (same split as StatefulLww vs the MERGE
  * path: low-latency feed vs stored-state truth).
  *
  * State per key: one Array[Long] of reach micros (k entries) — O(keys ×
  * steps), independent of event count.
  */
object StatefulFunnel {

  final case class FunnelEvent(key: String, tsMicros: Long, step: String)

  /** Depth change: the key, its new depth (1..k), the reach time (micros)
    * of each reached step so far. (Array, not Seq: Spark's product-encoder
    * codegen mishandles immutable.Seq fields in the state store path.)
    */
  final case class FunnelProgress(key: String, depth: Int, reachMicros: Array[Long])

  /** Internal per-key state (public: encoder codegen must reach it). */
  final case class FunnelState(reach: Array[Long])

  def progress(events: Dataset[FunnelEvent], steps: Seq[String]): Dataset[FunnelProgress] = {
    require(steps.nonEmpty && steps.distinct == steps, s"bad steps: $steps")
    implicit val progEnc = Encoders.product[FunnelProgress]
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val keyEnc = Encoders.STRING
    val stepIdx = steps.zipWithIndex.toMap
    events.groupByKey(_.key)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, batch, state: GroupState[FunnelState]) =>
          val reach = state.getOption.map(_.reach.clone())
            .getOrElse(Array.fill(steps.size)(Long.MinValue))
          var depth = reach.indexOf(Long.MinValue) match {
            case -1 => steps.size
            case d => d
          }
          val depth0 = depth
          // (ts, step-index) order: intra-batch disorder repaired; a
          // same-ts (prev step, next step) pair converts — the batch `>=`
          val evs = batch.flatMap(e => stepIdx.get(e.step).map(i => (e.tsMicros, i)))
            .toArray.sortInPlaceBy(identity)
          evs.foreach { case (t, i) =>
            if (i == depth && (depth == 0 || t >= reach(depth - 1))) {
              reach(depth) = t
              depth += 1
            }
          }
          state.update(FunnelState(reach))
          if (depth > depth0)
            Iterator(FunnelProgress(key, depth, reach.take(depth)))
          else Iterator.empty
      }
  }
}
