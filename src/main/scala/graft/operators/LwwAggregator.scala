package graft.operators

import graft.model.ChangeEvent
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed LWW as an `Aggregator` (SURVEY §2.11 — the reference's custom
  * Redis max-version aggregate, SpecialCases.java:221-227, as a first-class
  * Dataset UDAF): usable with `groupByKey(...).agg(LwwAggregator.latest)`
  * and in streaming `flatMapGroupsWithState` reducers.
  *
  * The DataFrame `max_by` path (Lww.latestByKeyAgg) remains the default —
  * this typed form exists for Dataset-API users and as the reduce function
  * of the stateful-streaming variant.
  */
object LwwAggregator extends Aggregator[ChangeEvent, ChangeEvent, ChangeEvent] {

  private def newer(a: ChangeEvent, b: ChangeEvent): ChangeEvent = {
    if (a == null) return b
    if (b == null) return a
    val c = a.ts.compareTo(b.ts)
    if (c > 0 || (c == 0 && a.seq >= b.seq)) a else b
  }

  override def zero: ChangeEvent = null
  override def reduce(buf: ChangeEvent, e: ChangeEvent): ChangeEvent = newer(buf, e)
  override def merge(a: ChangeEvent, b: ChangeEvent): ChangeEvent = newer(a, b)
  override def finish(r: ChangeEvent): ChangeEvent = r
  override def bufferEncoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]
  override def outputEncoder: Encoder[ChangeEvent] = Encoders.product[ChangeEvent]

  /** The typed column: `ds.groupByKey(e => (e.conv_id, e.turn_idx)).agg(latest)`. */
  def latest: org.apache.spark.sql.TypedColumn[ChangeEvent, ChangeEvent] = toColumn
}
