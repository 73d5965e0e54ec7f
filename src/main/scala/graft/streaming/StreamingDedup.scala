package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication of a document feed: emit each distinct
  * content ONCE; duplicates arriving within `ttl` of the first sighting are
  * dropped. The training-data `Dedup.exact` operator, re-expressed for the
  * ingest tail (crawl mirrors and re-posts arrive close together in time).
  *
  * Built from Spark primitives (`dropDuplicatesWithinWatermark`), not custom
  * state — preference order (a): compose existing ops. The state store
  * holds one (content hash → sighting) entry per distinct document inside
  * the TTL horizon and the ENGINE evicts it as the watermark passes, so
  * state is horizon-sized, not corpus-sized — at 10^10 docs a corpus-wide
  * exact-dedup state store would itself be a 10^10-row table, which is
  * exactly why full-history dedup stays a batch pass ([[graft.operators.Dedup.exact]])
  * and the stream handles only the near-time window.
  *
  * Completeness contract (standard watermark semantics — know it before
  * wiring this into an ingest DAG):
  *   - a duplicate arriving AFTER the horizon re-emits (state was evicted);
  *   - a row arriving with event time older than the current watermark —
  *     duplicate or NOVEL — is dropped by the engine before the dedup state
  *     is consulted and never appears in the output. Size `ttl` to at least
  *     the max expected source lag (a backfilled partition lagging > ttl
  *     loses its novel documents from this VIEW), and treat the raw feed,
  *     not this stream's output, as the source of truth the batch dedup
  *     pass runs over.
  *
  * The output schema equals the input schema (the content hash is an
  * internal column, dropped on the way out).
  */
object StreamingDedup {
  def firstSeen(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", ttl: String = "1 hour"): DataFrame = {
    val hashCol = "__graft_text_hash"
    docs
      .withColumn(hashCol, md5(col(textCol)))
      .withWatermark(tsCol, ttl)
      .dropDuplicatesWithinWatermark(hashCol)
      .drop(hashCol)
  }
}
