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
  * and the stream handles only the near-time window. Duplicates arriving
  * AFTER the horizon re-emit by contract.
  */
object StreamingDedup {
  def firstSeen(docs: DataFrame, textCol: String = "text",
      tsCol: String = "ts", ttl: String = "1 hour"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, ttl)
      .dropDuplicatesWithinWatermark("text_hash")
}
