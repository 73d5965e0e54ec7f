package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data preparation: place documents into
  * fixed-token-budget bins (context windows) with a deterministic greedy
  * fill — the step between a curated corpus and a pretraining dataloader.
  *
  * Greedy packing is inherently sequential (each bin boundary depends on
  * the running remainder), so it cannot be a window expression; the scale
  * design is to SHARD the sequential scan: documents hash into `numGroups`
  * independent pack groups (md5-derived — engine-reproducible, no RNG),
  * and each group is packed by one linear pass in deterministic doc-id
  * order. Groups are the parallelism unit: pick numGroups ≳ cluster cores;
  * packing quality is unaffected because bins never span groups by design
  * (a dataloader shard maps to a group).
  *
  * Plan shape: ONE shuffle (repartition by group) + an in-partition sort
  * (narrow, spills to disk) + a streaming O(1)-state `mapPartitions` scan
  * (the documented last-resort tier: per-partition imperative logic that
  * expressions cannot express). Each partition holds whole groups in
  * (group, id) order, so the scan is deterministic regardless of input
  * partitioning. No collect, no per-group buffering.
  *
  * Bin rule: a new bin starts when the bin is non-empty and adding the next
  * document would exceed `budgetTokens`; a document alone larger than the
  * budget occupies its own bin (truncation is the tokenizer's job, not the
  * packer's — the oversized bin is visible downstream via bin_offset 0 +
  * n_tokens > budget).
  */
object Packing {

  /** Assign every document a (group_id, bin_idx, bin_offset).
    *
    * @param docs         input frame
    * @param idCol        document id (orders the greedy scan)
    * @param tokensCol    per-document token count (any numeric type)
    * @param budgetTokens bin capacity in tokens
    * @param numGroups    independent pack shards (parallelism unit)
    * @return group_id, <idCol>, n_tokens, bin_idx, bin_offset (all long
    *         except idCol, which keeps its input type)
    */
  def packGreedy(docs: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, numGroups: Int): DataFrame = {
    require(budgetTokens > 0, s"packGreedy: budgetTokens must be positive: $budgetTokens")
    require(numGroups > 0, s"packGreedy: numGroups must be positive: $numGroups")
    // md5-derived 32-bit group key, mirrored verbatim by external engines
    // (same construction as Sampling.stratifiedSample): value ∈ [0, 2^32) so
    // plain % is already non-negative
    val groupId = (conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8),
      16, 10).cast("long") % numGroups).as("group_id")
    val prep = docs
      .select(groupId, col(idCol), coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens"))
      .repartition(col("group_id"))
      .sortWithinPartitions(col("group_id"), col(idCol))
    val outSchema = prep.schema.add("bin_idx", LongType).add("bin_offset", LongType)
    val budget = budgetTokens
    prep.mapPartitions { rows =>
      // streaming state: (current group, bin, used) — O(1) memory
      var group: Any = null
      var started = false
      var bin = 0L
      var used = 0L
      rows.map { r =>
        val g = r.get(0)
        if (!started || g != group) { group = g; started = true; bin = 0L; used = 0L }
        val t = r.getLong(2)
        if (used > 0 && used + t > budget) { bin += 1; used = 0L }
        val offset = used
        used += t
        Row.fromSeq(r.toSeq :+ bin :+ offset)
      }
    }(Encoders.row(outSchema))
  }

  /** Per-(group, bin) rollup: document count, token fill, fill rate against
    * the budget — the packing-efficiency report (mean fill rate is the
    * headline number of a packing strategy).
    */
  def packStats(docs: DataFrame, idCol: String, tokensCol: String,
      budgetTokens: Long, numGroups: Int): DataFrame =
    packGreedy(docs, idCol, tokensCol, budgetTokens, numGroups)
      .groupBy(col("group_id"), col("bin_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        round(sum(col("n_tokens")).cast("double") / budgetTokens, 6).as("fill_rate"))
}
