package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * filter (Wenzek et al., LREC 2020: score web text under an LM trained on
  * a clean reference corpus; keep the low-perplexity head). The smoothing
  * is Stupid Backoff (Brants et al., EMNLP 2007 "Large Language Models in
  * Machine Translation") — THE distributed-by-construction LM: scores are
  * plain count ratios with a fixed backoff penalty, so training is nothing
  * but gram counting (two hash aggregations) and scoring is joins — no
  * iterative discount estimation, which is exactly why it was built for
  * MapReduce-scale corpora and why it fits a Spark plan with no custom
  * state at all.
  *
  *   S(w | prev) = c(prev,w) / c(prev)        if c(prev,w) > 0
  *               = alpha * S(w)               otherwise
  *   S(w)        = c(w) / N                   if c(w) > 0
  *               = alpha / N                  otherwise (OOV floor)
  *
  * Per document: log10-prob = Σ log10 S(token_i | token_{i-1}) (the first
  * token scores as a unigram), cross-entropy ce = -log10-prob / n_tokens,
  * perplexity = 10^ce. The keep decision is `ce <= threshold` — CCNet's
  * head/middle/tail split is two such thresholds.
  *
  * Scale design (the 100-TB story):
  *   - TRAIN is two exploded hash-aggregations over the reference corpus
  *     (unigram and bigram counts, map-side combined) plus a 1-row total.
  *     `minCount` pruning drops the Zipf tail — the step that turns a
  *     corpus-sized gram table into a model that BROADCASTS (CCNet's
  *     trained model is a few GB pruned; a 10M-gram pruned table is tens
  *     of MB as (gram, count) pairs). Train once, persist, reuse across
  *     scoring runs — never retrain per batch.
  *   - SCORE: with `broadcastLm` (the default, and the production shape)
  *     the corpus side NEVER shuffles — tokens explode inside the scan
  *     stage, the three LM lookups are broadcast hash joins, and the only
  *     exchange is the final per-document aggregation (map-side combined).
  *     With `broadcastLm = false` the lookups become shuffle joins on the
  *     gram key — the escape hatch for an unpruned LM too big to ship.
  *   - Pruning coherence: c_uni(prev) >= c_bi(prev, w) for every w, so a
  *     bigram that survives `minCount` always finds its surviving context
  *     count — the ratio's denominator cannot have been pruned away.
  *
  * Tokenization is the engine's standard: whitespace split of
  * lower(trim(text)); rows with empty trimmed text are skipped (they have
  * no tokens to score). Matches [[graft.functions.Text]] and the DuckDB
  * oracle mirror (`regexp_split_to_array(trim(lower(text)), '\s+')`).
  *
  * Reference scope: the reference pipeline has no model-based quality
  * filter (its filters are structural — `docs/Architecture.md`); this is
  * part of the beyond-reference training-data curation surface.
  */
object NgramLm {

  /** Trained bigram Stupid-Backoff model: pruned gram-count tables plus the
    * 1-row token total. All three are plain DataFrames — persist them as
    * parquet/lake tables and reload for scoring; nothing is driver-side.
    *
    * @param unigrams (g: string, c_uni: long), c_uni >= minCount
    * @param bigrams  (p: string, g: string, c_bi: long), c_bi >= minCount
    * @param total    single row (n_total: long) — ALL train tokens, counted
    *                 before pruning (the unigram denominator)
    */
  final case class LmModel(unigrams: DataFrame, bigrams: DataFrame,
      total: DataFrame)

  private def tokens(textCol: Column): Column =
    split(lower(trim(textCol)), "\\s+")

  /** Train the bigram model on a reference corpus. Two exploded
    * hash-aggregations + a 1-row count; `minCount` prunes both tables.
    */
  def trainBigram(train: DataFrame, textCol: String = "text",
      minCount: Int = 1): LmModel = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val toks = Par.spread(train)
      .filter(length(trim(col(textCol))) > 0)
      .select(tokens(col(textCol)).as("__toks"))

    val exploded = toks.select(explode(col("__toks")).as("g"))
    val uni = exploded.groupBy("g")
      .agg(count(lit(1)).as("c_uni"))
      .filter(col("c_uni") >= minCount)
    // bigram (prev, cur) via posexplode against the kept array — no window,
    // no shuffle before the count agg.
    val bi = toks
      .select(col("__toks"), posexplode(col("__toks")).as(Seq("__pos", "g")))
      .filter(col("__pos") > 0)
      // element_at is 1-based, __pos is 0-based: toks[__pos] == previous.
      .select(element_at(col("__toks"), col("__pos")).as("p"), col("g"))
      .groupBy("p", "g")
      .agg(count(lit(1)).as("c_bi"))
      .filter(col("c_bi") >= minCount)
    val total = exploded.agg(count(lit(1)).as("n_total"))
    LmModel(uni, bi, total)
  }

  /** Score every document under the model; returns
    * (idCol, n_tokens, log10_prob, ce, keep). `ce` is per-token
    * cross-entropy in log10 (perplexity = 10^ce); `keep` is
    * `ce <= ceThreshold` — the CCNet-style head cut.
    */
  def scoreStupidBackoff(docs: DataFrame, model: LmModel,
      idCol: String = "doc_id", textCol: String = "text",
      alpha: Double = 0.4, ceThreshold: Double = 3.0,
      broadcastLm: Boolean = true): DataFrame = {
    val ship: DataFrame => DataFrame =
      if (broadcastLm) broadcast else identity
    val toks = Par.spread(docs)
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), col("__toks"),
        posexplode(col("__toks")).as(Seq("__pos", "__g")))
      .select(col(idCol), col("__pos"), col("__g"),
        when(col("__pos") > 0, element_at(col("__toks"), col("__pos")))
          .as("__p"))

    val uniCur = ship(model.unigrams.select(col("g").as("__g"),
      col("c_uni").as("__c_cur")))
    val uniCtx = ship(model.unigrams.select(col("g").as("__p"),
      col("c_uni").as("__c_ctx")))
    val bi = ship(model.bigrams.select(col("p").as("__p"),
      col("g").as("__g"), col("c_bi").as("__c_bi")))
    val total = broadcast(model.total)

    // empty-reference guard (advisor r05): n_total = 0 would divide every
    // unigram leg by zero and silently emit Infinity/NaN scores — fail
    // loudly instead, in-plan (no extra driver action)
    val n = when(col("n_total") > 0, col("n_total").cast("double"))
      .otherwise(raise_error(lit(
        "NgramLm: reference corpus is empty (n_total = 0) — " +
          "train on a non-empty corpus")).cast("double"))
    // unigram leg: seen -> c/N, OOV -> alpha/N; first token pays no backoff.
    val uniScore = when(col("__c_cur").isNotNull,
      col("__c_cur").cast("double") / n).otherwise(lit(alpha) / n)
    val score = when(col("__c_bi").isNotNull,
      col("__c_bi").cast("double") / col("__c_ctx").cast("double"))
      .otherwise(when(col("__p").isNotNull, lit(alpha)).otherwise(lit(1.0)) *
        uniScore)

    toks
      .join(bi, Seq("__p", "__g"), "left")
      .join(uniCtx, Seq("__p"), "left")
      .join(uniCur, Seq("__g"), "left")
      .crossJoin(total)
      .select(col(idCol), log10(score).as("__lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lp")).as("__sum_lp"))
      .select(col(idCol), col("n_tokens"),
        round(col("__sum_lp"), 4).as("log10_prob"),
        round(-col("__sum_lp") / col("n_tokens"), 4).as("ce"))
      .withColumn("keep", col("ce") <= ceThreshold)
  }
}
