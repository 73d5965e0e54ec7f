package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation (the downsample-by-
  * language / quality-bucket step of corpus building).
  *
  * Keep a row iff the first 32 bits of md5(id) — uniform in [0, 2^32) —
  * fall below fraction(stratum) × 2^32. Properties that matter at 10^10
  * rows: NO RNG and NO state (reproducible across runs, engines,
  * partitionings and retries — a task recompute keeps the same rows, so
  * exactly-once sinks stay exact); a pure per-row filter (no shuffle, no
  * sort, embarrassingly parallel, fully pushdown-friendly); per-stratum
  * rates exact in expectation with 2^-32 granularity. The DuckDB oracle
  * evaluates the IDENTICAL predicate (standard md5), so the sample sets
  * match row-for-row, not just in size.
  *
  * Rows whose stratum has no configured fraction are DROPPED — sampling
  * selects what was asked for; pass fraction 1.0 to keep a stratum whole.
  */
object Sampling {
  /** The deterministic coin: first 32 bits of md5(salt || id), uniform in
    * [0, 2^32). Distinct salts give INDEPENDENT coins — operators that can
    * compose in one pipeline must not share a salt, or the downstream coin
    * is conditionally biased by the upstream filter (a stratified-sample
    * survivor has a small u by construction and would always win an
    * unsalted downstream remainder coin).
    */
  private def coinU(idCol: String, salt: String): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(salt), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long").cast("double")

  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
      stratumCol: String, idCol: String = "doc_id"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val frac = element_at(typedLit(fractions), col(stratumCol))
    docs.filter(coinU(idCol, "") < frac * lit(4294967296.0))
  }

  /** Balanced sample: EXACTLY min(k, |stratum|) rows per stratum, chosen by
    * md5-of-id order (deterministic, engine-reproducible, no RNG) with the
    * id as tie-break. The class-balancing step of corpus building when the
    * budget is a count, not a rate. One shuffle on the stratum + an
    * in-partition sort (the windowed-operator cost class); rank ≤ k prunes
    * before anything downstream. Per-stratum row counts must fit a
    * partition's sort — true by construction when k bounds what you keep,
    * and the heavy strata are exactly the ones being cut.
    *
    * The in-stratum rank is PART of the output contract (column `rk`,
    * 1-based in md5 order) — callers use it for further budget cuts without
    * re-windowing. An input that already carries `rk` fails loudly rather
    * than being silently overwritten.
    */
  def balancedSample(docs: DataFrame, k: Int, stratumCol: String,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(!docs.columns.contains("rk"),
      "balancedSample emits its rank as `rk`; rename the input's `rk` column first")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(stratumCol)
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
  }

  /** Target-MIXTURE sampling with upsampling epochs — the Pile/LLaMA
    * data-mixing step: `weights` are proportions of the OUTPUT (not keep
    * rates), `totalRows` the output budget, and the per-domain rate is
    * derived from the input histogram: rate(d) = totalRows·w(d)/count(d).
    * rate > 1 UPSAMPLES — every row emits floor(rate) copies plus one more
    * iff its md5 coin lands under the fractional remainder (LLaMA runs
    * Wikipedia ~2 epochs; this is that, made deterministic). Each copy
    * carries a 0-based `epoch` column so downstream shuffling/packing can
    * keep copies apart. Domains without a weight are dropped; weight 0
    * drops the domain exactly.
    *
    * Same md5-coin mechanism as [[stratifiedSample]] but SALTED ("mix:"),
    * so the two samplers compose: an unsalted remainder coin would be
    * conditionally biased on stratified-sample survivors (their u is small
    * by construction — every survivor would win the remainder copy and the
    * realized rate would overshoot). No RNG, retry-stable, engine-
    * reproducible row-for-row. The histogram pass is one hash agg
    * over the corpus; when the histogram is already known (the lake's
    * metadata COUNT pushdown serves per-table counts O(1), or a catalog
    * records it), pass it via `knownCounts` and the operator is a pure
    * per-row filter+explode — zero extra scans, zero joins, zero shuffles.
    */
  def mixtureSample(docs: DataFrame, weights: Map[String, Double],
      totalRows: Long, domainCol: String, idCol: String = "doc_id",
      knownCounts: Map[String, Long] = Map.empty): DataFrame = {
    require(weights.nonEmpty, "mixtureSample: weights must be non-empty")
    require(weights.values.forall(_ >= 0.0), s"weights must be >= 0: $weights")
    require(totalRows > 0, s"totalRows must be positive: $totalRows")
    require(!docs.columns.contains("epoch"),
      "mixtureSample emits its copy index as `epoch`; rename the input's `epoch` column first")
    require(knownCounts.isEmpty || weights.keySet.subsetOf(knownCounts.keySet),
      s"knownCounts is missing weighted domains ${weights.keySet -- knownCounts.keySet} — " +
        "a partial histogram would silently drop them")
    require(knownCounts.isEmpty ||
      weights.keySet.forall(d => knownCounts(d) > 0),
      s"knownCounts must be positive for every weighted domain (a stale zero " +
        s"count makes the rate infinite): " +
        s"${weights.keySet.filter(d => knownCounts.getOrElse(d, 1L) <= 0)}")
    val u = coinU(idCol, "mix:")
    val w = element_at(typedLit(weights), col(domainCol))
    val withRate =
      if (knownCounts.nonEmpty)
        docs.withColumn("__rate",
          lit(totalRows.toDouble) * w /
            element_at(typedLit(knownCounts), col(domainCol)).cast("double"))
      else {
        val rates = docs.groupBy(domainCol).agg(count(lit(1)).as("__dn"))
          .filter(w.isNotNull)
          .select(col(domainCol),
            (lit(totalRows.toDouble) * w / col("__dn").cast("double")).as("__rate"))
        docs.join(broadcast(rates), Seq(domainCol))
      }
    withRate
      .filter(col("__rate").isNotNull)
      .withColumn("__copies", floor(col("__rate")).cast("long") +
        when(u < (col("__rate") - floor(col("__rate"))) * lit(4294967296.0), 1L)
          .otherwise(0L))
      .filter(col("__copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__rate", "__copies")
  }
}
