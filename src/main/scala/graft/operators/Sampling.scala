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
  def stratifiedSample(docs: DataFrame, fractions: Map[String, Double],
      stratumCol: String, idCol: String = "doc_id"): DataFrame = {
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      s"fractions must be in [0,1]: $fractions")
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("long").cast("double")
    val frac = element_at(typedLit(fractions), col(stratumCol))
    docs.filter(u < frac * lit(4294967296.0))
  }
}
