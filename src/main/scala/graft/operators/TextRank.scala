package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-relevance scoring for training-data curation — rank documents
  * against a small bag of probe terms (the standard way to skim topical
  * slices out of a web-scale corpus before expensive model-based filters).
  *
  * Scale design: everything is expression + hash-aggregation work.
  *   - token traversal is O(corpus tokens), the same cost class as reading
  *     the text at all; the probe-term filter collapses it to O(matching
  *     postings) before any shuffle
  *   - document frequencies aggregate the (doc, term) postings — bounded by
  *     |terms| rows out, joined back by a shuffle-or-AQE-broadcast join on
  *     term (|terms| is small by contract, but nothing here FORCES a driver
  *     broadcast)
  *   - corpus statistics (N, avgdl) are ONE row, combined via an explicit
  *     1-row broadcast — never a driver collect
  */
object TextRank {

  /** Okapi BM25 (Robertson/Sparck Jones idf with the +1 floor — the Lucene
    * variant, non-negative for any df): for document d and term t,
    *
    *   idf(t)   = ln((N - df + 0.5) / (df + 0.5) + 1)
    *   w(t, d)  = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
    *   bm25(d)  = Σ_t∈terms w(t, d)
    *
    * Tokenization is the engine's standard whitespace split over
    * lower(trim(text)) (empty tokens dropped), so scores line up with
    * [[graft.functions.Text]] token counts. Documents matching NO probe
    * term are omitted (score 0 — the output is the matching slice, which at
    * corpus scale is the point: the result is O(hits), not O(corpus)).
    */
  def bm25(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
      textCol: String = "text", k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one probe term")
    // terms are interpolated into the stack() expression string below: a
    // quote would close the literal and a trailing backslash would escape
    // the closing quote (escapedStringLiterals=false), so both are rejected
    require(terms.forall(t => !t.contains("'") && !t.contains("\\")),
      s"probe terms must be plain tokens (no quotes or backslashes): $terms")
    // ONE tokenization pass, materialized narrow: dl and every per-term tf
    // are computed as expressions over the token array in a single codegen
    // projection (no explode — per-row O(tokens × |terms|) compute in place
    // beats generating O(corpus tokens) rows), and the (2 + |terms|)-column
    // result is checkpointed so the stats / postings / df branches below
    // read the materialization instead of re-scanning + re-tokenizing the
    // corpus per branch (the naive plan scans the text column 4×).
    val w = filter(split(lower(trim(col(textCol))), "\\s+"), t => length(t) > 0)
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(col("w"), x => x === lit(t))).cast("long").as(s"tf_$i") }
    val base = Par.spread(docs).select(col(idCol).as("id"), w.as("w"))
      .select(col("id") +: size(col("w")).as("dl") +: tfCols: _*)
      .localCheckpoint(true)
    // one row; explicit broadcast — corpus stats never hit the driver
    val stats = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    // unpivot the tf columns back to (term, tf) postings; docs without a
    // term carry tf 0 and drop here — the output is O(hits), not O(corpus)
    val stackExpr = terms.zipWithIndex
      .map { case (t, i) => s"'${t}', tf_$i" }.mkString(", ")
    val tf = base
      .select(col("id"), col("dl"),
        expr(s"stack(${terms.length}, $stackExpr) AS (term, tf)"))
      .filter(col("tf") > 0)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0))
      .withColumn("wgt",
        col("idf") * col("tf") * (k1 + 1.0) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id").as(idCol))
      .agg(round(sum("wgt"), 6).as("bm25"))
  }
}
