package graft

/** Physical-plan shape of the round-5 curation gates — pins the exchange
  * economics the operators claim, on the real sf0.001 tables:
  *
  *  - `text_repetition` / `mm_decode_wav`: per-row expression pipelines that
  *    must stay in the scan's stage — ZERO exchanges.
  *  - `cdc_conv_quality`: the replay fold pays its one (conv_id, turn_idx)
  *    exchange; the role-alternation lag window and the per-conversation agg
  *    must then SHARE a single conv_id exchange (2 total, not 3).
  *  - `text_decontaminate`: the benchmark grams BROADCAST; the corpus side
  *    must never sort-merge — its only exchange is the final per-doc agg
  *    (plus the distinct on the tiny benchmark side before broadcast).
  */
class CurationPlanSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"

  private def planLines(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
  }
  private def exchanges(lines: Seq[String]): Int =
    lines.count(_.contains("Exchange hashpartitioning"))

  test("text_repetition is shuffle-free (scan-stage expressions only)") {
    val lines = planLines("text_repetition")
    assert(exchanges(lines) == 0, lines.mkString("\n"))
  }

  test("mm_decode_wav is shuffle-free (encode+decode stay per-row)") {
    val lines = planLines("mm_decode_wav")
    assert(exchanges(lines) == 0, lines.mkString("\n"))
  }

  test("cdc_conv_quality: lag window and conversation agg share one exchange") {
    val lines = planLines("cdc_conv_quality")
    // replay fold = 1 exchange on (conv_id, turn_idx); window+agg = 1 shared
    // exchange on conv_id. A third exchange means the agg re-shuffled what
    // the window already partitioned.
    assert(exchanges(lines) == 2, lines.mkString("\n"))
    assert(lines.count(_.matches(""".*\bWindow \[.*""")) == 1, lines.mkString("\n"))
  }

  test("text_exact_substr: bounded exchanges (gram agg+join, one shared id lineage), no cartesian") {
    val lines = planLines("text_exact_substr")
    // Worst case at scale: 2 gram exchanges (dup agg + window side of the
    // hit join) and 2 id exchanges (island window; base side of the final
    // join). The island window, the (id, island) agg and the per-id agg
    // must all SHARE the window's id partitioning — a 5th exchange means
    // one of them re-shuffled it. AQE may broadcast the small sides at
    // test scale (fewer exchanges is fine; more is the regression).
    assert(exchanges(lines) <= 4, lines.mkString("\n"))
    // prev-end max and island running-sum are two Window nodes SHARING the
    // one id partitioning (back to back, no exchange between them)
    assert(lines.count(_.matches(""".*\bWindow \[.*""")) == 2, lines.mkString("\n"))
    assert(!lines.exists(_.contains("CartesianProduct")), lines.mkString("\n"))
  }

  test("text_decontaminate: benchmark grams broadcast, corpus never sort-merges") {
    val lines = planLines("text_decontaminate")
    assert(lines.exists(_.contains("BroadcastHashJoin")), lines.mkString("\n"))
    assert(!lines.exists(_.contains("SortMergeJoin")), lines.mkString("\n"))
    // benchmark-side distinct + final per-doc agg — the corpus pays exactly
    // one exchange, after the (map-side combinable) partial count.
    assert(exchanges(lines) == 2, lines.mkString("\n"))
  }
}
