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

  test("text_decontaminate: benchmark grams broadcast, corpus never sort-merges") {
    val lines = planLines("text_decontaminate")
    assert(lines.exists(_.contains("BroadcastHashJoin")), lines.mkString("\n"))
    assert(!lines.exists(_.contains("SortMergeJoin")), lines.mkString("\n"))
    // benchmark-side distinct + final per-doc agg — the corpus pays exactly
    // one exchange, after the (map-side combinable) partial count.
    assert(exchanges(lines) == 2, lines.mkString("\n"))
  }
}
