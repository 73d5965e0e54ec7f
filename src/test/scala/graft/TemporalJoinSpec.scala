package graft

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** As-of join (merge formulation) and range join (binned equi-join):
  * semantics pinned against hand-computed truths, plus the plan-shape
  * invariants that make them scale (no nested-loop/cartesian join in the
  * physical plan).
  */
class TemporalJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asof join: latest at-or-before per key, inclusive ties, null when none") {
    val left = Seq(
      ("u1", ts("2025-01-01 10:00:05"), "l1"),
      ("u1", ts("2025-01-01 10:00:10"), "l2"),
      ("u1", ts("2025-01-01 09:59:00"), "l0"), // before any right row
      ("u2", ts("2025-01-01 10:00:10"), "l3"), // tie with right at same ts
      ("u3", ts("2025-01-01 10:00:10"), "l4")  // key with no right rows
    ).toDF("uid", "ts", "tag")
    val right = Seq(
      ("u1", ts("2025-01-01 10:00:00"), 1.0),
      ("u1", ts("2025-01-01 10:00:07"), 2.0),
      ("u2", ts("2025-01-01 10:00:10"), 3.0)
    ).toDF("uid", "ts", "v")
    val out = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", "ts", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") ->
        Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)).toMap
    assert(out == Map(
      "l0" -> None,          // nothing at-or-before
      "l1" -> Some(1.0),     // 10:00:00 is latest ≤ 10:00:05
      "l2" -> Some(2.0),     // 10:00:07 supersedes
      "l3" -> Some(3.0),     // equal ts: right row wins (inclusive)
      "l4" -> None))         // no right rows for u3
    // all left rows survive (left join), all left columns intact
    val full = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", "ts", Seq("v"))
    assert(full.count() == 5 && full.columns.toSeq ==
      Seq("uid", "ts", "tag", "asof_v"))
  }

  test("asof join: matched row's nulls survive; multi-column payload from ONE right row") {
    // right at 10:00:07 carries (v=null, w="late"): the as-of match for a
    // left row at 10:00:08 is THAT row, so asof_v must be null — never
    // back-filled from the older (v=1.0, w="early") row — and asof_w must be
    // "late" (both carried columns from the same matched row, not a mix)
    val left = Seq(("u1", ts("2025-01-01 10:00:08"), "probe")).toDF("uid", "ts", "tag")
    val right = Seq(
      ("u1", ts("2025-01-01 10:00:00"), Some(1.0), "early"),
      ("u1", ts("2025-01-01 10:00:07"), None: Option[Double], "late")
    ).toDF("uid", "ts", "v", "w")
    val row = AsofJoin.asofJoin(left, right, Seq("uid"), "ts", "ts", Seq("v", "w"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("asof_v")),
      "null value in the matched right row must NOT be back-filled from a stale row")
    assert(row.getAs[String]("asof_w") == "late",
      "all carried columns must come from the single matched right row")
  }

  test("asof join: equals a per-row max-ts subquery on random data; plan has no NL join") {
    val n = 2000
    val left = spark.range(n).select(
      concat(lit("k"), (col("id") % 37).cast("string")).as("k"),
      timestamp_micros(col("id") * 1000001L + 17).as("ts"),
      col("id").as("lid"))
    val right = spark.range(n / 2).select(
      concat(lit("k"), (col("id") % 41).cast("string")).as("k"),
      timestamp_micros(col("id") * 2000003L + 11).as("ts"),
      col("id").as("rv"))
    val out = AsofJoin.asofJoin(left, right, Seq("k"), "ts", "ts", Seq("rv"))
    // oracle: windowless correlated lookup via join + groupBy max
    val truth = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.lid").as("lid"))
      .agg(max_by(col("r.rv"), col("r.ts")).as("rv"))
    val got = out.select(col("lid"), col("asof_rv")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val want = truth.collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == want)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"asof join must not plan a nested-loop/cartesian join:\n$plan")
  }

  test("range join: binned plan equals the naive predicate join; exactly-one-match per pair") {
    val pts = spark.range(500).select(col("id").as("pid"),
      timestamp_micros(col("id") * 7000003L).as("pts"))
    val wins = spark.range(80).select(col("id").as("wid"),
      timestamp_micros(col("id") * 41000007L).as("ws"),
      timestamp_micros(col("id") * 41000007L + 90L * 1000000).as("we"))
    val binned = RangeJoin.rangeJoin(pts, "pts", wins, "ws", "we",
      binMicros = 60L * 1000000)
    val naive = pts.join(wins, col("pts") >= col("ws") && col("pts") < col("we"))
    val got = binned.select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = naive.select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "each qualifying pair must appear exactly once")
    assert(got.sorted.toSeq == want.sorted.toSeq)
    // scale shape: an equi (hash/sort-merge) join on the bin, never NL
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must plan an equi join on the bin:\n$plan")
  }

  test("range join: boundary semantics [start, end) and empty/degenerate windows") {
    val pts = Seq((1L, ts("2025-01-01 10:00:00")), (2L, ts("2025-01-01 10:02:00")))
      .toDF("pid", "pts")
    val wins = Seq(
      (10L, ts("2025-01-01 10:00:00"), ts("2025-01-01 10:02:00")), // [incl, excl)
      (11L, ts("2025-01-01 10:01:00"), ts("2025-01-01 10:01:00")), // empty
      (12L, ts("2025-01-01 10:03:00"), ts("2025-01-01 10:02:00"))  // reversed
    ).toDF("wid", "ws", "we")
    val got = RangeJoin.rangeJoin(pts, "pts", wins, "ws", "we", 60L * 1000000)
      .select("pid", "wid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L))) // start inclusive, end exclusive, bad windows dropped
  }
}
