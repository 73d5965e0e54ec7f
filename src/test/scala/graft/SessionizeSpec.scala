package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Gap-based sessionization: hand-pinned semantics (boundary convention,
  * ties, threshold-exact gaps) and the one-window plan shape.
  */
class SessionizeSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessions split on gap > threshold; exact-threshold gap stays in-session") {
    val ev = Seq(
      ("u1", ts("2025-01-01 10:00:00")),
      ("u1", ts("2025-01-01 10:10:00")), // 600s — in-session
      ("u1", ts("2025-01-01 10:40:00")), // 1800s exactly — stays (> rule)
      ("u1", ts("2025-01-01 11:40:01")), // 3601s — new session
      ("u2", ts("2025-01-01 10:00:00"))
    ).toDF("uid", "t")
    val got = Sessionize.assignSessions(ev, "uid", "t", gapSeconds = 1800)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(got == Set(
      ("u1", "2025-01-01 10:00:00.0", 0L),
      ("u1", "2025-01-01 10:10:00.0", 0L),
      ("u1", "2025-01-01 10:40:00.0", 0L),
      ("u1", "2025-01-01 11:40:01.0", 1L),
      ("u2", "2025-01-01 10:00:00.0", 0L)))

    val stats = Sessionize.sessionStats(ev, "uid", "t", 1800)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5))).toSet
    // (uid, session_idx, duration_us, n_events)
    assert(stats == Set(
      ("u1", 0L, 2400L * 1000000, 3L),
      ("u1", 1L, 0L, 1L),
      ("u2", 0L, 0L, 1L)))
  }

  test("equal-timestamp runs share a session regardless of tie order") {
    val ev = Seq(
      ("u", ts("2025-01-01 10:00:00"), "a"),
      ("u", ts("2025-01-01 12:00:00"), "b"), // new session boundary
      ("u", ts("2025-01-01 12:00:00"), "c"), // tied with the boundary row
      ("u", ts("2025-01-01 12:00:00"), "d")
    ).toDF("uid", "t", "tag")
    val idx = Sessionize.assignSessions(ev, "uid", "t", 1800)
      .collect().map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(idx == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
  }

  test("plan: lag and running sum share ONE sort and ONE exchange") {
    val ev = spark.range(1000).select(
      (col("id") % 50).cast("string").as("uid"),
      timestamp_micros(col("id") * 100000000L).as("t"))
    val df = Sessionize.assignSessions(ev, "uid", "t", 1800)
    df.collect() // materialize so AQE finalizes the physical plan
    // string-count: AQE query-stage wrappers hide children from collect()
    val lines = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
    val sorts = lines.count(_.matches(""".*\bSort \[.*"""))
    val exchanges = lines.count(_.contains("Exchange hashpartitioning"))
    val windows = lines.count(_.matches(""".*\bWindow \[.*"""))
    assert(sorts == 1, s"the two window frames must share one sort:\n${lines.mkString("\n")}")
    assert(exchanges == 1, s"sessionize must cost exactly one exchange:\n${lines.mkString("\n")}")
    assert(windows == 2, s"expected the lag and running-sum windows:\n${lines.mkString("\n")}")
  }
}
