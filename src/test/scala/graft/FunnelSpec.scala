package graft

import graft.operators.Funnel
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Ordered funnel: out-of-order events don't count, ties convert, depth
  * and step counts agree.
  */
class FunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val events = Seq(
    // uA: full ordered funnel
    ("uA", ts("2025-01-01 10:00:00"), "signup"),
    ("uA", ts("2025-01-01 10:01:00"), "view"),
    ("uA", ts("2025-01-01 10:02:00"), "click"),
    ("uA", ts("2025-01-01 10:03:00"), "purchase"),
    // uB: click BEFORE its view — must not count; re-clicks after, converts
    ("uB", ts("2025-01-01 09:00:00"), "signup"),
    ("uB", ts("2025-01-01 09:01:00"), "click"),
    ("uB", ts("2025-01-01 09:02:00"), "view"),
    ("uB", ts("2025-01-01 09:05:00"), "click"),
    // uC: signup only
    ("uC", ts("2025-01-01 08:00:00"), "signup"),
    // uD: view+click but never signed up — not in the funnel at all
    ("uD", ts("2025-01-01 07:00:00"), "view"),
    ("uD", ts("2025-01-01 07:01:00"), "click"),
    // uE: view at EXACTLY signup time — tie converts
    ("uE", ts("2025-01-01 06:00:00"), "signup"),
    ("uE", ts("2025-01-01 06:00:00"), "view")
  ).toDF("uid", "t", "kind")

  private val steps = Seq("signup", "view", "click", "purchase")

  test("reach: order enforced, ties convert, missing steps are null") {
    val got = Funnel.funnelReach(events, "uid", "t", "kind", steps)
      .collect().map(r => r.getString(0) ->
        (Option(r.getTimestamp(1)).map(_.toString),
          Option(r.getTimestamp(2)).map(_.toString),
          Option(r.getTimestamp(3)).map(_.toString),
          Option(r.getTimestamp(4)).map(_.toString),
          r.getLong(5))).toMap
    assert(got.keySet == Set("uA", "uB", "uC", "uE")) // uD never reached step 0
    assert(got("uA") == (Some("2025-01-01 10:00:00.0"), Some("2025-01-01 10:01:00.0"),
      Some("2025-01-01 10:02:00.0"), Some("2025-01-01 10:03:00.0"), 4L))
    // uB's first VALID click is the 09:05 one (09:01 precedes the view)
    assert(got("uB") == (Some("2025-01-01 09:00:00.0"), Some("2025-01-01 09:02:00.0"),
      Some("2025-01-01 09:05:00.0"), None, 3L))
    assert(got("uC") == (Some("2025-01-01 08:00:00.0"), None, None, None, 1L))
    assert(got("uE")._2.contains("2025-01-01 06:00:00.0") && got("uE")._5 == 2L)
  }

  test("counts: monotone non-increasing and consistent with reach depths") {
    val counts = Funnel.funnelCounts(events, "uid", "t", "kind", steps)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(counts == Seq((0L, "signup", 4L), (1L, "view", 3L),
      (2L, "click", 2L), (3L, "purchase", 1L)))
    assert(counts.map(_._3) == counts.map(_._3).sorted.reverse, "funnel must be monotone")
  }
}
