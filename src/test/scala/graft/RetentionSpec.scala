package graft

import graft.operators.Retention

import java.sql.Timestamp

/** Cohort retention: hand-pinned matrix (cohort = first-activity day,
  * multiple same-day events collapse, percentages against the offset-0
  * cell) on a tiny fixture where the truth is enumerable.
  */
class RetentionSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("matrix: cohorts, offsets, dedup within a day, percentages") {
    // day numbers: 2025-01-01 = 20089 (epoch days)
    val ev = Seq(
      // cohort day0: u1 active d0,d1,d2 — two events on d1 collapse to one
      ("u1", ts("2025-01-01 09:00:00")),
      ("u1", ts("2025-01-02 10:00:00")),
      ("u1", ts("2025-01-02 23:00:00")),
      ("u1", ts("2025-01-03 01:00:00")),
      // cohort day0: u2 active d0 only
      ("u2", ts("2025-01-01 18:00:00")),
      // cohort day1: u3 active d1, d2
      ("u3", ts("2025-01-02 00:30:00")),
      ("u3", ts("2025-01-03 12:00:00"))
    ).toDF("uid", "t")
    val d0 = 20089L
    val got = Retention.cohortRetention(ev, "uid", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      (d0, 0L) -> (2L, 100.0),      // u1, u2
      (d0, 1L) -> (1L, 50.0),       // u1
      (d0, 2L) -> (1L, 50.0),       // u1
      (d0 + 1, 0L) -> (1L, 100.0),  // u3
      (d0 + 1, 1L) -> (1L, 100.0))) // u3
  }

  test("offset-0 cell counts the whole cohort (invariant)") {
    val ev = Seq(
      ("a", ts("2025-03-01 00:00:00")), ("a", ts("2025-03-05 00:00:00")),
      ("b", ts("2025-03-01 12:00:00")), ("c", ts("2025-03-02 12:00:00")))
      .toDF("uid", "t")
    val rows = Retention.cohortRetention(ev, "uid", "t").collect()
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (_, cells) =>
      val zero = cells.find(_.getLong(1) == 0L)
      assert(zero.isDefined, "every cohort must have an offset-0 cell")
      assert(zero.get.getDouble(3) == 100.0)
      cells.foreach(c => assert(c.getLong(2) <= zero.get.getLong(2),
        "no offset can exceed the cohort size"))
    }
  }
}
