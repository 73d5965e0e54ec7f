package graft

import graft.operators.SkewStats
import org.apache.spark.sql.functions._

/** Hot-key diagnostics: hand-pinned top-k (tie-break, shares, rank) and
  * summary; plan shape — the top-k must be a TakeOrderedAndProject, never
  * a global Sort+Exchange of the counts frame.
  */
class SkewStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private val rows = (Seq.fill(5)("hot") ++ Seq.fill(3)("warm") ++
    Seq.fill(3)("warm2") ++ Seq("cold")).toDF("k")

  test("topKeys: counts, deterministic tie-break, share, rank") {
    val got = SkewStats.topKeys(rows, "k", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("hot", 5L, 0.416667, 1L), // round(5/12, 6)
      ("warm", 3L, 0.25, 2L),    // ties break on key asc: warm before warm2
      ("warm2", 3L, 0.25, 3L)))
  }

  test("skewSummary: one row, exact fields") {
    val r = SkewStats.skewSummary(rows, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == (4L, 12L, 5L))
    assert(r.getDouble(3) == 3.0)      // avg rows per key
    assert(r.getDouble(4) == 1.666667) // round(max/avg, 6)
  }

  test("plan: top-k is TakeOrdered, not a global sort of the counts") {
    val big = spark.range(10000).select((col("id") % 97).cast("string").as("k"))
    val df = SkewStats.topKeys(big, "k", 5)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must plan as TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"top-k must not global-sort the counts frame:\n$plan")
  }
}
