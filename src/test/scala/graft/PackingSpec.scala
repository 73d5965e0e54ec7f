package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._

import scala.util.Random

/** Greedy sequence packing: pinned bin rule (new bin when non-empty bin
  * would overflow; oversized doc = own bin), invariance under input
  * partitioning, and parity with an independent in-memory greedy fold.
  */
class PackingSpec extends SparkSpecBase {
  import spark.implicits._

  test("bin rule: fill, overflow boundary, oversized singleton") {
    // one group so the scan order is just doc_id order
    val docs = Seq(
      (1L, 100L), (2L, 100L), (3L, 56L), // fills bin 0 exactly (256)
      (4L, 1L),                          // bin 1
      (5L, 300L),                        // oversized: own bin 2 (offset 0)
      (6L, 200L), (7L, 57L)              // 6 → bin 3; 7 overflows → bin 4
    ).toDF("doc_id", "toks")
    val got = Packing.packGreedy(docs, "doc_id", "toks", budgetTokens = 256, numGroups = 1)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      1L -> (0L, 0L), 2L -> (0L, 100L), 3L -> (0L, 200L),
      4L -> (1L, 0L),
      5L -> (2L, 0L),
      6L -> (3L, 0L), 7L -> (4L, 0L)))
  }

  test("random corpus: parity with an in-memory greedy fold; partitioning-invariant") {
    val rnd = new Random(7)
    val docs = (1L to 500L).map(id => (id, 1L + rnd.nextInt(400).toLong))
    val df = docs.toDF("doc_id", "toks")
    val budget = 512L
    val groups = 4

    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(d, "doc_id", "toks", budget, groups)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

    val got = run(df)
    assert(got == run(df.repartition(13, col("toks"))), "partitioning must not matter")

    // independent oracle: group by the same md5 shard, sort by id, fold
    def md5Group(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % groups
    }
    val expect = docs.groupBy { case (id, _) => md5Group(id) }.flatMap {
      case (g, ds) =>
        var bin = 0L; var used = 0L
        ds.sortBy(_._1).map { case (id, t) =>
          if (used > 0 && used + t > budget) { bin += 1; used = 0 }
          val off = used; used += t
          (g, id, t, bin, off)
        }
    }.toSet
    assert(got == expect)
  }

  test("packStats: fill rates bounded and consistent") {
    val docs = (1L to 200L).map(id => (id, 50L)).toDF("doc_id", "toks")
    val stats = Packing.packStats(docs, "doc_id", "toks", budgetTokens = 256, numGroups = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    stats.foreach { case (_, _, nDocs, nToks, fill) =>
      assert(nDocs <= 5L, "a 6th 50-token doc would overflow 256")
      assert(nToks == nDocs * 50)
      assert(fill == BigDecimal(nToks.toDouble / 256)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // every bin except each group's LAST is full (greedy never skips)
    val lastBin = stats.groupBy(_._1).map { case (g, bs) => g -> bs.map(_._2).max }
    stats.foreach { case (g, bin, nDocs, _, _) =>
      if (bin < lastBin(g)) assert(nDocs == 5L, s"non-final bin $bin of group $g not full")
    }
    assert(stats.map(_._3).sum == 200L, "every doc lands in exactly one bin")
  }
}
