package graft

import graft.operators.TextRank

/** Okapi BM25 semantics on a hand corpus (the sf-scale parity with DuckDB is
  * the text_bm25 oracle gate; this pins the formula and edge cases).
  */
class TextRankSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "apple cherry"),
    (3L, "durian durian durian"),
    (4L, "kiwi mango")
  ).toDF("doc_id", "text")

  test("bm25 matches the closed-form Okapi formula") {
    val got = TextRank.bm25(corpus, Seq("apple", "durian"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N = 4, avgdl = (3+2+3+2)/4 = 2.5, df(apple) = 2, df(durian) = 1
    def w(tf: Long, df: Long, dl: Long): Double = {
      val idf = math.log((4.0 - df + 0.5) / (df + 0.5) + 1.0)
      idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.5))
    }
    assert(got.keySet == Set(1L, 2L, 3L)) // kiwi/mango doc matches nothing
    assert(math.abs(got(1L) - w(2, 2, 3)) < 1e-6)
    assert(math.abs(got(2L) - w(1, 2, 2)) < 1e-6)
    assert(math.abs(got(3L) - w(3, 1, 3)) < 1e-6)
    // rarer term outweighs the commoner one at equal tf/dl
    assert(got(3L) > got(1L))
  }

  test("bm25 tokenization matches the engine's whitespace convention") {
    val messy = Seq((1L, "  Apple\tAPPLE  "), (2L, "apple")).toDF("doc_id", "text")
    val got = TextRank.bm25(messy, Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) > got(2L)) // tf 2 beats tf 1 at comparable dl
  }
}
