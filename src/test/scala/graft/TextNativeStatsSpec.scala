package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** The native text-stat kernels (TextExprs.*Nat — the r06 quality-filter
  * hot-path optimization) must be VALUE-IDENTICAL to the original Column
  * formulations they replaced, which Text.legacy* preserves verbatim.
  * Exercised on a corpus of hand-picked edge cases plus deterministic
  * pseudo-random strings over a whitespace/punct/digit/unicode alphabet.
  */
class TextNativeStatsSpec extends SparkSpecBase {
  import spark.implicits._

  private def corpus: Seq[String] = {
    val edges = Seq(
      null, "", " ", "   ", "\t", " \t ", "a", " a ", "a b", "a  b",
      "\ta", "a\t", "a\tb", "the", "THE", "The and of", "it IS that",
      "a\nbc\fd\re", "!!!", "a!b.c", "1 2 3", "...---",
      "héllo wörld", "日本語 テキスト", "mixed 日本 and ascii!",
      "the and", // NBSP is NOT regex \s — must stay one token
      "word " * 40, "the of to in and is it that for on with as at by or be",
      "S pUnCt:;@[`{~ mix")
    val rng = new scala.util.Random(20260822)
    val alphabet = "ab THE the\t\n.!?0189é中 ,;:~[]"
    val rand = (0 until 300).map { _ =>
      val len = rng.nextInt(80)
      (0 until len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }
    edges ++ rand
  }

  test("native kernels equal the legacy Column formulations on every row") {
    val df = corpus.toDF("text")
    val cmp = df.select(
      col("text"),
      Text.tokenCount(col("text")).as("n_tok"),
      Text.legacyTokenCount(col("text")).as("n_tok_l"),
      Text.meanTokenLen(col("text")).as("mtl"),
      Text.legacyMeanTokenLen(col("text")).as("mtl_l"),
      Text.punctRatio(col("text")).as("pr"),
      Text.legacyPunctRatio(col("text")).as("pr_l"),
      Text.alphaRatio(col("text")).as("ar"),
      Text.legacyAlphaRatio(col("text")).as("ar_l"),
      Text.stopwordRatio(col("text")).as("sr"),
      Text.legacyStopwordRatio(col("text")).as("sr_l"))
    val rows = cmp.collect()
    assert(rows.length == corpus.length)
    rows.foreach { r =>
      val t: String = if (r.isNullAt(0)) "null" else s"'${r.getString(0)}'"
      assert(r.isNullAt(1) == r.isNullAt(2), s"text=$t null-int")
      if (!r.isNullAt(1)) assert(r.getInt(1) == r.getInt(2), s"text=$t tokenCount")
      Seq((3, 4), (5, 6), (7, 8), (9, 10)).foreach { case (a, b) =>
        assert(r.isNullAt(a) == r.isNullAt(b), s"text=$t col#$a nullability")
        // exact double equality: both sides must be the SAME IEEE value,
        // or the hash-matched oracle gates would drift
        if (!r.isNullAt(a)) {
          assert(java.lang.Double.compare(r.getDouble(a), r.getDouble(b)) == 0,
            s"text=$t col#$a ${r.getDouble(a)} != col#$b ${r.getDouble(b)}")
        }
      }
    }
  }

  test("composite quality columns stay unchanged through the native kernels") {
    val df = corpus.toDF("text")
    // quality_keep / fail_reasons / score compose every kernel; spot-pin a
    // few known values so a sign/threshold slip cannot hide in equivalence
    val out = df.select(
      Text.qualityKeep(col("text")).as("keep"),
      concat_ws(",", Text.qualityFailReasons(col("text"))).as("why"),
      Text.qualityScore(col("text")).as("q")).collect()
    assert(out.length == corpus.length)
    val longDoc = "the cat sat on the mat and it is that good for all of us " * 3
    val r = spark.createDataset(Seq(longDoc)).toDF("text")
      .select(Text.qualityKeep(col("text")), Text.tokenCount(col("text"))).head()
    assert(r.getBoolean(0))
    assert(r.getInt(1) == 15 * 3) // 15 words per repetition of the sentence
  }
}
