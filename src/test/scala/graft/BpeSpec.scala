package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** BPE trainer/tokenizer vs an independent naive reference: the reference
  * recounts ALL pair statistics from scratch every iteration over the full
  * word list (no incremental updates, no index, no cap) — a different
  * algorithmic structure that must produce the identical merge sequence.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  /** Naive reference trainer: full recount per iteration. */
  private def naiveTrain(words: Seq[(String, Long)], numMerges: Int,
      minPairCount: Long = 2): Seq[(String, String)] = {
    var syms = words.map { case (w, f) => (w.map(_.toString).toVector :+ Bpe.Eow, f) }
    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var halt = false
    while (m < numMerges && !halt) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      syms.foreach { case (s, f) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.isEmpty) halt = true
      else {
        // same argmax rule: max count, ties -> lexicographically smallest
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < minPairCount) halt = true
        else {
          merges += best._1
          syms = syms.map { case (s, f) => (Bpe.mergeAll(s, best._1), f) }
          m += 1
        }
      }
    }
    merges.result()
  }

  private def corpusDf = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower newer newer newer newer newer newer"),
    (3L, "newest newest newest wider wider wider new new"),
    (4L, "lowest widest low newer")).toDF("doc_id", "text")

  private def corpusWords: Seq[(String, Long)] = Seq(
    "low" -> 6L, "lower" -> 2L, "newer" -> 7L, "newest" -> 3L,
    "wider" -> 3L, "new" -> 2L, "lowest" -> 1L, "widest" -> 1L)

  test("trainer matches the naive full-recount reference, merge for merge") {
    val got = Bpe.train(corpusDf, numMerges = 25).merges
    val want = naiveTrain(corpusWords, 25)
    assert(got == want, s"\ngot:  $got\nwant: $want")
    assert(got.nonEmpty && got.length <= 25)
  }

  test("left-to-right non-overlapping merge rule") {
    assert(Bpe.mergeAll(Vector("a", "a", "a"), ("a", "a")) == Vector("aa", "a"))
    assert(Bpe.mergeAll(Vector("a", "a", "a", "a"), ("a", "a")) == Vector("aa", "aa"))
    assert(Bpe.mergeAll(Vector("x", "a", "b", "a", "b"), ("a", "b")) ==
      Vector("x", "ab", "ab"))
    assert(Bpe.mergeAll(Vector("q"), ("a", "b")) == Vector("q"))
  }

  test("deterministic tie-break: equal counts pick the smallest pair") {
    // "ab" and "cd" each appear twice -> (a,b) wins over (c,d) and the
    // EOW pairs (b,</w>), (d,</w>) on the lexicographic rule.
    val df = Seq((1L, "ab ab cd cd")).toDF("doc_id", "text")
    val m = Bpe.train(df, numMerges = 1).merges
    assert(m == Seq(("a", "b")))
  }

  test("encodeWord: trained subwords round-trip and OOV chars pass through") {
    val model = Bpe.train(corpusDf, numMerges = 25)
    corpusWords.map(_._1).foreach { w =>
      val toks = Bpe.encodeWord(w, model.ranks)
      assert(toks.mkString.replace(Bpe.Eow, "") == w, s"round trip of $w: $toks")
    }
    // an unseen word with unseen chars degrades to char-level, never fails
    val oov = Bpe.encodeWord("zqx", model.ranks)
    assert(oov.mkString.replace(Bpe.Eow, "") == "zqx")
  }

  test("tokenize: distributed apply equals per-word encodeWord, in order") {
    val model = Bpe.train(corpusDf, numMerges = 10)
    val got = Bpe.tokenize(corpusDf, model).orderBy("doc_id", "pos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = corpusDf.collect().flatMap { r =>
      val id = r.getLong(0)
      r.getString(1).toLowerCase.trim.split("\\s+").toSeq
        .flatMap(w => Bpe.encodeWord(w, model.ranks))
        .zipWithIndex.map { case (t, i) => (id, i.toLong, t) }
    }.toSeq.sorted
    assert(got == want)
  }

  test("tokenize keeps the id column's input type (string ids)") {
    val df = Seq(("conv-a", "low low"), ("conv-b", "newer")).toDF("cid", "text")
    val model = Bpe.train(corpusDf, numMerges = 10)
    val got = Bpe.tokenize(df, model, idCol = "cid").orderBy("cid", "pos").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val want = Seq("conv-a" -> "low low", "conv-b" -> "newer").flatMap { case (id, t) =>
      t.split(" ").toSeq.flatMap(w => Bpe.encodeWord(w, model.ranks))
        .zipWithIndex.map { case (s, i) => (id, i.toLong, s) }
    }
    assert(got == want)
  }

  test("maxWords cap keeps the most frequent words deterministically") {
    // cap to 2 words: "newer" (7) and "low" (6) survive; merges must equal
    // training the naive reference on just those two.
    val got = Bpe.train(corpusDf, numMerges = 10, maxWords = 2).merges
    val want = naiveTrain(Seq("newer" -> 7L, "low" -> 6L), 10)
    assert(got == want)
  }

  test("minPairCount stops the loop before degenerate singleton merges") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(Bpe.train(df, numMerges = 10).merges.isEmpty) // every pair count 1
    assert(Bpe.train(df, numMerges = 10, minPairCount = 1).merges.nonEmpty)
  }

  test("randomized cross-check: trainer == naive reference on seeded corpora") {
    val rnd = new scala.util.Random(20260820L)
    (0 until 5).foreach { trial =>
      val vocabChars = "abcde"
      val nDocs = 12 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        val words = (0 to rnd.nextInt(8)).map { _ =>
          (0 to rnd.nextInt(5)).map(_ => vocabChars(rnd.nextInt(vocabChars.length))).mkString
        }
        (i.toLong, words.mkString(" "))
      }
      val df = docs.toDF("doc_id", "text")
      val wf = scala.collection.mutable.HashMap.empty[String, Long]
      docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
        .foreach(w => wf(w) = wf.getOrElse(w, 0L) + 1L)
      val nm = 5 + rnd.nextInt(25)
      val got = Bpe.train(df, numMerges = nm).merges
      val want = naiveTrain(wf.toSeq.sortBy(_._1), nm)
      assert(got == want, s"trial $trial (numMerges=$nm):\ngot:  $got\nwant: $want")
    }
  }

  test("pairCounts: single-char words pair with EOW; weights are freqs") {
    val words = Seq(("a", 3L), ("ab", 2L)).toDF("word", "freq")
    val got = Bpe.pairCounts(words).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(got == Map(("a", Bpe.Eow) -> 3L, ("a", "b") -> 2L, ("b", Bpe.Eow) -> 2L))
  }
}
