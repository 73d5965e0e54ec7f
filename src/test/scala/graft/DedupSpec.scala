package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  test("exact-substring stats: corpus-duplicated windows, island merge, within-doc repeats, short docs") {
    // k=3. Duplicated windows across this corpus: "a b c" (d1@0, d2@1,
    // d4@0), "b c d" (d1@1, d2@2); d7 is pure WITHIN-doc repetition
    // ("m n o" x3 etc); d8/d9 pin the adjacent-islands arithmetic
    // ("q1 q2 q3" and "q4 q5 q6" both shared, hits at d8@{0,3} exactly
    // adjacent); d5 is shorter than k (no windows at all).
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "p q r"),
      (4L, "A B C"), // lowercases to the duplicated window
      (5L, "zz"),
      (7L, "m n o m n o m n o"),
      (8L, "q1 q2 q3 q4 q5 q6 tail1"),
      (9L, "q1 q2 q3 zz1 zz2 q4 q5 q6 zz3")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrStats(corpus, k = 3, maxDupFrac = 0.2)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Double]("dup_frac"),
          r.getAs[Boolean]("keep")))).toMap
    // d1: hits at 0,1 -> merged [0,4) = 4 tokens covered
    assert(got(1L) == ((6L, 2L, 4L, 0.666667, false)))
    // d2: hits at 1,2 -> merged [1,5)
    assert(got(2L) == ((6L, 2L, 4L, 0.666667, false)))
    // d3: no duplicated windows
    assert(got(3L) == ((3L, 0L, 0L, 0.0, true)))
    // d4: the whole doc is one duplicated window (case-folded)
    assert(got(4L) == ((3L, 1L, 3L, 1.0, false)))
    // d5: shorter than k -> zero windows, kept
    assert(got(5L) == ((1L, 0L, 0L, 0.0, true)))
    // d7: every window repeats within the doc -> full coverage [0,9)
    assert(got(7L) == ((9L, 7L, 9L, 1.0, false)))
    // d8: hits at 0 and 3 -> [0,3) and [3,6) ADJACENT: covered 6 of 7
    assert(got(8L) == ((7L, 2L, 6L, 0.857143, false)))
    // d9: hits at 0 and 5 -> [0,3) and [5,8): covered 6 of 9
    assert(got(9L) == ((9L, 2L, 6L, 0.666667, false)))
  }

  test("exact-substring cut: duplicated spans removed, canonical tokens, untouched docs intact") {
    val corpus = Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d y"),
      (3L, "p q r"),
      (4L, "A B C"),
      (5L, "zz")
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrCut(corpus, k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text_clean")).toMap
    assert(got(1L) == "e f")   // [0,4) cut
    assert(got(2L) == "x y")   // [1,5) cut
    assert(got(3L) == "p q r") // untouched
    assert(got(4L) == "")      // fully duplicated
    assert(got(5L) == "zz")    // shorter than k
    // original columns survive the join back
    val cols = Dedup.exactSubstrCut(corpus, k = 3).columns.toSeq
    assert(cols.contains("text") && cols.contains("text_clean"))
  }

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 0
    (2L, "completely different text about spark query engines and shuffles"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 0
    (4L, "another unrelated document mentioning parquet files and buckets"),
    (5L, "spark query engines and shuffles are described in different text here")
  ).toDF("doc_id", "text")

  test("connected components: min-label clusters, singletons self-cluster, deep chains converge") {
    val ids = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(ids, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    // a 7-node chain needs multiple propagation rounds to converge
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
      .toDF("id_a", "id_b")
    val one = Dedup.connectedComponents(ids, chain).collect()
      .map(_.getAs[Long]("cluster_id")).toSet
    assert(one == Set(1L))
    // clusters over the real near-dup pair graph: 0,1,3 are one cluster
    val real = Dedup.connectedComponents(docs,
      Dedup.ngramJaccardPairs(docs, minJaccard = 0.8, maxDocFreq = 1000000))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(real(0L) == 0L && real(1L) == 0L && real(3L) == 0L)
    assert(real(2L) == 2L && real(4L) == 4L)
  }

  test("star contraction: same clusters as label propagation, deep chains, random graphs") {
    val ids = (1L to 7L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponentsStar(ids, pairs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L, 7L -> 7L))
    // a 40-node chain: label propagation needs ~40 rounds, star ~log² n
    val n = 40L
    val chainIds = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val one = Dedup.connectedComponentsStar(chainIds, chain).collect()
      .map(_.getAs[Long]("cluster_id")).toSet
    assert(one == Set(1L))
    // randomized cross-check: star == label propagation on arbitrary graphs
    val rnd = new scala.util.Random(42)
    (0 until 3).foreach { _ =>
      val v = 60L
      val vids = (0L until v).toDF("doc_id")
      val es = (0 until 70).map(_ => (rnd.nextLong(v), rnd.nextLong(v)))
        .filter { case (a, b) => a != b }.toDF("id_a", "id_b")
      val lp = Dedup.connectedComponents(vids, es).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val st = Dedup.connectedComponentsStar(vids, es).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(st == lp)
    }
  }

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out(0L) == 2) // docs 0 and 3
    assert(out.values.sum == 6)
  }

  test("ngram jaccard finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.5,
      maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("minhash LSH candidates ⊇ high-jaccard pairs; verified output matches exact") {
    val exact = Dedup.ngramJaccardPairs(docs, n = 3, minJaccard = 0.7, maxDocFreq = 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, n = 3, numHashes = 64, bands = 32,
      minJaccard = 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 32 bands × 2 rows: recall at j≥0.7 is 1-(1-0.49)^32 ≈ 1.0
    assert(lsh == exact)
  }

  test("simhash: identical docs collide; near-dups closer than unrelated docs") {
    val sig = docs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(3L))
    val pairs = Dedup.simhashPairs(docs, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    // long docs: one token changed out of ~60 stays hamming-close (simhash
    // needs token mass for the per-bit majority vote to be stable)
    val base = (0 until 60).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok30", "changed")
    val far = (0 until 60).map(i => s"other$i").mkString(" ")
    val longDocs = Seq((10L, base), (11L, near), (12L, far)).toDF("doc_id", "text")
    val s2 = longDocs.select($"doc_id", Dedup.simhash64($"text").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(s2(10L), s2(11L)) < hamming(s2(10L), s2(12L)))
    assert(hamming(s2(10L), s2(11L)) <= 16)
  }

  test("simhash is deterministic across evaluations") {
    val a = docs.select(Dedup.simhash64($"text")).collect().map(_.getLong(0)).toSeq
    val b = docs.repartition(3).select(Dedup.simhash64($"text")).collect()
      .map(_.getLong(0)).toSeq.sorted
    assert(a.sorted == b)
  }

  test("simhash bucket cap bounds boilerplate floods (skew guard)") {
    // 30 identical docs: every band key collides all 30 → O(m²) candidates
    val flood = (0L until 30L).map(i =>
      (i, "identical boiler plate text repeated across the whole corpus"))
      .toDF("doc_id", "text")
    // default cap (1000) is above the flood: full pair set survives
    assert(Dedup.simhashPairs(flood).count() == 30L * 29 / 2)
    // cap below the flood: every flooded bucket dropped → candidates bounded
    assert(Dedup.simhashPairs(flood, maxBucket = 10).count() == 0)
    // the cap must not disturb ordinary (small-bucket) pairs
    val pairs = Dedup.simhashPairs(docs, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("stop-shingle df cap drops flooding shingles") {
    // 20 docs all sharing one boilerplate shingle + unique tails
    val flood = (0 until 20).map(i =>
      (i.toLong, s"shared boiler plate unique$i tail$i words$i")).toDF("doc_id", "text")
    val withCap = Dedup.ngramJaccardPairs(flood, n = 3, minJaccard = 0.1, maxDocFreq = 5)
    // 'shared boiler plate' appears in 20 docs > cap 5 → dropped → no pair
    // reaches jaccard 0.1 from the remaining unique shingles
    assert(withCap.count() == 0)
  }

  test("decontamination: n-gram overlap vs benchmark flags exactly the leaking docs") {
    val bench = Seq(
      (100L, "what is the capital of france paris obviously"),
      (101L, "select the best answer from the options below")).toDF("doc_id", "text")
    val corpus = Seq(
      // carries bench 100's 8-gram verbatim inside longer text → contaminated
      (0L, "trivia time what is the capital of france paris obviously says the quiz"),
      // shares only short fragments (< n tokens contiguous) → clean
      (1L, "the capital markets of france are in paris"),
      // verbatim copy of bench 101 → contaminated
      (2L, "select the best answer from the options below"),
      (3L, "a completely unrelated document about spark shuffles")).toDF("doc_id", "text")
    val got = Dedup.contamination(corpus, bench, n = 8).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_overlap")).toMap
    assert(got.keySet == Set(0L, 2L))
    // doc 0 contains exactly one benchmark 8-gram window; doc 2 (8 tokens)
    // IS one 8-gram
    assert(got(0L) == 1L && got(2L) == 1L)
    // a doc shorter than n tokens can never be flagged (no 8-gram exists)
    val short = Seq((9L, "too short to hold any gram")).toDF("doc_id", "text")
    assert(Dedup.contamination(short, bench, n = 8).count() == 0)
  }
}
