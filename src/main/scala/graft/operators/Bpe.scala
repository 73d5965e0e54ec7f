package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application (Sennrich et al.,
  * ACL 2016 "Neural Machine Translation of Rare Words with Subword Units")
  * — the tokenizer-fitting step of a training-data pipeline.
  *
  * Scale design — the work splits into two regimes with very different
  * sizes, and the engine places each where it belongs:
  *
  *   - CORPUS-sized (100 TB): word-frequency extraction — one explode +
  *     one map-side-combined hash aggregation. This is the only pass whose
  *     cost grows with the corpus; its output is VOCABULARY-sized
  *     (distinct words: tens of millions of rows no matter how big the
  *     corpus is, Heaps' law). [[pairCounts]] is the same regime's
  *     gate-checkable twin for the first merge iteration.
  *   - VOCAB-sized: the merge loop itself. Each iteration needs one
  *     global argmax over pair counts plus an update touching only words
  *     containing the merged pair — run distributed this is numMerges
  *     tiny-job round trips (32k scheduler round trips for a GPT-2-sized
  *     vocab, pure overhead); run locally over the compacted word table it
  *     is the textbook incremental-pair-count algorithm every production
  *     trainer (SentencePiece, HF tokenizers) uses after the distributed
  *     count. [[train]] therefore collects the word table through an
  *     explicit, deterministic `maxWords` cap (TakeOrdered by freq desc —
  *     a bounded driver result like IncrementalAgg's pruneCap, never an
  *     unbounded collect) and fits merges in memory with incremental pair
  *     updates.
  *   - CORPUS-sized again: [[tokenize]] applies the trained merges to
  *     every document — broadcast ranks + a mapPartitions scan (the
  *     documented last-resort tier, same rationale as [[Packing]]: the
  *     greedy lowest-rank merge loop is inherently iterative per word).
  *
  * Determinism: argmax ties break on the lexicographically smallest pair;
  * merges apply left-to-right non-overlapping; the word cap orders by
  * (freq desc, word asc). Same corpus → same merge list, bit for bit.
  *
  * Reference scope: the reference pipeline tokenizes nothing (RDF term
  * mapping only); this is part of the beyond-reference training-data
  * surface next to chunking and packing.
  */
object Bpe {

  /** End-of-word marker symbol (a separate trailing symbol, so merges can
    * learn word-final subwords distinctly from word-internal ones).
    */
  val Eow = "</w>"

  /** Trained model: the ordered merge list. `ranks` maps a pair to its
    * merge priority (lower = earlier = applied first by [[encodeWord]]).
    */
  final case class BpeModel(merges: Seq[(String, String)]) {
    lazy val ranks: Map[(String, String), Int] = merges.zipWithIndex.toMap
  }

  /** Word-frequency table (word, freq) — the one corpus-sized pass.
    * Engine-standard tokenization: whitespace split of lower(trim(text)),
    * empty rows skipped.
    */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spread(docs).filter(length(trim(col(textCol))) > 0)
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"))

  /** First-iteration adjacent-pair counts over the word table, weighted by
    * word frequency — the distributed, oracle-checkable leg of the merge
    * loop: (a, b, cnt) where the last character of every word pairs with
    * [[Eow]]. Pure expressions (transform over a character sequence +
    * explode + hash agg); single-character words emit exactly (char, Eow).
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val w = col("word")
    val pairs = transform(sequence(lit(1), length(w)), i => struct(
      w.substr(i, lit(1)).as("a"),
      when(i === length(w), lit(Eow)).otherwise(w.substr(i + 1, lit(1))).as("b")))
    words.select(explode(pairs).as("p"), col("freq"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("freq").cast("long").as("cnt"))
  }

  private def initialSyms(word: String): Vector[String] =
    word.map(_.toString).toVector :+ Eow

  /** Merge every left-to-right non-overlapping occurrence of `pair` in a
    * symbol sequence — the single BPE rewrite rule ("aaa" under (a,a) →
    * "aa","a").
    */
  def mergeAll(syms: IndexedSeq[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var pend: String = null
    syms.foreach { s =>
      if (pend == null) pend = s
      else if (pend == pair._1 && s == pair._2) { out += pend + s; pend = null }
      else { out += pend; pend = s }
    }
    if (pend != null) out += pend
    out.result()
  }

  private def adjacentPairs(syms: IndexedSeq[String]): Iterator[(String, String)] =
    if (syms.length < 2) Iterator.empty
    else syms.iterator.zip(syms.iterator.drop(1))

  /** Fit `numMerges` merges. The distributed word count collapses through
    * a deterministic `maxWords` cap (freq desc, word asc — logged loudly
    * when hit); the merge loop is the incremental-pair-count algorithm:
    * each merge updates counts only for words containing the merged pair.
    * Stops early when no pair reaches `minPairCount`.
    */
  def train(docs: DataFrame, textCol: String = "text", numMerges: Int,
      maxWords: Int = 1000000, minPairCount: Long = 2): BpeModel = {
    require(numMerges >= 0, s"train: numMerges must be >= 0: $numMerges")
    require(maxWords > 0, s"train: maxWords must be positive: $maxWords")
    // fetch one past the cap so an exactly-maxWords vocabulary does not
    // warn about an exclusion that never happened
    val fetched = wordFreq(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(if (maxWords < Int.MaxValue) maxWords + 1 else maxWords)
      .collect()
    if (fetched.length > maxWords)
      System.err.println(s"[Bpe.train] word table hit the maxWords cap " +
        s"($maxWords); rarer words are excluded from merge statistics")
    val collected = fetched.take(maxWords)

    val syms = collected.map(r => initialSyms(r.getString(0)))
    val freqs = collected.map(_.getLong(1))
    import scala.collection.mutable
    val counts = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(wi: Int): Unit =
      adjacentPairs(syms(wi)).foreach { p =>
        counts.updateWith(p)(c => Some(c.getOrElse(0L) + freqs(wi)))
        index.getOrElseUpdate(p, mutable.BitSet.empty) += wi
      }
    syms.indices.foreach(addWord)

    val merges = Vector.newBuilder[(String, String)]
    var m = 0
    var done = numMerges == 0 || counts.isEmpty
    while (!done) {
      // argmax with deterministic tie-break: max count, then smallest pair.
      val best = counts.iterator.reduce { (x, y) =>
        if (y._2 > x._2 || (y._2 == x._2 &&
          (y._1._1 < x._1._1 || (y._1._1 == x._1._1 && y._1._2 < x._1._2)))) y
        else x
      }
      if (best._2 < minPairCount) done = true
      else {
        merges += best._1
        // touch only words that (possibly) contain the pair; index entries
        // can be stale — mergeAll is a no-op then and the delta is zero.
        index.get(best._1).foreach(_.foreach { wi =>
          val before = syms(wi)
          val after = mergeAll(before, best._1)
          if (after.length != before.length) {
            adjacentPairs(before).foreach { p =>
              counts.updateWith(p)(c => Some(c.getOrElse(0L) - freqs(wi)))
            }
            syms(wi) = after
            adjacentPairs(after).foreach { p =>
              counts.updateWith(p)(c => Some(c.getOrElse(0L) + freqs(wi)))
              index.getOrElseUpdate(p, mutable.BitSet.empty) += wi
            }
          }
        })
        counts.filterInPlace((_, c) => c > 0)
        m += 1
        if (m >= numMerges || counts.isEmpty) done = true
      }
    }
    BpeModel(merges.result())
  }

  /** Encode one word with the trained ranks: repeatedly apply the
    * lowest-rank adjacent pair (all its non-overlapping occurrences) until
    * no adjacent pair has a rank — the standard greedy BPE apply.
    */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var s: Vector[String] = initialSyms(word)
    var more = true
    while (more && s.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      adjacentPairs(s).foreach { p =>
        val r = ranks.getOrElse(p, Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = p }
      }
      if (best == null) more = false
      else s = mergeAll(s, best)
    }
    s
  }

  /** Tokenize every document: (idCol, pos, subword) exploded — one row per
    * emitted subword, `pos` the 0-based position in the document's subword
    * stream, the id column keeping its input type (string/uuid ids work
    * like everywhere else in the engine). Ranks broadcast; per-partition
    * imperative scan (the greedy merge loop cannot be an expression).
    */
  def tokenize(docs: DataFrame, model: BpeModel, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val spark = docs.sparkSession
    val ranksB = spark.sparkContext.broadcast(model.ranks)
    val prep = Par.spread(docs).filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), split(lower(trim(col(textCol))), "\\s+").as("__words"))
    val outSchema = StructType(Seq(prep.schema.head,
      StructField("pos", LongType, nullable = false),
      StructField("subword", StringType, nullable = false)))
    prep.mapPartitions { rows =>
      val ranks = ranksB.value
      rows.flatMap { r =>
        val id = r.get(0)
        val words = r.getSeq[String](1)
        var pos = -1L
        words.iterator.flatMap(w => encodeWord(w, ranks)).map { sub =>
          pos += 1; Row(id, pos, sub)
        }
      }
    }(Encoders.row(outSchema))
  }
}
