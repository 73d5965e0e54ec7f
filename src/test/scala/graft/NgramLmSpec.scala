package graft

import org.apache.spark.sql.functions._
import graft.operators.NgramLm

/** Stupid-Backoff LM perplexity filter — hand-computed scores, pruning
  * semantics, degenerate documents, and the broadcast-LM plan shape.
  */
class NgramLmSpec extends SparkSpecBase {
  import spark.implicits._

  // train: "a b a" + "a c" -> uni a:3 b:1 c:1, N=5; bi (a,b):1 (b,a):1 (a,c):1
  private def trainDf = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")

  test("hand-computed scores: seen bigram, backoff to unigram, OOV floor") {
    val model = NgramLm.trainBigram(trainDf)
    // "a b x": a -> 3/5 (first token, unigram, no backoff)
    //          b|a -> c(a,b)/c(a) = 1/3
    //          x|b -> bigram unseen -> 0.4 * uniScore(x); x OOV -> 0.4 * (0.4/5)
    val scored = NgramLm.scoreStupidBackoff(
      Seq((10L, "a b x")).toDF("doc_id", "text"), model)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    val lp = math.log10(3.0 / 5) + math.log10(1.0 / 3) + math.log10(0.4 * 0.4 / 5)
    val ce = -lp / 3
    assert(scored.toSeq == Seq((10L,
      3L,
      math.rint(lp * 1e4) / 1e4,
      math.rint(ce * 1e4) / 1e4,
      ce <= 3.0)))
  }

  test("minCount prunes grams but N keeps all train tokens") {
    val model = NgramLm.trainBigram(trainDf, minCount = 2)
    // only 'a' (c=3) survives; every bigram (c=1) is pruned; N stays 5.
    assert(model.unigrams.collect().map(r => (r.getString(0), r.getLong(1)))
      .toSeq == Seq(("a", 3L)))
    assert(model.bigrams.count() == 0)
    assert(model.total.collect().head.getLong(0) == 5L)
    // "a b": a -> 3/5; b|a -> bigram pruned -> 0.4 * (b pruned -> 0.4/5)
    val r = NgramLm.scoreStupidBackoff(
      Seq((11L, "a b")).toDF("doc_id", "text"), model).collect().head
    val lp = math.log10(3.0 / 5) + math.log10(0.4 * 0.4 / 5)
    assert(r.getDouble(2) == math.rint(lp * 1e4) / 1e4)
  }

  test("single-token and empty documents") {
    val model = NgramLm.trainBigram(trainDf)
    val out = NgramLm.scoreStupidBackoff(
      Seq((20L, "c"), (21L, "   "), (22L, "")).toDF("doc_id", "text"), model)
      .collect()
    // empty/whitespace docs have no tokens to score -> no output row.
    assert(out.map(_.getLong(0)).toSeq == Seq(20L))
    assert(out.head.getLong(1) == 1L)
    assert(out.head.getDouble(2) == math.rint(math.log10(1.0 / 5) * 1e4) / 1e4)
  }

  test("pruning coherence: a surviving bigram always finds its context count") {
    // 'x y' twice -> bi (x,y) c=2 survives minCount=2; uni x c=2 must too.
    val model = NgramLm.trainBigram(
      Seq((1L, "x y"), (2L, "x y")).toDF("doc_id", "text"), minCount = 2)
    val r = NgramLm.scoreStupidBackoff(
      Seq((30L, "x y")).toDF("doc_id", "text"), model).collect().head
    // x -> 2/4; y|x -> c(x,y)/c(x) = 2/2 = 1
    assert(r.getDouble(2) == math.rint(math.log10(0.5) * 1e4) / 1e4)
  }

  test("plan: persisted broadcast LM -> corpus pays exactly one exchange") {
    val dir = tmpDir("ngramlm")
    val model = NgramLm.trainBigram(trainDf)
    model.unigrams.write.parquet(s"$dir/uni")
    model.bigrams.write.parquet(s"$dir/bi")
    model.total.write.parquet(s"$dir/tot")
    val persisted = NgramLm.LmModel(
      spark.read.parquet(s"$dir/uni"), spark.read.parquet(s"$dir/bi"),
      spark.read.parquet(s"$dir/tot"))
    // parquet-backed corpus: a spark.range source would let Catalyst skip
    // the per-doc agg shuffle (range ids are partition-distinct) — a file
    // scan is the realistic shape.
    spark.range(2000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), lit("b"),
        concat(lit("w"), (col("id") % 97).cast("string"))).as("text"))
      .write.parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")
    val scored = NgramLm.scoreStupidBackoff(corpus, persisted)
    scored.collect()
    val lines = scored.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head.linesIterator.toSeq
    assert(lines.count(_.contains("Exchange hashpartitioning")) == 1,
      lines.mkString("\n"))
    assert(lines.exists(_.contains("BroadcastHashJoin")), lines.mkString("\n"))
    assert(!lines.exists(_.contains("SortMergeJoin")), lines.mkString("\n"))
  }
}
