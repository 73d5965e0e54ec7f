package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("cosine: self-similarity is 1, orthogonal is 0") {
    val df = Seq(
      (Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
      (Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f))
    ).toDF("a", "b")
    val got = df.select(round(Similarity.cosine($"a", $"b"), 9)).collect()
      .map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0, 1.0))
  }

  test("brute-force top-k: k rows per query, ranks 1..k, descending cosine") {
    val queries = emb.filter($"vec_id" < 4)
    val out = Similarity.bruteForceTopK(emb, queries, k = 3).collect()
    assert(out.length == 4 * 3)
    val byQ = out.groupBy(_.getAs[Long]("query_id"))
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
      val cos = sorted.map(_.getAs[Double]("cosine")).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }

  test("LSH top-k results are a subset of brute-force ordering semantics") {
    val queries = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(emb, queries, k = 10, bands = 16, bitsPerBand = 4)
      .collect()
    // every LSH hit must be a real corpus vector scored identically —
    // check ids are plausible and ranks well-formed
    lsh.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq)
    }
    // with 16 bands × 4 bits recall is high; expect substantial overlap
    val hits = lsh.map(r => (r.getLong(0), r.getLong(1))).count(bf.contains)
    assert(hits >= lsh.length / 2, s"LSH overlap too low: $hits/${lsh.length}")
  }

  test("candidate dedup carries ids only — no embedding payload through the distinct") {
    // The band-collision distinct must group on id columns alone; a vector
    // colliding in m bands would otherwise shuffle its embedding m times.
    // Pin the plan shape: no HashAggregate (the distinct) may reference the
    // vector-carrying attributes (va/vb/qv/cv) — they join back only AFTER.
    def aggLines(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.toString.linesIterator
        .filter(l => l.contains("Aggregate")).toSeq
    val nd = Similarity.embeddingNearDupPairs(emb, minCos = 0.3, bands = 4, bitsPerBand = 4)
    assert(aggLines(nd).nonEmpty)
    aggLines(nd).foreach { l =>
      assert(!l.contains("va#") && !l.contains("vb#") && !l.contains(" v#"),
        s"distinct shuffles embedding payload: $l")
    }
    val queries = emb.filter($"vec_id" < 2)
    val topk = Similarity.lshTopK(emb, queries, k = 3, bands = 4, bitsPerBand = 4)
    assert(aggLines(topk).nonEmpty)
    aggLines(topk).foreach { l =>
      assert(!l.contains("qv#") && !l.contains("cv#"),
        s"distinct shuffles embedding payload: $l")
    }
  }

  test("IVF plan size is constant in nLists (centroids broadcast, never plan literals)") {
    val queries = emb.filter($"vec_id" < 2)
    // NB: ivfTopK executes its Lloyd/seeding jobs eagerly (localCheckpoint),
    // so this runs real (small) jobs; the ASSERTION is about the final
    // plan's size — a literal-embedding design would blow it up
    // O(nLists × dim) between these two configurations
    def planLines(nLists: Int): Int =
      Similarity.ivfTopK(emb, queries, k = 3, nLists = nLists, nProbe = 2, iters = 1)
        .queryExecution.optimizedPlan.toString.linesIterator.size
    val small = planLines(8)
    val big = planLines(512)
    assert(big <= small + 8,
      s"plan grew with nLists: $small lines at 8 lists vs $big at 512")
  }

  test("IVF top-k: well-formed ranks; high overlap with brute force at full probe") {
    val queries = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nProbe == nLists → exhaustive probing → results == brute force
    val full = Similarity.ivfTopK(emb, queries, k = 5, nLists = 8, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == bf)
    // partial probe: valid ranks, subset semantics
    val part = Similarity.ivfTopK(emb, queries, k = 5, nLists = 8, nProbe = 2)
      .collect()
    part.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted.toSeq
      assert(ranks == (1L to ranks.length).toSeq)
    }
    // synthetic embeddings are near-orthogonal (no cluster structure), so
    // partial-probe recall is inherently low — require plausibility only
    val partSet = part.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(partSet.nonEmpty && partSet.intersect(bf).nonEmpty)
  }

  test("embedding near-dup bucket cap bounds identical-vector floods (skew guard)") {
    // 30 copies of one vector: every (band, bucket) collides all 30
    val v = Array.tabulate(8)(i => (i + 1).toFloat)
    val flood = (0L until 30L).map(i => (i, v)).toDF("vec_id", "embedding")
    assert(Similarity.embeddingNearDupPairs(flood, minCos = 0.99,
      bands = 4, bitsPerBand = 4).count() == 30L * 29 / 2)
    assert(Similarity.embeddingNearDupPairs(flood, minCos = 0.99,
      bands = 4, bitsPerBand = 4, maxBucket = 10).count() == 0)
  }

  test("int8 quantization: scale cancels, zero vector is safe, cosine close") {
    import graft.functions.expressions.TextExprs.{quantCosineCol, quantize8Col}
    val df = Seq(
      (Array(1.0f, 2.0f, 2.0f), Array(10.0f, 20.0f, 20.0f)), // parallel, diff scale
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),    // orthogonal
      (Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f))     // zero vector
    ).toDF("a", "b")
    val got = df.select(round(quantCosineCol(quantize8Col($"a"), quantize8Col($"b")), 6))
      .collect().map(_.getDouble(0)).toSeq
    assert(got == Seq(1.0, 0.0, 0.0))
    // quantized cosine tracks float cosine within int8 error on real vectors
    val pairs = emb.limit(40).select($"vec_id", $"embedding").as("x")
      .join(emb.limit(40).select($"vec_id".as("id2"), $"embedding".as("e2")).as("y"),
        $"vec_id" < $"id2")
    val err = pairs.select(abs(
        quantCosineCol(quantize8Col($"embedding"), quantize8Col($"e2")) -
          Similarity.cosine($"embedding", $"e2")).as("err"))
      .agg(max($"err")).collect().head.getDouble(0)
    assert(err < 0.02, s"max quantization error $err")
  }

  test("quantized top-k with exhaustive refine equals brute force") {
    val queries = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val qt = Similarity.quantizedTopK(emb, queries, k = 5, refine = Int.MaxValue)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(qt == bf)
    // production refine: emitted scores are EXACT float cosines (the
    // quantization can only cost recall, never score precision) and ranks
    // are well-formed 1..n per query; recall is measured in Bench
    val narrow = Similarity.quantizedTopK(emb, queries, k = 5, refine = 8)
      .collect()
    assert(narrow.nonEmpty)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 1000000).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    narrow.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    narrow.foreach(r =>
      assert(exact((r.getLong(0), r.getLong(1))) == r.getDouble(2)))
  }

  test("IVF-PQ: exhaustive probe+refine equals brute force; production config well-formed") {
    val queries = emb.filter($"vec_id" < 4)
    val bf = Similarity.bruteForceTopK(emb, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    // nProbe == nLists and refine ≥ corpus: every candidate reaches the
    // exact re-rank, so the whole train/encode/LUT/ADC plumbing must be
    // lossless regardless of quantizer quality
    val pq = Similarity.ivfPqTopK(emb, queries, k = 5, nLists = 4, nProbe = 4,
      m = 8, codes = 8, refine = Int.MaxValue).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(pq == bf)
    // production shape: ranks 1..n per query, scores are exact cosines
    val prod = Similarity.ivfPqTopK(emb, queries, k = 5, nLists = 4, nProbe = 2,
      m = 8, codes = 8, refine = 10).collect()
    assert(prod.nonEmpty)
    prod.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // a hash-sampled training pass still yields a complete, well-formed index
    val sampled = Similarity.ivfPqTopK(emb, queries, k = 5, nLists = 4, nProbe = 4,
      m = 8, codes = 8, refine = Int.MaxValue, trainSample = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(sampled == bf, "sampled training changes codebooks, not exhaustive results")
  }

  test("embedding near-dup: exact duplicate vectors are found with cosine 1") {
    val base = emb.filter($"vec_id" < 50)
    val dup = base.filter($"vec_id" === 7)
      .select(($"vec_id" + 1000).as("vec_id"), $"embedding", $"label")
    val corpus = base.unionByName(dup)
    val pairs = Similarity.embeddingNearDupPairs(corpus, minCos = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists { case (a, b, c) => a == 7L && b == 1007L && c == 1.0 })
  }
}
