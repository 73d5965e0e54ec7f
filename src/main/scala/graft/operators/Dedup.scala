package graft.operators

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data curation.
  *
  * Scale design: every variant is a shuffle-bounded DataFrame plan —
  * no driver loops, no cartesian products.
  *   - exact: one hash aggregation
  *   - n-gram Jaccard: inverted-index self-join on shingles (pairs only ever
  *     materialize for docs sharing a shingle), with a document-frequency cap
  *     to drop stop-shingles (the classic skew guard at web scale)
  *   - MinHash+LSH: signatures via expressions, banding join; candidates
  *     verified with exact Jaccard so precision is 1.0 and only recall
  *     depends on banding
  *   - SimHash: 64-bit expression-only signature, near-dup = equal band keys
  *     with Hamming-distance verification
  */
object Dedup {

  /** Exact dedup: canonical (min id) representative per distinct text. */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Per-document word shingles, de-duplicated, annotated with document
    * frequency. Returns (id, shingle, df) — the inverted-index input.
    *
    * The df join is a SHUFFLE join on shingle (AQE may still broadcast a
    * small df side at runtime): the df table is vocabulary-sized, so a
    * forced driver broadcast would OOM the driver at web scale.
    */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    // Materialized once: the Jaccard plan consumes the index from 3 branches
    // (df stats, both self-join sides, per-doc sizes) — without truncation
    // the shingle expressions re-evaluate per branch. At cluster scale this
    // is the natural "inverted index table" write. (An explicit
    // pre-partition by shingle here would let the df agg + df join +
    // self-join share one exchange at cluster scale, but it was measured a
    // local REGRESSION — it pins every downstream stage to the full
    // partition count where AQE otherwise coalesces the tiny post-explode
    // shuffles; left to AQE, see OPTIMIZATION_r06.md.)
    val pairs = Par.spread(docs)
      .select(col(idCol).as("id"),
        explode(array_distinct(Text.wordShingles(col(textCol), n))).as("shingle"))
      .localCheckpoint(true)
    val df = pairs.groupBy("shingle").agg(count(lit(1)).as("df"))
    pairs.join(df, Seq("shingle"))
  }

  /** Exact n-gram Jaccard near-duplicate pairs (similarity ≥ minJaccard),
    * via inverted-index self-join: |A∩B| from the shingle join, |A|,|B| from
    * per-doc shingle counts. Emits (id_a < id_b, jaccard).
    *
    * Stop-shingle guard: a shingle in > maxDocFreq docs creates O(df²) join
    * pairs — it is dropped from the document's shingle SET (so sizes and
    * intersections use the same capped representation; jaccard stays a true
    * set similarity over df-capped shingle sets). Singleton shingles
    * (df = 1) stay in the sizes but are pruned from the self-join — they
    * cannot produce a pair, only inflate the join input.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minJaccard: Double = 0.8,
      maxDocFreq: Int = 1000): DataFrame = {
    val idx = shingleIndex(docs, idCol, textCol, n)
      .filter(col("df") <= maxDocFreq)
      .localCheckpoint(true) // consumed by sizes + both self-join sides
    val sizes = idx.groupBy("id").agg(count(lit(1)).as("sz"))
    val joinSide = idx.filter(col("df") >= 2).select("id", "shingle")
    val inter = joinSide.as("a").join(joinSide.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        round(col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Connected components over a near-dup pair graph: assign every document
    * the MIN doc id reachable through pairs (its cluster id); singletons
    * cluster to themselves. This is the training-data DELIVERABLE of dedup —
    * keep one representative per cluster, drop the rest.
    *
    * Iterative min-label propagation: label(v) ← min(label(v), neighbors'
    * labels), to fixpoint. Each round is one shuffle join + hash
    * aggregation; round count = O(max component diameter) — near-dup
    * clusters are shallow duplicate groups, not social graphs, so a handful
    * of rounds. The per-round driver `count()` is the convergence test of a
    * classic iterative Spark algorithm (cf. the Lloyd loop in
    * Similarity.ivfTopK — like it, CONSTRUCTION executes the loop's jobs
    * eagerly; the returned DataFrame is the materialized result). For
    * adversarial diameters, swap in star contraction (alternating
    * large-star/small-star) — the same join shape, fewer rounds.
    *
    * Memory discipline at scale: each round materializes ONE (id, prev,
    * label) checkpoint, reads the convergence count off it directly (no
    * extra join), and unpersists the superseded round — executor storage
    * holds at most two label generations plus the edge list, regardless of
    * how many rounds convergence takes.
    *
    * Work discipline at scale: the loop runs over EDGE-INCIDENT vertices
    * only. In a deduped corpus the overwhelming majority of documents are
    * singletons (no near-dup pair touches them) — their label can never
    * change, so iterating them would make every round's checkpoint + join
    * O(V) instead of O(affected). They are unioned in once, lazily, at the
    * end (label = own id), so the per-round cost is proportional to the
    * duplicate-graph size, not the corpus size.
    */
  def connectedComponents(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select(col(idCol).as("id"))
    val fwd = pairs.select(col("id_a"), col("id_b"))
    // Symmetric adjacency RESTRICTED to docs ids up front (foreign ids in
    // pairs are ignored — previously enforced by the per-round label joins;
    // filtering the edge list once is equivalent: an edge with a foreign
    // endpoint could never contribute a label, and a docs id touched only
    // by such edges self-clusters via the singleton union either way).
    val edges = fwd.union(fwd.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .join(ids.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
      .join(ids.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
      .localCheckpoint(true) // scanned every round
    // distinct edge endpoints — O(affected); checkpointed because the
    // singleton anti-join below is evaluated lazily by the CALLER, after
    // this function has already released the edge checkpoint
    val touchedIds = edges.select(col("id_a").as("id")).distinct()
      .localCheckpoint(true)
    // round-0 labels derive lazily from the touchedIds checkpoint (no extra
    // materialization); the loop must NOT unpersist this generation — its
    // only LogicalRDD leaf IS touchedIds, which loopEdges still reads
    var labels = touchedIds.withColumn("label", col("id"))
    var labelsOwned = false
    // One min-label propagation hop as ONE join + ONE aggregation: the edge
    // list is augmented with a self-loop per touched vertex, so
    // min-over-(neighbors ∪ self) IS the new label — no second join back to
    // `l`, and crucially `l` appears exactly ONCE, so fused multi-hop plans
    // stay LINEAR in the hop count (a hop that references `l` twice doubles
    // the plan per fused hop — measured 11 s at 8 hops). The round's `prev`
    // label rides the self-loop row through the aggregation.
    val loopEdges = edges.unionByName(
      touchedIds.select(col("id").as("id_a"), col("id").as("id_b")))
    def hop(l: DataFrame): DataFrame =
      loopEdges
        .join(l.select(col("id").as("id_b"), col("label").as("nl"),
          col("prev").as("np")), "id_b")
        .groupBy(col("id_a"))
        .agg(min(col("nl")).as("label"),
          max(when(col("id_a") === col("id_b"), col("np"))).as("prev"))
        .select(col("id_a").as("id"), col("prev"), col("label"))
    var changed = 1L
    var hops = 1
    while (changed > 0) {
      // ADAPTIVE MULTI-HOP rounds: the first round runs one propagation hop
      // (a shallow duplicate-group graph converges immediately, paying
      // nothing extra); while the graph keeps changing, the hops fused into
      // one materialized round DOUBLE (capped at 8) — a deep chain of
      // diameter d then converges in O(log d) checkpoints instead of d,
      // with at most 2× the single-hop propagation work. The label fixpoint
      // is hop-count-independent, so results are identical. The
      // changed-count rides the checkpoint job itself via observe()
      // (validated: observations fire through eager localCheckpoint), so a
      // round is exactly ONE action instead of checkpoint + count.
      val obs = org.apache.spark.sql.Observation()
      var stepped = labels.withColumn("prev", col("label"))
      (0 until hops).foreach(_ => stepped = hop(stepped))
      val next = stepped
        .observe(obs, sum(when(col("label") =!= col("prev"), 1L)
          .otherwise(0L)).as("changed"))
        .localCheckpoint(true)
      hops = math.min(hops * 2, 8)
      changed = obs.get("changed") match {
        case null => 0L
        case n: java.lang.Long => n.longValue()
      }
      // superseded generation: next is materialized, nothing reads it again
      // (Dataset.unpersist is a no-op for checkpoint blocks — see bridge)
      if (labelsOwned)
        org.apache.spark.sql.graftbridge.ScanBridge.unpersistCheckpoint(labels)
      labels = next.drop("prev")
      labelsOwned = true
    }
    val clustered = labels.select(col("id").as(idCol), col("label").as("cluster_id"))
    // singletons never entered the loop: one lazy anti-join against the
    // (small) touched-id set, not a per-round O(V) materialization
    val singletons = docs.select(col(idCol).as("id"))
      .join(touchedIds, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("id").as("cluster_id"))
    val out = clustered.unionByName(singletons)
    org.apache.spark.sql.graftbridge.ScanBridge.unpersistCheckpoint(edges)
    out
  }

  /** Connected components via ALTERNATING STAR CONTRACTION (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", ACM SoCC 2014 — public
    * algorithm): per round, large-star hangs every strictly-larger neighbor
    * of u onto u's neighborhood minimum, small-star does the same for the
    * not-larger neighbors. Both preserve connectivity and monotonically
    * flatten trees; the edge set converges to stars rooted at component
    * minima in O(log n) rounds — the adversarial-diameter upgrade over
    * [[connectedComponents]]'s O(diameter) min-label propagation (a 10^6-long
    * duplicate chain needs 10^6 label rounds but ~20 star rounds). Same
    * contract: cluster_id = min reachable doc id, singletons self-cluster,
    * edges with endpoints outside `docs` are ignored, two-generation
    * checkpoint discipline, per-round work O(duplicate graph).
    *
    * Convergence test: round signature (edge count + two independent seeded
    * hash sums) unchanged — probabilistically exact (~2^-128 collision), one
    * tiny aggregate per round instead of an O(E) set-difference join. A
    * 200-round cap fails loudly rather than ever returning unconverged
    * labels (the bound for 10^10 nodes is ~2·log² n ≈ 40 rounds).
    */
  def connectedComponentsStar(docs: DataFrame, pairs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val ids = docs.select(col(idCol).as("id")).localCheckpoint(true)
    // canonical undirected edges (hi > lo), endpoints restricted to docs
    // (label propagation never assigns labels to foreign ids, so a foreign
    // id must not bridge or name a cluster here either — parity by filter)
    val canon = pairs.select(col("id_a"), col("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .join(ids.select(col("id").as("hi")), Seq("hi"), "left_semi")
      .join(ids.select(col("id").as("lo")), Seq("lo"), "left_semi")
      .select("hi", "lo").distinct()
    // round signature rides each checkpoint's own job via observe() — the
    // former per-round signature aggregation job is gone (same aggregates:
    // edge count + two independent seeded hash sums; decimal, since a Long
    // sum overflows under ANSI)
    def sigObserve(e: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (e.observe(obs, count(lit(1)).as("cnt"),
        sum(xxhash64(col("hi"), col("lo")).cast("decimal(38,0)")).as("h1"),
        sum(xxhash64(lit(7), col("hi"), col("lo")).cast("decimal(38,0)")).as("h2")),
        obs)
    }
    def sigOf(obs: org.apache.spark.sql.Observation): Seq[Any] =
      Seq(obs.get("cnt"), obs.get("h1"), obs.get("h2"))
    val (canonObserved, canonObs) = sigObserve(canon)
    var edges = canonObserved.localCheckpoint(true)
    val touchedIds = edges.select(col("hi").as("id"))
      .union(edges.select(col("lo").as("id"))).distinct()
      .localCheckpoint(true)
    // symmetric neighbor view (u, v) of a canonical edge frame
    def nbrs(e: DataFrame): DataFrame =
      e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
    // Both star steps now compute the per-u neighborhood minimum as a WINDOW
    // over the symmetric view instead of a groupBy + self-join (guide §2.4):
    // one exchange per star instead of three, and largeStar's intermediate
    // distinct is dropped — smallStar's window-min and pair emission are
    // multiset-insensitive and the round's final distinct dedups, so the
    // produced edge SET (and hence every signature and the fixpoint) is
    // unchanged.
    val uw = Window.partitionBy("u")
    // large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u.
    // v > u ≥ m, so (hi = v, lo = m) stays canonical.
    def largeStar(e: DataFrame): DataFrame =
      nbrs(e)
        .withColumn("mn", min(col("v")).over(uw))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mn")).as("lo"))
    // small-star(u): over the not-larger neighbors S = {v ∈ Γ(u): v < u},
    // m = min(S); emit (u, m) and (v, m) for v ∈ S, v ≠ m (all canonical:
    // u > m and v > m; the v = m self-pair is dropped by the hi ≠ lo
    // filter). Nodes with no smaller neighbor emit nothing — their edges
    // are re-emitted from the other endpoint's perspective.
    def smallStar(e: DataFrame): DataFrame =
      nbrs(e).filter(col("v") < col("u"))
        .withColumn("m", min(col("v")).over(uw))
        .select(explode(array(
          struct(col("v").as("hi"), col("m").as("lo")),
          struct(col("u").as("hi"), col("m").as("lo")))).as("p"))
        .select(col("p.hi").as("hi"), col("p.lo").as("lo"))
        .filter(col("hi") =!= col("lo"))
        .distinct()
    var sig = sigOf(canonObs)
    var converged = false
    var rounds = 0
    while (!converged) {
      rounds += 1
      if (rounds > 200) throw new IllegalStateException(
        s"star contraction did not converge in 200 rounds (last signature $sig)")
      val (observed, obs) = sigObserve(smallStar(largeStar(edges)))
      val next = observed.localCheckpoint(true)
      val nextSig = sigOf(obs)
      converged = nextSig == sig
      sig = nextSig
      org.apache.spark.sql.graftbridge.ScanBridge.unpersistCheckpoint(edges)
      edges = next
    }
    // at the star fixpoint every non-minimum node has an edge to its
    // component minimum: label = least(self, min neighbor)
    val labels = nbrs(edges).groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as(idCol), least(col("u"), col("mn")).as("cluster_id"))
    // an isolated touched vertex cannot exist (every touched vertex keeps ≥1
    // edge through both stars), but the singleton union below still needs
    // the untouched documents
    val singletons = ids.join(touchedIds, Seq("id"), "left_anti")
      .select(col("id").as(idCol), col("id").as("cluster_id"))
    labels.unionByName(singletons)
  }

  /** MinHash signature: k independent permutations approximated by seeded
    * xxhash64; sig[i] = min over distinct shingles of hash(shingle, seed=i).
    * Native codegen'd expression (TextExprs) — the higher-order-function
    * formulation evaluated interpreted and re-built the shingle array per
    * hash index (profiled 6+ s / 5000 docs at sf0.1).
    */
  def minhashSignature(text: Column, n: Int = 3, numHashes: Int = 64): Column =
    graft.functions.expressions.TextExprs.minhashSigCol(text, n, numHashes)

  /** The banded-LSH candidate step every near-dup variant shares: size the
    * (band, bucket) groups, drop singleton buckets (no pair) AND buckets
    * above `maxBucket` (a boilerplate flood collides m near-identical items
    * on one key → O(m²) pairs from that single bucket), then self-join the
    * survivors into canonical `id_a < id_b` candidate pairs. The bucket-stats
    * relation grows with the corpus (up to items × bands rows), so the
    * left_semi stays a SHUFFLE join — a forced driver broadcast here would
    * be a scale bomb; AQE may still pick a broadcast at runtime when the
    * filtered side is actually small. Recall cost of the cap: only pairs ALL
    * of whose shared band keys are flooded are lost — raise `maxBucket` (or
    * pre-dedup exactly) on flood-heavy corpora.
    *
    * `keyed` must carry `id` + `bucketCols` (+ any `carry` columns); output
    * is (id_a, id_b [, c_a, c_b per carry]), deduplicated across bands.
    */
  private[operators] def cappedBucketPairs(keyed: DataFrame,
      bucketCols: Seq[String], maxBucket: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val bucketSizes = keyed.groupBy(bucketCols.map(col): _*)
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= maxBucket && col("bsz") > 1)
    val survivors = keyed.join(bucketSizes.select(bucketCols.map(col): _*),
      bucketCols, "left_semi")
    val cond = bucketCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    survivors.as("a").join(survivors.as("b"), cond)
      .select(col("a.id").as("id_a") +: col("b.id").as("id_b") +:
        carry.flatMap(c =>
          Seq(col(s"a.$c").as(s"${c}_a"), col(s"b.$c").as(s"${c}_b"))): _*)
      .distinct()
  }

  /** MinHash+LSH near-dup pairs: band the signature (bands × rowsPerBand =
    * numHashes), join docs sharing any band bucket, then VERIFY candidates
    * with exact Jaccard — output precision is exact; banding only affects
    * recall (P[candidate] = 1-(1-j^r)^b).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, numHashes: Int = 64,
      bands: Int = 16, minJaccard: Double = 0.7,
      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands): integer " +
        "division would silently drop the trailing hashes from every band " +
        "and change the recall curve the parameters promise")
    val rowsPerBand = numHashes / bands
    // Materialize (shingles, signature) ONCE: the plan below consumes this
    // relation from 4 branches (bucket sizing, both sides of the candidate
    // self-join, exact verification); without truncation Catalyst would
    // re-evaluate the expensive signature expressions per branch. At cluster
    // scale this materialization is the natural "signature table" write.
    val sigRaw = Par.spread(docs).select(col(idCol).as("id"),
      array_distinct(Text.wordShingles(col(textCol), n)).as("sh"),
      minhashSignature(col(textCol), n, numHashes).as("sig"))
    val sig = sigRaw.localCheckpoint(true)
    // checkpointed pre-partitioned by the bucket key: the bucket-size agg,
    // the survivor semi-join and the candidate self-join inside
    // cappedBucketPairs all share this ONE exchange (guide §2.4)
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(array_join(
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")), "_"), b))).as(Seq("band", "bucket")))
      .repartition(Par.keyedShufflePartitions(docs.sparkSession),
        col("band"), col("bucket"))
      .localCheckpoint(true)
    // skew guard + canonical candidate pairs: see [[cappedBucketPairs]]
    val cand = cappedBucketPairs(banded, Seq("band", "bucket"), maxBucket)
    // exact verification of candidates
    val sh = sig.select(col("id"), col("sh"))
    cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash: per token-hash bit, sum ±1 over tokens; bit b of the
    * signature = sign of the sum. Native codegen'd expression.
    */
  def simhash64(text: Column): Column =
    graft.functions.expressions.TextExprs.simhash64Col(text)

  /** The pure higher-order-function formulation of [[simhash64]] — kept as
    * the semantic cross-check for the native expression (DedupSpec asserts
    * identical bit-distance ORDERING; hash functions differ so raw values
    * do not compare).
    */
  def simhash64Hof(text: Column): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val counts = aggregate(
      toks,
      array_repeat(lit(0), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, b) => a + when(call_function("getbit", h, b) === 1, 1).otherwise(-1))
      })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, b) => when(c > 0, call_function("shiftleft", lit(1L), b)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs: block on 4 16-bit bands (any equal band → two
    * docs within Hamming distance 48 collide in ≥1 band; for distance ≤ 3 a
    * band match is guaranteed by pigeonhole), verify Hamming ≤ maxHamming.
    *
    * Skew guard (same discipline as [[minhashLshPairs]]): a boilerplate
    * flood collides m near-identical docs on one 16-bit band key → O(m²)
    * candidate pairs from that single bucket. Buckets above `maxBucket` are
    * dropped via a left_semi SHUFFLE join on (band, key) — the bucket-stats
    * relation grows with the corpus, so a forced driver broadcast would be
    * a scale bomb. Recall cost: only pairs ALL of whose shared band keys
    * are flooded are lost — raise `maxBucket` (or pre-dedup exactly) if the
    * corpus is flood-heavy.
    */
  def simhashPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", maxHamming: Int = 3,
      maxBucket: Int = 1000): DataFrame = {
    val sig = Par.spread(docs)
      .select(col(idCol).as("id"), simhash64(col(textCol)).as("sig"))
    // materialized once: consumed by the bucket stats + both self-join sides
    // (3 evaluations of the signature expression otherwise). Storage lives
    // until the session GCs the plan — at cluster scale this materialization
    // is an explicit signature-table write, freed when the job ends.
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFF))).as(Seq("band", "key")))
      .repartition(Par.keyedShufflePartitions(docs.sparkSession),
        col("band"), col("key"))
      .localCheckpoint(true)
    // skew guard + canonical candidate pairs, carrying the signatures so the
    // Hamming verification needs no re-join: see [[cappedBucketPairs]]
    val cand = cappedBucketPairs(banded, Seq("band", "key"), maxBucket,
      carry = Seq("sig"))
    cand.withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Benchmark DECONTAMINATION — the n-gram overlap test every serious
    * training-data pipeline runs before training (the GPT-3 appendix-C /
    * Llama eval-overlap procedure): flag corpus documents that share any
    * word n-gram with a benchmark/eval set, so evaluation data can be
    * excluded from the training corpus. Returns one row per CONTAMINATED
    * document: (id, n_overlap) where n_overlap counts the DISTINCT
    * benchmark n-grams the document contains; clean documents are absent.
    *
    * Direction matters: the benchmark side is eval-suite-sized (MBs even
    * for a full eval harness) while the corpus is the 100-TB side — so the
    * distinct benchmark gram set is BROADCAST and the corpus side streams
    * through the join with no shuffle before the per-doc count aggregation
    * (map-side combinable, keyed by id). Production n is 8–13 tokens
    * (GPT-3 used 13); the gate uses a smaller n matched to the synthetic
    * corpus' short documents.
    */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val benchGrams = bench
      .select(explode(array_distinct(Text.wordShingles(col(textCol), n))).as("gram"))
      .distinct()
    Par.spread(docs)
      .select(col(idCol).as("id"),
        explode(array_distinct(Text.wordShingles(col(textCol), n))).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      // both sides are distinct gram sets, so rows are unique per (id, gram)
      // and a plain count IS the distinct-overlap count
      .groupBy("id").agg(count(lit(1)).as("n_overlap"))
  }

  /** Exact-substring duplicated-span detection (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better" — the
    * ExactSubstr variant, on word tokens): a k-token window is DUPLICATED
    * when its exact text occurs more than once anywhere in the corpus
    * (within-document repeats count — any second occurrence is a
    * duplicate); a token is duplicated when covered by any duplicated
    * window. Emits one row per document: token count, duplicated-window
    * count, covered-token count, covered fraction, and the keep decision
    * (dup_frac <= maxDupFrac).
    *
    * This is the intra-corpus EXACT-SPAN counterpart of the document-level
    * dedup family above: MinHash/SimHash/Jaccard find documents that are
    * mostly the same; this finds verbatim spans (licenses, boilerplate,
    * quoted snippets) embedded in otherwise-distinct documents, which
    * document-level similarity dilutes below any threshold.
    *
    * Scale shape — the paper builds a corpus-wide suffix array; the
    * distributed equivalent is relational and shuffle-bounded:
    *   1. window extraction is scan-stage (one posexplode per doc);
    *   2. the duplicate test is ONE hash aggregation keyed by the window
    *      text (k-token windows are near-unique unless genuinely
    *      duplicated, so unlike shingle DF stats this key is NOT
    *      Zipf-skewed — no stop-gram salting needed), and the
    *      positions join back on the same key partitioning;
    *   3. per-document coverage is a gaps-and-islands interval merge of
    *      the [pos, pos+k) hits — a window + two aggregations all sharing
    *      one id exchange, O(hits log hits) per doc, never O(len·hits).
    * Production k follows the paper (≈50 tokens); gates size k to the
    * synthetic corpus' short documents.
    */
  def exactSubstrStats(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50,
      maxDupFrac: Double = 0.2): DataFrame = {
    require(k >= 1, s"k: $k")
    require(maxDupFrac >= 0.0 && maxDupFrac <= 1.0, s"maxDupFrac: $maxDupFrac")
    val base = Par.spread(docs).select(col(idCol).as("id"),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")))
    val covered = exactSubstrIslands(base, k)
      .groupBy("id")
      .agg(sum(col("__e") - col("__s")).as("n_dup_tokens"),
        sum(col("__nw")).as("n_dup_windows"))
    val frac = coalesce(col("n_dup_tokens"), lit(0L)).cast("double") /
      col("n_tokens")
    base.join(covered, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_tokens").cast("long").as("n_tokens"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        round(frac, 6).as("dup_frac"),
        (frac <= maxDupFrac).as("keep"))
  }

  /** Exact-substring span REMOVAL (the paper's cut mode): returns the
    * input plus `text_clean` = the document with every duplicated-window
    * token removed (remaining tokens re-joined with single spaces).
    *
    * The membership test is per-token over the doc's MERGED duplicated
    * intervals (never the raw hit list), so the per-doc cost is
    * O(len · islands); a pathological fully-boilerplate document degrades
    * to O(len²/k) — filter first with [[exactSubstrStats]] (the O(hits log
    * hits) path) and cut only the keepers, which is the pipeline order the
    * paper uses.
    */
  def exactSubstrCut(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50): DataFrame = {
    require(k >= 1, s"k: $k")
    val base = Par.spread(docs).select(col(idCol).as("id"),
      split(lower(trim(col(textCol))), "\\s+").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")))
    val spans = exactSubstrIslands(base, k)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__s"), col("__e")))).as("__spans"))
    docs.join(
      base.join(spans, Seq("id"), "left")
        .select(col("id").as(idCol),
          array_join(filter(col("__toks"), (tok, t) =>
            !exists(coalesce(col("__spans"),
                array().cast("array<struct<__s:int,__e:int>>")),
              sp => sp("__s") <= t && t < sp("__e"))), " ").as("text_clean")),
      Seq(idCol))
  }

  /** Shared core of the exact-substring paths: duplicated window hit
    * positions per document, merged into disjoint [__s, __e) intervals
    * (gaps-and-islands over one id-partitioned window), with the per-island
    * hit count __nw. Interval arithmetic: a hit at pos covers [pos, pos+k);
    * a new island starts when pos >= the running max exclusive end
    * (adjacent intervals may split islands — the covered-length sum is
    * identical either way).
    */
  private def exactSubstrIslands(base: DataFrame, k: Int): DataFrame = {
    val wins = base
      .filter(col("n_tokens") >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), col("n_tokens") - k),
        i => array_join(slice(col("__toks"), i + 1, lit(k)), " ")))
        .as(Seq("pos", "gram")))
    val dupGrams = wins.groupBy("gram").agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > 1)
    val wPrev = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy("id").orderBy("pos")
      .rowsBetween(Window.unboundedPreceding, 0)
    wins.join(dupGrams.select("gram"), Seq("gram"))
      .select("id", "pos")
      .withColumn("__prev_end", max(col("pos") + k).over(wPrev))
      .withColumn("__new", when(col("__prev_end").isNull ||
        col("pos") >= col("__prev_end"), 1).otherwise(0))
      .withColumn("__island", sum(col("__new")).over(wRun))
      .groupBy("id", "__island")
      .agg(min(col("pos")).as("__s"), (max(col("pos")) + k).as("__e"),
        count(lit(1)).as("__nw"))
  }
}
