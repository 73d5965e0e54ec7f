package graft.operators

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardOpenOption}

/** PERSISTED ANN index — the index lifecycle [[Similarity]]'s in-memory
  * operators deliberately leave out. `ivfTopK`/`ivfPqTopK` train + encode
  * per invocation, which is the right shape for a one-shot gate but the
  * wrong cost class for a query service: at 10^10 vectors the train+encode
  * pass dominates every query batch. This module makes the documented scale
  * story ("the list id is the partition key; probes prune files") physical:
  *
  *   build:  train once, assign/encode every vector, write the index as a
  *           list-partitioned parquet dataset
  *             <root>/meta.json                    (variant, dim, nLists, m,
  *                                                  codes, corpusCount)
  *             <root>/centroids/                   (coarse quantizer, tiny)
  *             <root>/codebooks/                   (PQ codebooks, tiny)
  *             <root>/vectors/list=<id>/part-….parquet
  *                                 (IVF: vec_id, cv; IVF-PQ: vec_id, nv, codes)
  *   search: compute each query's probed lists from the (tiny, broadcast)
  *           centroids, then read <root>/vectors with `list IN (probed)` —
  *           Hive-style PARTITION PRUNING opens only the probed lists'
  *           directories; unprobed lists' files are never touched (proven in
  *           AnnIndexSpec by corrupting them on disk). The probed-list set
  *           is collected driver-side BY DESIGN: it is ≤ queries × nProbe
  *           ids bounded by nLists (the partition count, not the data), and
  *           it must become a literal predicate to prune at planning time.
  *
  * Layout notes for cluster scale: rows are repartitioned BY LIST before the
  * write, so each list's rows land in one task → one file per list per
  * build/append. A list too large for one file gets a salt column in the
  * repartition (directory-level pruning is unaffected). The LIFECYCLE is
  * build → append → periodic rebuild: [[appendIvf]]/[[appendIvfPq]] admit
  * newly-arrived vectors by quantizing them against the STORED model (the
  * CDC shape — no retraining pass, appended files land inside the list
  * directories so pruning is untouched), and the periodic rebuild absorbs
  * quantizer drift, which is how IVF indexes are actually operated
  * (centroids drift ⇒ periodic retrain anyway; see Jégou/Douze/Schmid,
  * IEEE TPAMI 2011). Id-level UPSERTS are out of scope by contract — that
  * is the full lake-table treatment (snapshots, OCC, LWW), not an index
  * file store.
  */
object AnnIndex {

  /** `schemaJson` is the vectors dataset's EXPLICIT schema (incl. the `list`
    * partition column): reads never footer-sniff or type-infer, so opening
    * the index touches exactly meta + centroids + the probed lists' files.
    */
  final case class Meta(variant: String, dim: Int, nLists: Int, m: Int,
      codes: Int, corpusCount: Long, schemaJson: String) {
    def schema: org.apache.spark.sql.types.StructType =
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
  }

  private def writeMeta(root: String, meta: Meta): Unit = {
    val om = new ObjectMapper()
    val node = om.createObjectNode()
    node.put("variant", meta.variant)
    node.put("dim", meta.dim)
    node.put("nLists", meta.nLists)
    node.put("m", meta.m)
    node.put("codes", meta.codes)
    node.put("corpusCount", meta.corpusCount)
    node.put("schemaJson", meta.schemaJson)
    Files.createDirectories(Paths.get(root))
    Files.write(Paths.get(root, "meta.json"),
      om.writerWithDefaultPrettyPrinter().writeValueAsBytes(node),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Re-write the meta file (crash-recovery hook for
    * [[graft.streaming.AnnMaintenance]]'s torn-append rollback, which must
    * restore `corpusCount`). Not a public mutation surface.
    */
  private[graft] def writeMetaFor(root: String, meta: Meta): Unit =
    writeMeta(root, meta)

  def readMeta(root: String): Meta = {
    val om = new ObjectMapper()
    val n = om.readTree(Files.readAllBytes(Paths.get(root, "meta.json")))
    Meta(n.get("variant").asText(), n.get("dim").asInt(), n.get("nLists").asInt(),
      n.get("m").asInt(), n.get("codes").asInt(), n.get("corpusCount").asLong(),
      n.get("schemaJson").asText())
  }

  // --- IVF-flat ------------------------------------------------------------

  /** Train the coarse quantizer and persist the full-vector inverted file.
    * One exchange (the by-list repartition) beyond the training passes.
    */
  def buildIvf(corpus: DataFrame, root: String, nLists: Int = 16,
      iters: Int = 3, idCol: String = "vec_id",
      vecCol: String = "embedding"): Meta = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .localCheckpoint(true)
    val dim = c.select(size(col("cv"))).first().getInt(0)
    val centroids = Similarity.trainIvfCentroids(c, nLists, iters)
    centroids.write.mode("overwrite").parquet(s"$root/centroids")
    val indexed = Similarity.assignListsCos(c, centroids, "vec_id", "cv")
    indexed
      .repartition(col("list")) // one task (→ one file) per list
      .write.mode("overwrite").partitionBy("list").parquet(s"$root/vectors")
    val meta = Meta("ivf", dim, nLists, 0, 0, c.count(), indexed.schema.json)
    writeMeta(root, meta)
    meta
  }

  /** Incrementally APPEND new vectors to a persisted IVF index — the CDC
    * shape: documents keep arriving between periodic retrains, and
    * re-training + re-encoding 10^10 stored vectors to admit a day's worth
    * of new ones is the wrong cost class. New vectors are assigned to lists
    * by the STORED centroids (no training pass) and their files land inside
    * the existing `list=<id>` directories, so probe-time partition pruning
    * is untouched; `corpusCount` (which sizes IVF-PQ's auto-refine) is
    * updated last — a reader that races the append sees the old complete
    * index, never a torn one (parquet part-files appear atomically per
    * task, and search never lists files it hasn't been told about via the
    * directory scan... the honest caveat: a CONCURRENT search's directory
    * listing may see a partial append; serialize appends against reads, or
    * front the index with the lake table when that matters).
    *
    * Append-ONLY by contract: the caller appends NEW vec_ids. Replacing an
    * existing id needs the rebuild (or the full lake-table treatment —
    * snapshots + LWW); a duplicated id would simply appear twice. Centroid
    * DRIFT is the appender's operating limit — vectors from a distribution
    * the training never saw still land in their nearest stored list
    * (search stays CORRECT at any probe count; exhaustive probe stays
    * exact), but lists grow lopsided and partial-probe recall decays ⇒
    * periodic rebuild, which is how IVF indexes are actually operated.
    */
  def appendIvf(spark: SparkSession, root: String, newVectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Meta = {
    val meta = readMeta(root)
    require(meta.variant == "ivf", s"index at $root is ${meta.variant}")
    val c = newVectors.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .localCheckpoint(true)
    requireDim(c, meta.dim)
    val centroids = spark.read.parquet(s"$root/centroids")
    Similarity.assignListsCos(c, centroids, "vec_id", "cv")
      .repartition(col("list"))
      .write.mode("append").partitionBy("list").parquet(s"$root/vectors")
    val updated = meta.copy(corpusCount = meta.corpusCount + c.count())
    writeMeta(root, updated)
    updated
  }

  /** One full scan of the batch proves every vector matches the index's
    * dimension BEFORE any file is written — a silently-appended wrong-width
    * vector would poison every later search that probes its list.
    */
  private def requireDim(c: DataFrame, dim: Int): Unit = {
    val bad = c.filter(size(col("cv")) =!= dim).count()
    require(bad == 0L,
      s"append batch has $bad vector(s) whose dimension != the index's $dim")
  }

  /** Search a persisted IVF index: probes from the stored centroids, probed
    * lists' files ONLY (partition pruning), exact-cosine re-rank. Needs no
    * corpus access — the index carries the full vectors.
    */
  def searchIvf(spark: SparkSession, root: String, queries: DataFrame, k: Int,
      nProbe: Int, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val meta = readMeta(root)
    require(meta.variant == "ivf", s"index at $root is ${meta.variant}")
    val centroids = spark.read.parquet(s"$root/centroids")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .localCheckpoint(true) // probed twice: list ranking + re-rank
    val probes = Similarity.probeListsCos(q, centroids, nProbe)
      .localCheckpoint(true)
    val probed = probes.select(col("list").cast("int")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val indexed = spark.read.schema(meta.schema).parquet(s"$root/vectors")
      .filter(col("list").isin(probed: _*))
    Similarity.searchIvfCore(indexed, probes, k)
  }

  // --- IVF-PQ --------------------------------------------------------------

  /** Train coarse + PQ codebooks, encode every vector, persist the compact
    * index: m one-byte codes + one norm per vector, list-partitioned. The
    * codes ride as an array ordered by subspace (pivoted from the model's
    * long shape), so the stored bytes stay O(m) per vector.
    */
  def buildIvfPq(corpus: DataFrame, root: String, nLists: Int = 8,
      m: Int = 8, codes: Int = 16, iters: Int = 2, trainSample: Double = 1.0,
      idCol: String = "vec_id", vecCol: String = "embedding"): Meta = {
    val model = Similarity.buildPqModel(corpus, nLists, m, codes, iters,
      trainSample, idCol, vecCol)
    model.coarse.write.mode("overwrite").parquet(s"$root/centroids")
    model.cbs.write.mode("overwrite").parquet(s"$root/codebooks")
    val wide = pivotCodes(model.encoded)
    wide
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list").parquet(s"$root/vectors")
    val meta = Meta("ivfpq", model.dim, nLists, m, codes, model.corpusCount,
      wide.schema.json)
    writeMeta(root, meta)
    meta
  }

  /** Long-shape encoded rows (vec_id, g, code, list, nv; m rows per vector)
    * pivoted to the stored one-row-per-vector shape: codes as an array
    * ordered by subspace, so the index stays O(m) bytes per vector.
    */
  private def pivotCodes(encoded: DataFrame): DataFrame =
    encoded
      .groupBy("vec_id")
      .agg(first(col("nv")).as("nv"),
        transform(
          array_sort(collect_list(struct(col("g").as("g"), col("code").as("code")))),
          e => e.getField("code").cast("int")).as("codes"),
        first(col("list")).as("list"))

  /** Incrementally APPEND new vectors to a persisted IVF-PQ index: residual-
    * encode them against the STORED coarse quantizer + codebooks (no
    * training pass — [[Similarity.encodePq]], the exact encoder the build
    * used) and append the code files into the existing list directories.
    * Same contract and caveats as [[appendIvf]] (append-only ids, serialize
    * appends against reads, quantizer drift ⇒ periodic rebuild — here drift
    * also costs CODE fidelity, since the codebooks never saw the new
    * residual distribution, so the refine window is the appended vectors'
    * safety net until the next rebuild). `corpusCount` is updated so
    * [[Similarity.effectiveRefine]]'s auto sizing tracks the real index.
    */
  def appendIvfPq(spark: SparkSession, root: String, newVectors: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): Meta = {
    val meta = readMeta(root)
    require(meta.variant == "ivfpq", s"index at $root is ${meta.variant}")
    val c = newVectors.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
      .localCheckpoint(true)
    requireDim(c, meta.dim)
    val coarse = spark.read.parquet(s"$root/centroids")
    val cbs = spark.read.parquet(s"$root/codebooks")
    pivotCodes(Similarity.encodePq(coarse, cbs, c, meta.m, meta.dim / meta.m))
      .repartition(col("list"))
      .write.mode("append").partitionBy("list").parquet(s"$root/vectors")
    val updated = meta.copy(corpusCount = meta.corpusCount + c.count())
    writeMeta(root, updated)
    updated
  }

  /** Search a persisted IVF-PQ index: ADC scoring over the probed lists'
    * code files only (partition pruning — the scan reads m bytes + a norm
    * per candidate, never a float vector), then exact re-rank against
    * `corpus` by id join (point lookups into the primary store — the index
    * stays m-bytes-per-vector). `refine` ≤ 0 = auto, sized from the stored
    * corpusCount ([[Similarity.effectiveRefine]]'s near-tie defense).
    */
  def searchIvfPq(spark: SparkSession, root: String, corpus: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int, refine: Int = 0,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val meta = readMeta(root)
    require(meta.variant == "ivfpq", s"index at $root is ${meta.variant}")
    val coarse = spark.read.parquet(s"$root/centroids")
    val cbs = spark.read.parquet(s"$root/codebooks")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .localCheckpoint(true)
    // probe ranking is L2-to-centroid (the coarse quantizer's metric), same
    // as the in-memory path — reuse searchPqCore's probing by handing it the
    // PRUNED long-shape encoded frame
    val pw = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__sc").desc)
    import graft.functions.expressions.TextExprs.l2SqCol
    val probedDf = q.join(broadcast(coarse))
      .withColumn("__sc",
        struct((-l2SqCol(col("qv"), col("centroid"))).as("s"), col("list").as("list")))
      .withColumn("__pn", org.apache.spark.sql.functions.row_number().over(pw))
      .filter(col("__pn") <= nProbe)
      .select(col("list").cast("int"))
    val probed = probedDf.distinct().collect().map(_.getInt(0)).toSeq
    val encoded = spark.read.schema(meta.schema).parquet(s"$root/vectors")
      .filter(col("list").isin(probed: _*))
      .select(col("vec_id"), posexplode(col("codes")).as(Seq("g", "code")),
        col("list"), col("nv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    Similarity.searchPqCore(encoded, coarse, cbs, c, q, k, nProbe, refine,
      meta.m, meta.dim / meta.m, meta.nLists, meta.corpusCount)
  }
}
