package graft.operators

import graft.SparkSpecBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable
import scala.util.Random

/** Property test for the persisted index's mutation lifecycle: random
  * interleavings of insert/update/delete batches (one net change per id per
  * batch — the enforced contract) applied via [[AnnIndex.applyChanges]]
  * must keep EXHAUSTIVE search equal to brute force over a model map of
  * the surviving corpus, for both the full-vector and the coded index.
  * The unit specs pin each LWW shape once (cross-list update, revive,
  * torn-batch rollback); this pins that no SEQUENCE of shapes compounds
  * into drift — the same role LwwPropertySpec plays for the table engine.
  */
class AnnMutationPropertySpec extends SparkSpecBase {
  import spark.implicits._

  // deterministic vector for (id, salt): same 4-cluster geometry as
  // AnnIndexSpec so list assignment and probes stay meaningful
  private def vecOf(id: Long, salt: Int): Seq[Float] = {
    val cl = ((id + salt) % 4).toInt
    Array.tabulate(16) { d =>
      val base = if (d / 4 == cl) 1.0f else 0.0f
      base + 0.05f * (((id * 31 + d * 7 + salt * 13) % 11).toInt - 5)
    }.toSeq
  }

  private def toDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def key(r: org.apache.spark.sql.Row) =
    (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Long]("vec_id"),
      r.getAs[Double]("cosine"))

  private def runLifecycle(variant: String, seed: Int): Unit = {
    val rnd = new Random(seed)
    val root = tmpDir(s"ann-prop-$variant-$seed")
    // model: the surviving corpus the index must agree with
    val model = mutable.Map((0L until 60L).map(id => id -> vecOf(id, 0)): _*)
    val base = toDf(model.toSeq).localCheckpoint(true)
    if (variant == "ivf") AnnIndex.buildIvf(base, root, nLists = 4, iters = 3)
    else AnnIndex.buildIvfPq(base, root, nLists = 4, m = 8, codes = 16, iters = 2)

    var salt = 0
    for (round <- 1 to 6) {
      salt += 1
      // one net change per id per batch (distinct ids), mixing all three
      // change types against the model's CURRENT state
      val ids = rnd.shuffle((0L until 70L).toVector).take(8)
      val changes = ids.map { id =>
        if (model.contains(id)) {
          if (rnd.nextBoolean()) { // update
            val v = vecOf(id, salt); model(id) = v; (id, v, "update")
          } else { model.remove(id); (id, null.asInstanceOf[Seq[Float]], "delete") }
        } else { // insert (including revives of earlier deletes)
          val v = vecOf(id, salt); model(id) = v; (id, v, "insert")
        }
      }
      val m = AnnIndex.applyChanges(spark, root,
        changes.toDF("vec_id", "embedding", "change_type"))
      assert(m.gen == round.toLong, s"round $round: gen drifted to ${m.gen}")
      assert(m.corpusCount == model.size.toLong,
        s"round $round: corpusCount ${m.corpusCount} != model ${model.size}")

      val corpus = toDf(model.toSeq).localCheckpoint(true)
      val queries = corpus.filter($"vec_id" % 15 === 0)
      val got = (if (variant == "ivf")
          AnnIndex.searchIvf(spark, root, queries, k = 5, nProbe = 4)
        else
          AnnIndex.searchIvfPq(spark, root, corpus, queries, k = 5, nProbe = 4,
            refine = Int.MaxValue)
        ).collect().map(key).toSet
      val bf = Similarity.bruteForceTopK(corpus, queries, k = 5)
        .collect().map(key).toSet
      assert(got == bf, s"round $round ($variant, seed $seed): search drifted " +
        s"from brute force over the surviving corpus")
    }
    // the full-visibility check: every survivor appears exactly once, no
    // deleted id ever resurfaces — the compounding-duplicates failure mode
    val corpus = toDf(model.toSeq).localCheckpoint(true)
    val probe = corpus.limit(1)
    val everyone = (if (variant == "ivf")
        AnnIndex.searchIvf(spark, root, probe, k = 1000, nProbe = 4)
      else
        AnnIndex.searchIvfPq(spark, root, corpus, probe, k = 1000, nProbe = 4,
          refine = Int.MaxValue)
      ).collect()
    assert(everyone.length == model.size - 1) // all minus self
    val seen = everyone.map(_.getAs[Long]("vec_id"))
    assert(seen.distinct.length == seen.length, "an id surfaced twice")
    assert(seen.forall(model.contains), "a deleted id resurfaced")
  }

  test("ivf: 6 random mutation batches stay brute-force-exact (2 seeds)") {
    runLifecycle("ivf", seed = 7)
    runLifecycle("ivf", seed = 23)
  }

  test("ivfpq: same lifecycle over the coded index") {
    runLifecycle("ivfpq", seed = 7)
  }
}
