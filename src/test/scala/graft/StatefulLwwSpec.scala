package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.streaming.StatefulLww
import org.apache.spark.sql.streaming.Trigger

class StatefulLwwSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  test("stateful change feed: last emission per key equals the oracle fold") {
    val dir = tmpDir("slww-src")
    Generator.writeChangelog(spark, dir, 3000, numConvs = 12, turnsPerConv = 5,
      numFiles = 6, seed = 44)
    val stream = spark.readStream.schema(Model.changeEventSchema).parquet(dir)
      .as[ChangeEvent](Model.changeEventEncoder)
    val q = StatefulLww.changeFeed(stream)
      .writeStream.outputMode("append").format("memory").queryName("feed")
      .option("checkpointLocation", tmpDir("slww-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val all = Generator.events(spark, 3000, 12, 5, seed = 44)
      .as[ChangeEvent].collect().toSeq
    val oracle = Generator.oracleFold(all).map { case (k, e) => k -> ((e.text, e.seq)) }

    // the LAST emission per key (highest seq among emissions... emissions are
    // monotone in version per key, so max-(ts,seq) emission is the final one)
    val feed = spark.table("feed").collect()
      .map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        ((r.getAs[String]("text"), r.getAs[Long]("seq"),
          r.getAs[java.sql.Timestamp]("ts"))))
    val last = feed.groupBy(_._1).map { case (k, es) =>
      k -> { val w = es.map(_._2).maxBy(v => (v._3.getTime, v._2)); (w._1, w._2) }
    }
    // keys whose final state is deleted never appear as final winners in the
    // oracle; the feed may contain their earlier (pre-delete) emissions, and
    // a key can end deleted after emitting — so compare on the oracle's keys.
    assert(oracle.keySet.subsetOf(last.keySet))
    oracle.foreach { case (k, v) => assert(last(k) == v, s"key $k") }
  }
}
