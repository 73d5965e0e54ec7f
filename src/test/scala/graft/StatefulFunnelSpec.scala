package graft

import graft.operators.Funnel
import graft.streaming.StatefulFunnel
import graft.streaming.StatefulFunnel.{FunnelEvent, FunnelProgress}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.util.Random

/** Live funnel change feed: greedy advance semantics (ties convert,
  * intra-batch disorder repaired, emissions only on depth increase) and
  * exact parity with the batch funnel when each key's events arrive in
  * event-time order across micro-batches.
  */
class StatefulFunnelSpec extends SparkSpecBase {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")

  private def runFeed(dir: String, name: String): Seq[FunnelProgress] = {
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[FunnelEvent]].schema)
      .option("maxFilesPerTrigger", 1) // one micro-batch per staged file
      .parquet(dir).as[FunnelEvent]
    val q = StatefulFunnel.progress(stream, steps)
      .writeStream.outputMode("append").format("memory").queryName(name)
      .option("checkpointLocation", tmpDir(s"$name-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name).as[FunnelProgress].collect().toSeq
  }

  test("depth-increase emissions; ties convert; intra-batch disorder repaired") {
    val dir = tmpDir("sf-src")
    // batch 0: A signs up; B's (view, signup) arrive DISORDERED in one batch
    // (same micro-batch sort repairs: signup then same-ts view both count)
    writeFlatParquet(Seq(
      FunnelEvent("A", 1000L, "signup"),
      FunnelEvent("B", 2000L, "view"), // ts-sorted AFTER the signup below
      FunnelEvent("B", 2000L, "signup")).toDF(), dir, "f0")
    // batch 1: A views then clicks; B stalls (click before its view time? no
    // view yet beyond depth 2 — a 'purchase' must NOT skip the click)
    writeFlatParquet(Seq(
      FunnelEvent("A", 1500L, "view"),
      FunnelEvent("A", 1600L, "click"),
      FunnelEvent("B", 2500L, "purchase")).toDF(), dir, "f1")
    val rows = runFeed(dir, "sfeed1")
    val byKey = rows.groupBy(_.key)
    // A: one emission per batch (depth 1, then depth 3)
    assert(byKey("A").map(_.depth).sorted == Seq(1, 3))
    assert(byKey("A").find(_.depth == 3).get.reachMicros.toSeq == Seq(1000L, 1500L, 1600L))
    // B: the same-ts signup+view pair converts in one batch (depth 2, once);
    // the step-skipping purchase emitted nothing
    assert(byKey("B").map(_.depth) == Seq(2))
    assert(byKey("B").head.reachMicros.toSeq == Seq(2000L, 2000L))
  }

  test("parity with batch funnelReach on per-key ordered arrival") {
    val rnd = new Random(5)
    val kinds = steps ++ Seq("noise", "ping")
    // distinct ts so the global ts-order chunking preserves per-key order
    val events = rnd.shuffle((1 to 600).toList).zipWithIndex.map { case (t, i) =>
      FunnelEvent(s"u${i % 25}", t * 1000L, kinds(rnd.nextInt(kinds.size)))
    }
    val dir = tmpDir("sf-par")
    val ordered = events.sortBy(_.tsMicros)
    ordered.grouped(200).zipWithIndex.foreach { case (chunk, i) =>
      writeFlatParquet(chunk.toDF(), dir, s"f$i")
    }
    val feed = runFeed(dir, "sfeed2")
    // final state per key = the max-depth emission
    val finalByKey = feed.groupBy(_.key).map { case (k, es) =>
      k -> es.maxBy(_.depth)
    }
    val batch = Funnel.funnelReach(
      events.toDF().select(col("key"), timestamp_micros(col("tsMicros")).as("ts"),
        col("step")), "key", "ts", "step", steps)
      .collect().map { r =>
        r.getString(0) -> (r.getLong(5).toInt, (1 to 4).flatMap(i =>
          Option(r.getTimestamp(i)).map(t => t.getTime * 1000L)))
      }.toMap
    assert(finalByKey.keySet == batch.keySet, "same keys reach step 0")
    batch.foreach { case (k, (depth, reach)) =>
      assert(finalByKey(k).depth == depth, s"depth mismatch for $k")
      assert(finalByKey(k).reachMicros.toSeq == reach, s"reach mismatch for $k")
    }
    // emissions are strictly monotone in depth per key
    feed.groupBy(_.key).values.foreach { es =>
      val ds = es.map(_.depth)
      assert(ds.distinct.size == ds.size)
    }
  }
}
