package graft

import graft.changelog.{Changelog, Generator}
import graft.operators.Lww
import org.apache.spark.sql.DataFrame

class LwwSpec extends SparkSpecBase {

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("agg, window, and salted LWW variants agree on the derived changelog") {
    val cl = Changelog.fromEvents(spark, "/root/testdata/sf0.001")
    val a = canon(Lww.latestByKeyAgg(cl))
    val w = canon(Lww.latestByKeyWindow(cl))
    val s = canon(Lww.latestByKeySalted(cl, salts = 8))
    assert(a == w)
    assert(a == s)
    assert(a.nonEmpty)
  }

  test("LWW is permutation-invariant: shuffled input yields identical winners") {
    val ev = Generator.events(spark, 5000, numConvs = 20, turnsPerConv = 10, seed = 7)
    val base = canon(Lww.latestByKeyAgg(ev))
    // random repartition + sortWithinPartitions scrambles physical order
    val shuffled = ev.repartition(7).sortWithinPartitions("text")
    assert(canon(Lww.latestByKeyAgg(shuffled)) == base)
    val shuffled2 = ev.orderBy(org.apache.spark.sql.functions.col("seq").desc)
    assert(canon(Lww.latestByKeyAgg(shuffled2)) == base)
  }

  test("generator produces duplicates, deletes, and skew") {
    val ev = Generator.events(spark, 10000, numConvs = 50, turnsPerConv = 10, seed = 42)
    val n = ev.count()
    val keys = ev.select("conv_id", "turn_idx").distinct().count()
    assert(n == 10000)
    assert(keys < n, "expected duplicate keys")
    val ops = ev.groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ops.keySet == Set("insert", "update", "delete"))
    assert(ops("delete") > n / 20 && ops("delete") < n / 5)
    // zipf skew: hottest conversation ≫ median
    val per = ev.groupBy("conv_id").count().collect().map(_.getLong(1)).sorted
    assert(per.last > per(per.length / 2) * 3, "expected hot-conversation skew")
  }
}
