package graft

import graft.changelog.Changelog
import graft.operators.Lww
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 that is SQL-expressible appears here twice:
  * once as a Spark query in [[queries]], once as DuckDB SQL in [[oracleSql]].
  * The CDC queries run over the deterministic transcript changelog derived
  * from `events.parquet` ([[graft.changelog.Changelog]]); both sides derive
  * it with bit-identical expressions.
  */
object SparkEntry {

  private def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full cold-start replay of the changelog → final table state.
    * Driver smoke-checks rows>0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame =
    replayFinal(spark, "/root/testdata/sf0.001")

  // --- CDC core ---------------------------------------------------------

  private def changelog(s: SparkSession, dir: String): DataFrame =
    Changelog.fromEvents(s, dir)

  private def lwwWinners(s: SparkSession, dir: String): DataFrame =
    Lww.latestByKeyAgg(changelog(s, dir))

  private def replayFinal(s: SparkSession, dir: String): DataFrame =
    lwwWinners(s, dir)
      .filter(col("op") =!= "delete")
      .select("conv_id", "turn_idx", "role", "text", "tool", "ts", "seq")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F5/N4/§2.8: projection + CASE routing + typed casts over raw events.
    "cdc_changelog" -> ((s, dir) => changelog(s, dir)),

    // C4/F7/A1 (§2.5): LWW dedup. Engine uses max_by partial agg; the window
    // variant is proven equal in LwwSpec and mirrored by the oracle.
    "cdc_lww_dedup" -> ((s, dir) => lwwWinners(s, dir)),

    // §3.1: cold-start replay → final table state (deletes applied).
    "cdc_replay_final" -> ((s, dir) => replayFinal(s, dir)),

    // A1/A2: max version per key + duplicate-chain length.
    "cdc_max_ts" -> ((s, dir) =>
      changelog(s, dir).groupBy("conv_id", "turn_idx")
        .agg(max("ts").as("max_ts"), count(lit(1)).as("n_versions"))),

    // A3/A4: conversion/apply statistics per op type.
    "cdc_op_stats" -> ((s, dir) =>
      changelog(s, dir).groupBy("op")
        .agg(count(lit(1)).as("n_events"),
          countDistinct("conv_id").as("n_convs"),
          countDistinct("conv_id", "turn_idx").as("n_keys"))),

    // J3: delete anti-join — final surviving keys = all keys minus keys whose
    // LWW winner is a delete.
    "cdc_delete_keys" -> ((s, dir) =>
      lwwWinners(s, dir).filter(col("op") === "delete")
        .select("conv_id", "turn_idx", "ts", "seq")),

    // §2.5 stable turn ordering: final transcript with per-conversation
    // turn rank and previous role (window lag).
    "cdc_turn_order" -> ((s, dir) => {
      val w = Window.partitionBy("conv_id").orderBy("turn_idx")
      // rank cast to long: DuckDB ROW_NUMBER() is BIGINT, keep schemas equal.
      replayFinal(s, dir)
        .withColumn("turn_rank", row_number().over(w).cast("long"))
        .withColumn("prev_role", lag("role", 1).over(w))
    }),

    // --- relational surface (SURVEY §2.2/2.3/2.4/2.6) -------------------

    // A: multi-aggregate scan with pushed filter (TPC-H Q1 shape).
    "q1_agg" -> ((s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))),

    // J1: star join, dims broadcast.
    "q_join_dim" -> ((s, dir) => {
      val o = table(s, dir, "orders")
      val c = table(s, dir, "customer")
      val n = table(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum("o_totalprice"), 2).as("revenue"))
    }),

    // J3-shape: anti join (customers that never ordered).
    "q_anti_join" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val o = table(s, dir, "orders").select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // L/top-k: top-3 orders per customer, deterministic tie-break.
    "q_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      table(s, dir, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    }))

  private val C = Changelog.DuckDbCte

  def oracleSql: Map[String, String] = Map(
    "cdc_changelog" -> s"$C SELECT * FROM changelog",

    "cdc_lww_dedup" ->
      s"""$C SELECT conv_id, turn_idx, role, text, tool, ts, op, seq FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
         |    ORDER BY ts DESC, seq DESC) AS rn FROM changelog) t
         |WHERE rn = 1""".stripMargin,

    "cdc_replay_final" ->
      s"""$C SELECT conv_id, turn_idx, role, text, tool, ts, seq FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
         |    ORDER BY ts DESC, seq DESC) AS rn FROM changelog) t
         |WHERE rn = 1 AND op <> 'delete'""".stripMargin,

    "cdc_max_ts" ->
      s"""$C SELECT conv_id, turn_idx, MAX(ts) AS max_ts, COUNT(*) AS n_versions
         |FROM changelog GROUP BY conv_id, turn_idx""".stripMargin,

    "cdc_op_stats" ->
      s"""$C SELECT op, COUNT(*) AS n_events, COUNT(DISTINCT conv_id) AS n_convs,
         |  COUNT(DISTINCT conv_id || '#' || CAST(turn_idx AS VARCHAR)) AS n_keys
         |FROM changelog GROUP BY op""".stripMargin,

    "cdc_delete_keys" ->
      s"""$C SELECT conv_id, turn_idx, ts, seq FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
         |    ORDER BY ts DESC, seq DESC) AS rn FROM changelog) t
         |WHERE rn = 1 AND op = 'delete'""".stripMargin,

    "cdc_turn_order" ->
      s"""$C, final AS (
         |  SELECT conv_id, turn_idx, role, text, tool, ts, seq FROM (
         |    SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id, turn_idx
         |      ORDER BY ts DESC, seq DESC) AS rn FROM changelog) t
         |  WHERE rn = 1 AND op <> 'delete')
         |SELECT *, ROW_NUMBER() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS turn_rank,
         |  LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role
         |FROM final""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_dim" ->
      """SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |  FROM orders) t
        |WHERE rk <= 3""".stripMargin)
}
