package graft.queries

import graft.Tables
import graft.io.Bucketing
import graft.ops.{Scalars, Skew}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-technique queries whose RESULTS are identical to their naive
  * forms — the oracle states the plain query; the Spark side runs the
  * scale plan (salting, bucketing). This is the point: skew and
  * co-location tactics must be semantically invisible.
  */
object QScale {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Salted skew join: lineitem's hottest key pattern (l_partkey) vs
    // the part dim, salted 8 ways; aggregated result == plain join.
    "q_skew_join_salted" -> ((s, dir) => {
      val t = Tables(s, dir)
      Skew.saltedJoin(
        t.lineitem.select(col("l_partkey"), Scalars.dec(col("l_quantity")).as("qty")),
        t.part.select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey", buckets = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).cast("double").as("total_qty"))
    }),

    // Two-stage salted aggregation: partial per (key, salt), merge per
    // key — result identical to the plain groupBy (the oracle).
    "q_skew_agg_twostage" -> ((s, dir) => {
      val t = Tables(s, dir)
      Skew.saltedAgg(
        t.lineitem.select(col("l_returnflag"), Scalars.dec(col("l_quantity")).as("qty")),
        "l_returnflag", buckets = 8,
        partials = Seq(count(lit(1)).as("pn"), sum(col("qty")).as("pq")),
        merges = Seq(sum(col("pn")).as("n_items"),
          sum(col("pq")).cast("double").as("total_qty")))
    }),

    // Bucketed co-located fact-fact join: lineitem and orders bucketed
    // by orderkey into catalog tables, joined shuffle-free, aggregated.
    "q_bucketed_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      val suffix = dir.replaceAll("[^A-Za-z0-9]", "_")
      val lt = s"bkt_lineitem_$suffix"; val ot = s"bkt_orders_$suffix"
      Bucketing.writeBucketed(
        t.lineitem.select(col("l_orderkey"), Scalars.dec(col("l_quantity")).as("qty")),
        lt, "l_orderkey", 8)
      Bucketing.writeBucketed(
        t.orders.select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        ot, "l_orderkey", 8)
      Bucketing.bucketedJoin(s, lt, ot, "l_orderkey")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"), sum(col("qty")).cast("double").as("total_qty"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q_skew_join_salted" ->
      """SELECT p_brand, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q_skew_agg_twostage" ->
      """SELECT l_returnflag, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem GROUP BY l_returnflag""",
    "q_bucketed_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority"""
  )
}
