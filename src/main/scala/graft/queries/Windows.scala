package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytic window functions (SURVEY §2B B37–B40).
  *
  * Determinism rule: every window ORDER BY ends in a unique key
  * (orderkey/custkey/linenumber) so rank/lag results are stable across
  * engines. Running sums accumulate in identical sequence on both engines
  * (same total order), so their doubles match bit-for-bit; they are still
  * rounded defensively.
  */
object Windows extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B37+B40 top-K per group — BENCH headline q_window_topk.
    "q_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // B37 ranking family.
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          round(percent_rank().over(w), 6).as("prank"),
          ntile(4).over(w).as("quartile"))
        .orderBy("c_custkey")
    }),

    // B37 cumulative distribution (rational values — exact at 6dp).
    "q_window_cumedist" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_mktsegment"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy("c_custkey")
    }),

    // B38 analytic family: lag/lead/first/last/nth.
    "q_window_analytic" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(wAll).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(wAll).as("second_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // B39 frame specs: running sum, moving average, numeric range frame.
    // NOTE (measured at sf0.1): (l_orderkey, l_linenumber) is NOT unique
    // in the fixture — the order must also include the aggregated columns
    // so that residual ties are between identical values (frame contents
    // then form the same multiset under any tie order).
    "q_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
      val wq = Window.partitionBy(col("l_suppkey")).orderBy(col("l_quantity"))
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          round(sum(col("l_extendedprice")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)), 2).as("running_sum"),
          round(avg(col("l_quantity")).over(w.rowsBetween(-3, 0)), 4).as("moving_avg"),
          round(sum(col("l_quantity")).over(wq.rangeBetween(-5, 0)), 4).as("range_sum"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    }),

    // B37 ntile feature binning: order values -> deciles -> per-bin
    // stats (the quantile-bucketing pass ML feature pipelines run).
    // Tie-broken by o_orderkey so bin assignment is deterministic.
    // Scale note: an unpartitioned ntile windows through ONE task (exact
    // global ranks demand it); at 100 TB the same binning is done with
    // approx_percentile boundaries + width_bucket — exactness here is
    // what makes the oracle hash-match.
    "q_ntile_bins" -> ((s, dir) => {
      val w = Window.orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, dir)
        .withColumn("decile", ntile(10).over(w))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"),
          round(min(col("o_totalprice")), 2).as("lo"),
          round(max(col("o_totalprice")), 2).as("hi"),
          round(avg(col("o_totalprice")), 4).as("mean"))
        .orderBy("decile")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_window_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_window_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        | CAST(rank() OVER w AS INTEGER) AS rnk,
        | CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        | round(percent_rank() OVER w, 6) AS prank,
        | CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q_window_cumedist" ->
      """SELECT c_custkey, c_mktsegment,
        | round(cume_dist() OVER (PARTITION BY c_mktsegment
        |   ORDER BY c_acctbal DESC, c_custkey), 6) AS cdist
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_window_analytic" ->
      """SELECT o_custkey, o_orderkey,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER wa AS last_price,
        | nth_value(o_totalprice, 2) OVER wa AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |  wa AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q_window_frames" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
        | round(avg(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg,
        | round(sum(l_quantity) OVER (PARTITION BY l_suppkey
        |   ORDER BY l_quantity
        |   RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 4) AS range_sum
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,

    "q_ntile_bins" ->
      """SELECT decile, count(*) AS n,
        | round(min(o_totalprice),2) AS lo,
        | round(max(o_totalprice),2) AS hi,
        | round(avg(o_totalprice),4) AS mean
        |FROM (
        |  SELECT o_totalprice,
        |    CAST(ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS decile
        |  FROM orders) t
        |GROUP BY decile ORDER BY decile""".stripMargin,
  )
}
