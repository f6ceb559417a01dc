package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Aggregation operators (SURVEY §2B B27–B36).
  *
  * The keyed hash aggregate is the Spark analog of the reference's
  * FieldsGrouping + counting-bolt pattern (Storm model: tuples hash-routed
  * by key to a stateful bolt instance). Spark plans these as partial
  * (map-side) + final HashAggregate around a single key shuffle — the
  * scalable form of the same computation.
  *
  * Oracle-parity rules applied throughout (SURVEY §3.3):
  *  - every DOUBLE aggregate is `round(_, 4)` on BOTH engines (partial-agg
  *    ordering makes low bits nondeterministic);
  *  - BIGINT sums are cast explicitly in the DuckDB SQL (DuckDB widens
  *    integer SUM to HUGEINT, Spark to LONG);
  *  - deterministic total ORDER BY with unique-key tie-breaks.
  */
object Aggregates extends QueryModule {

  val queries: Map[String, Q] = Map(
    // B27 keyed hash agg — TPC-H Q1 shape (also the BENCH headline q_pricing_summary).
    "q_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 4).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // B28 global agg (GlobalGrouping analog) — no key, single partial→final pass.
    "q_global_agg" -> ((s, dir) => {
      Tables.orders(s, dir).agg(
        count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 4).as("sum_price"),
        round(avg(col("o_totalprice")), 4).as("avg_price"),
        round(min(col("o_totalprice")), 4).as("min_price"),
        round(max(col("o_totalprice")), 4).as("max_price"))
    }),

    // B29 distinct agg — BENCH headline q_distinct_users.
    "q_distinct_users" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),4) AS sum_qty,
        | round(sum(l_extendedprice),4) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),4) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_global_agg" ->
      """SELECT count(*) AS n_orders,
        | round(sum(o_totalprice),4) AS sum_price,
        | round(avg(o_totalprice),4) AS avg_price,
        | round(min(o_totalprice),4) AS min_price,
        | round(max(o_totalprice),4) AS max_price
        |FROM orders""".stripMargin,

    "q_distinct_users" ->
      """SELECT event_type,
        | count(DISTINCT user_id) AS n_users,
        | count(*) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
  )
}
