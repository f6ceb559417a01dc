package graft.queries

import graft.Q
import graft.io.Tables

/** E2 — the SQL-string entry point, oracled end-to-end: each query is ONE
  * dialect-portable SQL text that Spark runs through its full
  * parse → analyze → optimize → execute path over [[Tables.registerAll]]
  * temp views, and DuckDB runs VERBATIM as the oracle. Hash equality
  * therefore verifies the SQL front door itself (not just the DataFrame
  * surface the other modules exercise) — and because the views are bare
  * parquet scans, Catalyst's pushdown/pruning work on these plans exactly
  * as on the DataFrame twins.
  */
object SqlEntry extends QueryModule {

  /** TPC-H Q1 twin of q_pricing_summary, as portable SQL text. */
  private val pricingSql =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity), 4) AS sum_qty,
      | round(sum(l_extendedprice), 2) AS sum_base_price,
      | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      | round(avg(l_quantity), 4) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Three-table join + agg through the SQL door (Q5-ish revenue rollup). */
  private val revenueSql =
    """SELECT n_name,
      | count(*) AS n_orders,
      | round(sum(o_totalprice), 2) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Window functions through the SQL door: top-3 customers by account
    * balance per market segment (rank + frame-based running share).
    */
  private val windowSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rnk AS INTEGER) AS rnk FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal,
      |    rank() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS rnk
      |  FROM customer) t
      |WHERE rnk <= 3
      |ORDER BY c_mktsegment, rnk""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sql_pricing" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(pricingSql) }),
    "q_sql_revenue" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(revenueSql) }),
    "q_sql_window" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(windowSql) }),
  )

  // the SAME text is the oracle — that identity is the point of E2
  val oracles: Map[String, String] = Map(
    "q_sql_pricing" -> pricingSql,
    "q_sql_revenue" -> revenueSql,
    "q_sql_window" -> windowSql,
  )
}
