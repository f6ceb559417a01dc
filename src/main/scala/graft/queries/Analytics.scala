package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Composite multi-operator analytics — TPC-H-shaped queries adapted to
  * the fixture schema plus a funnel analysis in the reference's
  * event-stream idiom. These exercise operator *composition* (the way a
  * real user chains scans, joins, aggs, windows, and top-k) rather than
  * one operator per query.
  */
object Analytics extends QueryModule {

  val queries: Map[String, Q] = Map(
    // TPC-H Q3 shape (shipping priority): segment filter, date band,
    // 3-way join, grouped revenue, top-10.
    "q_shipping_priority" -> ((s, dir) => {
      val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q10 shape (returned items): revenue lost to returns per
    // customer, dimension join chain, top-20.
    "q_returned_items" -> ((s, dir) => {
      val l = Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
      l.join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Event funnel: per user, first view -> first click after that view
    // -> first purchase after that click; stage conversion counts.
    "q_event_funnel" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val v = e.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_view"))
      val cl = e.filter(col("event_type") === "click")
        .join(v, Seq("user_id"))
        .filter(col("ts") >= col("first_view"))
        .groupBy(col("user_id"), col("first_view"))
        .agg(min(col("ts")).as("first_click"))
      val p = e.filter(col("event_type") === "purchase")
        .join(cl, Seq("user_id"))
        .filter(col("ts") >= col("first_click"))
        .groupBy(col("user_id"))
        .agg(min(col("ts")).as("first_purchase"))
      v.select(lit("1_viewed").as("stage"), col("user_id"))
        .union(cl.select(lit("2_clicked").as("stage"), col("user_id")))
        .union(p.select(lit("3_purchased").as("stage"), col("user_id")))
        .groupBy("stage").agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("stage")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_returned_items" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_event_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS first_view
        |  FROM events WHERE event_type = 'view' GROUP BY user_id
        |), cl AS (
        |  SELECT e.user_id, v.first_view, min(CAST(e.ts AS TIMESTAMP)) AS first_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) >= v.first_view
        |  GROUP BY e.user_id, v.first_view
        |), p AS (
        |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS first_purchase
        |  FROM events e JOIN cl ON e.user_id = cl.user_id
        |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= cl.first_click
        |  GROUP BY e.user_id
        |)
        |SELECT stage, count(DISTINCT user_id) AS n_users FROM (
        |  SELECT '1_viewed' AS stage, user_id FROM v
        |  UNION ALL SELECT '2_clicked', user_id FROM cl
        |  UNION ALL SELECT '3_purchased', user_id FROM p)
        |GROUP BY stage ORDER BY stage""".stripMargin,
  )
}
