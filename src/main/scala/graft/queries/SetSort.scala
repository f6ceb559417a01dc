package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sort / limit / set operators (SURVEY §2B B41–B46).
  *
  * Global sort uses Spark's range partitioner (sampled split points) —
  * the 100 TB-safe total order. `orderBy(...).limit(k)` is planned as
  * TakeOrderedAndProject (per-partition top-k + driver merge), never a
  * full sort-then-limit.
  */
object SetSort extends QueryModule {

  private def countOf(df: DataFrame, name: String): DataFrame =
    df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))

  val queries: Map[String, Q] = Map(
    // B41 total sort (range-partitioned).
    "q_sort_full" -> ((s, dir) => {
      Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    }),

    // B43 global top-K (TakeOrderedAndProject).
    "q_topn" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // B44+B45 union all/distinct, intersect(_all), except(_all) as one result.
    "q_set_ops" -> ((s, dir) => {
      val c = Tables.customer(s, dir).select(col("c_nationkey").as("key"))
      val p = Tables.supplier(s, dir).select(col("s_nationkey").as("key"))
      countOf(c.union(p), "union_all")
        .union(countOf(c.union(p).distinct(), "union_distinct"))
        .union(countOf(c.intersect(p), "intersect"))
        .union(countOf(c.intersectAll(p), "intersect_all"))
        .union(countOf(c.except(p), "except"))
        .union(countOf(c.exceptAll(p), "except_all"))
        .orderBy("op")
    }),

    // B46 dedup via dropDuplicates on a key projection (survivor-free shape).
    "q_distinct_proj" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderstatus"))
        .dropDuplicates()
        .orderBy("o_custkey", "o_orderstatus")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q_sort_full" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier ORDER BY s_acctbal DESC, s_suppkey""".stripMargin,

    "q_topn" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q_set_ops" ->
      """SELECT 'union_all' AS op, (SELECT count(*) FROM (SELECT c_nationkey AS key FROM customer UNION ALL SELECT s_nationkey FROM supplier)) AS n
        |UNION ALL SELECT 'union_distinct', (SELECT count(*) FROM (SELECT c_nationkey FROM customer UNION SELECT s_nationkey FROM supplier))
        |UNION ALL SELECT 'intersect', (SELECT count(*) FROM (SELECT c_nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier))
        |UNION ALL SELECT 'intersect_all', (SELECT count(*) FROM (SELECT c_nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier))
        |UNION ALL SELECT 'except', (SELECT count(*) FROM (SELECT c_nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier))
        |UNION ALL SELECT 'except_all', (SELECT count(*) FROM (SELECT c_nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier))
        |ORDER BY op""".stripMargin,

    "q_distinct_proj" ->
      """SELECT DISTINCT o_custkey, o_orderstatus
        |FROM orders ORDER BY o_custkey, o_orderstatus""".stripMargin,
  )
}
