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

  /** Versioned warehouse for q_sql_merge: `custs` v0 = the customer
    * fixture (4 columns). ALWAYS rebuilt — MERGE mutates the table, so
    * determinism requires a fresh v0 every invocation. The catalog name
    * is per sf dir (Spark snapshots catalog options per name) but the
    * root is stable per dir, so re-registering is idempotent.
    */
  private def mergeWarehouse(s: org.apache.spark.sql.SparkSession, dir: String,
      tag: String = "merge"): String =
    this.synchronized {
      import org.apache.spark.sql.functions.col
      val root = s"/tmp/graft_sql${tag}_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      graft.ops.Sinks.publishVersioned(
        Tables.customer(s, dir).select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_mktsegment")),
        root + "/custs", None)
      val cat = s"graftsql${tag}_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", root)
      cat
    }

  /** B-MERGE through the SQL front door (GraftDmlRule): all four clause
    * kinds — conditional DELETE, UPDATE, INSERT, and NOT MATCHED BY
    * SOURCE — against a versioned catalog table, committed through the
    * same OCC publish as every other write. The oracle recomputes the
    * identical merge as three relational branches in DuckDB, so a hash
    * match proves the SQL-DML path lands on exactly the full-recompute
    * answer. Scale shape: ONE left-anti-free outer join target×source
    * plus the cardinality aggregation — no per-row driver work.
    */
  private def mergeSql(cat: String): String =
    s"""MERGE INTO $cat.custs t
       |USING (
       |  SELECT o_custkey AS k, count(*) AS n_ord,
       |         round(sum(o_totalprice), 2) AS total
       |  FROM orders GROUP BY o_custkey
       |  UNION ALL
       |  SELECT -o_custkey, count(*), round(sum(o_totalprice), 2)
       |  FROM orders WHERE o_custkey <> 0
       |  GROUP BY o_custkey HAVING count(*) % 3 = 0
       |) s
       |ON t.c_custkey = s.k
       |WHEN MATCHED AND s.n_ord = 1 THEN DELETE
       |WHEN MATCHED THEN UPDATE SET c_acctbal = s.total, c_mktsegment = 'MERGED'
       |WHEN NOT MATCHED THEN INSERT (c_custkey, c_name, c_acctbal, c_mktsegment)
       |  VALUES (s.k, concat('Customer#New', CAST(-s.k AS STRING)), s.total, 'INSERTED')
       |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_mktsegment = 'IDLE'""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_sql_pricing" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(pricingSql) }),
    "q_sql_revenue" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(revenueSql) }),
    "q_sql_window" -> ((s, dir) => { Tables.registerAll(s, dir); s.sql(windowSql) }),
    "q_sql_merge" -> ((s, dir) => {
      Tables.registerAll(s, dir)
      val cat = mergeWarehouse(s, dir)
      s.sql(mergeSql(cat))
      s.sql(s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
               |  c_mktsegment
               |FROM $cat.custs ORDER BY c_custkey""".stripMargin)
    }),

    // UPDATE through the SQL door: per-column CASE rewrite, one
    // projection scan, published as the next version. The oracle is the
    // same CASE projection in DuckDB.
    "q_sql_update" -> ((s, dir) => {
      val cat = mergeWarehouse(s, dir, tag = "upd")
      s.sql(s"""UPDATE $cat.custs
               |SET c_acctbal = round(c_acctbal * 1.1, 2),
               |    c_mktsegment = concat(c_mktsegment, '_ADJ')
               |WHERE c_acctbal < 0""".stripMargin)
      s.sql(s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
               |  c_mktsegment
               |FROM $cat.custs ORDER BY c_custkey""".stripMargin)
    }),

    // DELETE through the SQL door: three-valued semantics (only TRUE
    // deletes), one filtered scan. Oracle = the complementary filter.
    "q_sql_delete" -> ((s, dir) => {
      val cat = mergeWarehouse(s, dir, tag = "del")
      s.sql(s"""DELETE FROM $cat.custs
               |WHERE c_acctbal < 0 OR c_mktsegment = 'BUILDING'""".stripMargin)
      s.sql(s"""SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
               |  c_mktsegment
               |FROM $cat.custs ORDER BY c_custkey""".stripMargin)
    }),
  )

  // the SAME text is the oracle — that identity is the point of E2
  // (q_sql_merge's oracle is instead the merge's relational recompute:
  // DuckDB has no MERGE over our versioned layout to run verbatim)
  val oracles: Map[String, String] = Map(
    "q_sql_pricing" -> pricingSql,
    "q_sql_revenue" -> revenueSql,
    "q_sql_window" -> windowSql,
    "q_sql_merge" ->
      """WITH pos AS (
        |  SELECT o_custkey AS k, count(*) AS n_ord,
        |         round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY o_custkey
        |),
        |neg AS (SELECT -k AS k, n_ord, total FROM pos
        |        WHERE n_ord % 3 = 0 AND k <> 0)
        |SELECT t.c_custkey, t.c_name, round(s.total, 2) AS c_acctbal,
        |       'MERGED' AS c_mktsegment
        |FROM customer t JOIN pos s ON t.c_custkey = s.k
        |WHERE s.n_ord <> 1
        |UNION ALL
        |SELECT t.c_custkey, t.c_name, round(t.c_acctbal, 2), 'IDLE'
        |FROM customer t LEFT JOIN pos s ON t.c_custkey = s.k
        |WHERE s.k IS NULL
        |UNION ALL
        |SELECT n.k, 'Customer#New' || CAST(-n.k AS VARCHAR), round(n.total, 2),
        |       'INSERTED'
        |FROM neg n
        |ORDER BY c_custkey""".stripMargin,

    "q_sql_update" ->
      """SELECT c_custkey, c_name,
        |  round(CASE WHEN c_acctbal < 0
        |             THEN round(c_acctbal * 1.1, 2) ELSE c_acctbal END, 2)
        |    AS c_acctbal,
        |  CASE WHEN c_acctbal < 0 THEN c_mktsegment || '_ADJ'
        |       ELSE c_mktsegment END AS c_mktsegment
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q_sql_delete" ->
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS c_acctbal,
        |  c_mktsegment
        |FROM customer
        |WHERE NOT (c_acctbal < 0 OR c_mktsegment = 'BUILDING')
        |ORDER BY c_custkey""".stripMargin,
  )
}
