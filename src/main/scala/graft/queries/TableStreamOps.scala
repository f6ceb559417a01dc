package graft.queries

import graft.Q
import graft.io.Tables
import org.apache.spark.sql.functions._

/** B118 O(delta) appends + B119 streaming table tier, oracled end to end:
  * tables are built through the REAL append/restore/stream machinery
  * (hardlink carry-over, OCC commits, foreachBatch appends, the feed
  * directory), and every query's result is recomputed by DuckDB straight
  * from the raw fixtures — a hash match proves the table contents (or
  * feed contents) survived the machinery bit-for-bit.
  */
object TableStreamOps extends QueryModule {

  /** Versioned orders table built by append: v0 = even orderkeys
    * (published with o_orderkey footer stats), v1 = odd orderkeys
    * APPENDED (O(delta): even files carried by hardlink) with the insert
    * feed emitted into the streaming feed dir. Cached per sf dir;
    * rebuilt when the fixture regenerates.
    */
  private def appendTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.Sinks
      val tbl = "/tmp/graft_append_" + dir.replaceAll("[^A-Za-z0-9.]", "_") + "/orders"
      val stampFile = Paths.get(tbl, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "orders")
      val fresh = Files.isDirectory(Paths.get(tbl)) &&
        Sinks.listVersions(tbl) == Seq(0L, 1L) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(tbl).getParent)
        val orders = Tables.orders(s, dir).select(
          col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        Sinks.enableStreamFeed(tbl)
        Sinks.publishVersioned(orders.filter(col("o_orderkey") % 2 === 0),
          tbl, None, statsCols = Seq("o_orderkey"))
        Sinks.appendVersioned(orders.filter(col("o_orderkey") % 2 === 1),
          tbl, Some(0L), statsCols = Seq("o_orderkey"), emitFeed = true)
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      tbl
    }

  /** Streaming-sink customer table: the fixture is staged as THREE
    * parquet files, read back with a real file readStream throttled to
    * one file per micro-batch, and appended to the versioned table by
    * [[graft.ops.TableStream.streamTo]] — three exactly-once OCC append
    * commits. Cached per sf dir.
    */
  private def streamedTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{Sinks, TableStream}
      val base = "/tmp/graft_streamtbl_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val tbl = base + "/customer"
      val stamp = Tables.srcStamp(dir, "customer")
      val fresh = Files.isDirectory(Paths.get(tbl)) &&
        Sinks.currentVersion(tbl).isDefined &&
        Files.exists(Paths.get(base, "_BUILT")) &&
        new String(Files.readAllBytes(Paths.get(base, "_BUILT")), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(base))
        val src = base + "/src"
        val cp = base + "/cp"
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        cust.repartition(3).write.parquet(src)
        val q = TableStream.streamTo(
          s.readStream.schema(cust.schema).option("maxFilesPerTrigger", "1").parquet(src),
          tbl, cp)
        try q.processAllAvailable() finally q.stop()
        Files.write(Paths.get(base, "_BUILT"), stamp.getBytes("UTF-8"))
      }
      tbl
    }

  /** Bronze→silver pipeline built through the SQL door: `bronze` is a
    * customer table fed by THREE O(delta) append commits (each emitting
    * its insert feed); `silver` is populated by a streaming query whose
    * SOURCE is the `read_stream('bronze')` TVF — pure SQL — and whose
    * sink is the exactly-once [[graft.ops.TableStream.streamTo]]. Cached
    * per sf dir (content-stamp freshness).
    */
  private def sqlStreamTables(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.{Sinks, TableStream}
      val base = "/tmp/graft_sqlstream_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val (bronze, silver) = (base + "/bronze", base + "/silver")
      val stampFile = Paths.get(base, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "customer")
      val fresh = Files.isDirectory(Paths.get(silver)) &&
        Sinks.currentVersion(silver).isDefined &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(base))
        val cust = Tables.customer(s, dir).select(
          col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
        Sinks.enableStreamFeed(bronze)
        // three feed-emitting commits (create + two linked appends)
        Sinks.appendVersioned(cust.filter(col("c_custkey") % 3 === 0),
          bronze, None, emitFeed = true)
        Sinks.appendVersioned(cust.filter(col("c_custkey") % 3 === 1),
          bronze, Some(0L), emitFeed = true)
        Sinks.appendVersioned(cust.filter(col("c_custkey") % 3 === 2),
          bronze, Some(1L), emitFeed = true)
        // the silver leg: SQL source (read_stream TVF), exactly-once sink
        val feed = s.sql(
          s"""SELECT c_custkey, c_mktsegment, c_acctbal
             |FROM read_stream('$bronze')
             |WHERE _change_type = 'insert'""".stripMargin)
        assert(feed.isStreaming, "read_stream must yield a streaming relation")
        val q = TableStream.streamTo(feed, silver, base + "/cp")
        try q.processAllAvailable() finally q.stop()
        Files.write(stampFile, stamp.getBytes("UTF-8"))
      }
      silver
    }

  /** Per-sf catalog with a `nations_r` table restored through the SQL
    * door: v0 = the nation fixture, v1 = a destructive overwrite (keys
    * <10 only), v2 = `CALL <cat>.system.restore(version => 0)` — the
    * current version is the REWIND, published as a linked OCC commit.
    * Returns the catalog name. Cached per sf dir.
    */
  private def restoreCatalog(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.Sinks
      val wh = "/tmp/graft_restwh_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val tbl = wh + "/nations_r"
      val cat = "graftrest_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val stampFile = Paths.get(wh, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "nation")
      val fresh = Files.isDirectory(Paths.get(tbl)) &&
        Sinks.listVersions(tbl) == Seq(0L, 1L, 2L) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(wh))
        val n = Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        Sinks.publishVersioned(n, tbl, None)
        Sinks.publishVersioned(n.filter(col("n_nationkey") < 10), tbl, Some(0L))
        s.sql(s"CALL $cat.system.restore(table => 'nations_r', version => 0)").collect()
        Files.write(Paths.get(wh, "_SRCSTAMP"), stamp.getBytes("UTF-8"))
      }
      cat
    }

  /** Catalog whose `nat` table accumulates one SQL DELETE, one SQL
    * UPDATE, and one SQL MERGE over the nation fixture — each commit
    * persisting its own writer-side change feed (the CDF-complete DML
    * door). Returns the TABLE root. Cached per sf dir.
    */
  private def dmlFeedTable(s: org.apache.spark.sql.SparkSession, dir: String): String =
    this.synchronized {
      import java.nio.file.{Files, Paths}
      import graft.ops.Sinks
      val wh = "/tmp/graft_dmlfeed_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val tbl = wh + "/nat"
      val cat = "graftdmlf_" + dir.replaceAll("[^A-Za-z0-9]", "_")
      s.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val stampFile = Paths.get(wh, "_SRCSTAMP")
      val stamp = Tables.srcStamp(dir, "nation")
      val fresh = Files.isDirectory(Paths.get(tbl)) &&
        Sinks.listVersions(tbl) == Seq(0L, 1L, 2L, 3L) &&
        Files.exists(stampFile) &&
        new String(Files.readAllBytes(stampFile), "UTF-8").trim == stamp
      if (!fresh) {
        graft.io.Fs.deleteRecursively(Paths.get(wh))
        Sinks.publishVersioned(Tables.nation(s, dir)
          .select(col("n_nationkey"), col("n_name"), col("n_regionkey")), tbl, None)
        s.sql(s"DELETE FROM $cat.nat WHERE n_nationkey >= 20")
        s.sql(s"UPDATE $cat.nat SET n_regionkey = n_regionkey + 1 WHERE n_nationkey < 5")
        s.sql(
          s"""MERGE INTO $cat.nat t
             |USING (SELECT * FROM VALUES
             |  (3, 'MERGEDLAND', 0, 'u'), (30, 'NEWLAND', 9, 'u'), (10, '', 0, 'd')
             |  AS m(k, name, rk, act)) s
             |ON t.n_nationkey = s.k
             |WHEN MATCHED AND s.act = 'd' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET n_name = s.name
             |WHEN NOT MATCHED THEN INSERT (n_nationkey, n_name, n_regionkey)
             |  VALUES (s.k, s.name, s.rk)""".stripMargin)
        Files.write(Paths.get(wh, "_SRCSTAMP"), stamp.getBytes("UTF-8"))
      }
      tbl
    }

  override def queries: Map[String, Q] = Map(

    // CDF-complete SQL DML: DELETE, UPDATE, and MERGE each persisted
    // their writer-side row-level feed; the O(delta) fast path chains
    // the three commits without opening a snapshot, and the oracle
    // recomputes every (commit, change_type) cell from the raw fixture —
    // a hash match proves classification AND per-commit attribution.
    "q_sql_dml_feed" -> ((s, dir) => {
      val tbl = dmlFeedTable(s, dir)
      graft.ops.Sinks.changeFeed(s, tbl, 0L, 3L).get
        .groupBy(col("_commit_version").as("commit_version"), col("_change_type"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_nationkey")).cast("long").as("key_sum"))
        .orderBy("commit_version", "_change_type")
    }),

    // O(delta) append (B118): current = even-key v0 files (carried by
    // hardlink, never rewritten) + odd-key appended files. The oracle
    // recomputes over ALL orders — a hash match proves the append
    // produced exactly the union, through the real commit protocol.
    "q_table_append" -> ((s, dir) => {
      val tbl = appendTable(s, dir)
      graft.ops.Sinks.readCurrent(s, tbl)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          round(sum(round(col("o_totalprice") * 100, 0)) / 100.0, 2).as("total_price"))
        .orderBy("o_orderstatus")
    }),

    // The append's change feed, read from the streaming feed DIRECTORY
    // (what a downstream readStream tails): exactly the odd-key insert
    // rows — v0's snapshot publish must NOT leak in. Oracle = the same
    // aggregate over odd-key orders only.
    "q_table_append_feed" -> ((s, dir) => {
      val tbl = appendTable(s, dir)
      s.read.parquet(s"$tbl/${graft.ops.Sinks.FeedDir}")
        .filter(col("_change_type") === "insert")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_inserts"),
          round(sum(round(col("o_totalprice") * 100, 0)) / 100.0, 2).as("total_price"))
        .orderBy("o_orderstatus")
    }),

    // Streaming SINK end-to-end (B119): customer arrives through a real
    // file readStream in three micro-batches, each an exactly-once OCC
    // append commit; the harness reads the FINAL TABLE STATE and DuckDB
    // recomputes from the fixture — streaming delivery, batch-id dedupe,
    // and the linked append all under one oracle.
    "q_stream_table_sink" -> ((s, dir) => {
      val tbl = streamedTable(s, dir)
      graft.ops.Sinks.readCurrent(s, tbl)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          round(sum(round(col("c_acctbal") * 100, 0)) / 100.0, 2).as("total_bal"))
        .orderBy("c_mktsegment")
    }),

    // The streaming tier's SQL door end-to-end (round-9 item 2): the
    // silver table was filled by a streaming query whose source is the
    // read_stream('bronze') TVF — the whole bronze feed consumed through
    // SQL, landed by the exactly-once sink. Final silver state vs the
    // raw fixture: a hash match proves TVF resolution, the feed's
    // insert stream, and the streaming sink compose value-losslessly.
    "q_stream_sql" -> ((s, dir) => {
      val silver = sqlStreamTables(s, dir)
      graft.ops.Sinks.readCurrent(s, silver)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          round(sum(round(col("c_acctbal") * 100, 0)) / 100.0, 2).as("total_bal"))
        .orderBy("c_mktsegment")
    }),

    // RESTORE through the SQL door: after a destructive overwrite, CALL
    // system.restore republishes v0 as the new current (linked commit,
    // history intact). The oracle recomputes from the FULL nation
    // fixture — a hash match proves the rewind restored every row, and
    // would fail if the overwrite were still live.
    "q_sql_restore" -> ((s, dir) => {
      val cat = restoreCatalog(s, dir)
      s.sql(
        s"""SELECT n_regionkey, count(*) AS n_nations,
           |       sum(n_nationkey) AS key_sum
           |FROM $cat.nations_r
           |GROUP BY n_regionkey
           |ORDER BY n_regionkey""".stripMargin)
    }),
  )

  override def oracles: Map[String, String] = Map(
    "q_sql_dml_feed" ->
      """SELECT CAST(1 AS BIGINT) AS commit_version, 'delete' AS _change_type,
        |       count(*) AS n_rows, CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation WHERE n_nationkey >= 20
        |UNION ALL
        |SELECT 2, 'update_preimage', count(*), CAST(sum(n_nationkey) AS BIGINT)
        |FROM nation WHERE n_nationkey < 5
        |UNION ALL
        |SELECT 2, 'update_postimage', count(*), CAST(sum(n_nationkey) AS BIGINT)
        |FROM nation WHERE n_nationkey < 5
        |UNION ALL SELECT 3, 'delete', 1, 10
        |UNION ALL SELECT 3, 'insert', 1, 30
        |UNION ALL SELECT 3, 'update_preimage', 1, 3
        |UNION ALL SELECT 3, 'update_postimage', 1, 3
        |ORDER BY commit_version, _change_type""".stripMargin,
    "q_table_append" ->
      """SELECT o_orderstatus,
        |       count(*) AS n_orders,
        |       round(sum(round(o_totalprice*100, 0))/100.0, 2) AS total_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_append_feed" ->
      """SELECT o_orderstatus,
        |       count(*) AS n_inserts,
        |       round(sum(round(o_totalprice*100, 0))/100.0, 2) AS total_price
        |FROM orders WHERE o_orderkey % 2 = 1
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_stream_table_sink" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_cust,
        |       round(sum(round(c_acctbal*100, 0))/100.0, 2) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // the silver table must hold exactly the customer rows (all three
    // bronze commits' inserts, exactly once)
    "q_stream_sql" ->
      """SELECT c_mktsegment,
        |       count(*) AS n_cust,
        |       round(sum(round(c_acctbal*100, 0))/100.0, 2) AS total_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_sql_restore" ->
      """SELECT n_regionkey, count(*) AS n_nations,
        |       CAST(sum(n_nationkey) AS BIGINT) AS key_sum
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
  )
}
