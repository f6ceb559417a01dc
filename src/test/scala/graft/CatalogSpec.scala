package graft

import java.nio.file.attribute.FileTime
import java.nio.file.{Files, Paths}

import graft.ops.Sinks
import org.scalatest.funsuite.AnyFunSuite

/** GraftCatalog: the versioned Sinks layout exposed as a DataSource V2
  * catalog — current reads, VERSION AS OF / TIMESTAMP AS OF time travel,
  * SHOW TABLES, read-only enforcement, and pushdown through the
  * delegated parquet scan.
  */
class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  /** Backdate a version's commit instant through BOTH records the
    * canonical reader consults: the durable `_COMMIT_TS` marker (wins)
    * and the dir mtime (pre-marker fallback).
    */
  private def backdate(versionDir: String, millis: Long): Unit = {
    Files.write(Paths.get(versionDir, Sinks.CommitTsFile),
      millis.toString.getBytes("UTF-8"))
    Files.setLastModifiedTime(Paths.get(versionDir), FileTime.fromMillis(millis))
  }

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_catalog").toString
    val r = graft.io.Tables.region(spark, sf001)
    // t1: v0 = full table, v1 = a strict subset (so versions differ)
    Sinks.publishVersioned(r, s"$dir/t1", None)
    Sinks.publishVersioned(r.limit(3), s"$dir/t1", Some(0L))
    // pin commit times for TIMESTAMP AS OF: v0 @ 2020-01-01, v1 @ 2020-01-03
    backdate(s"$dir/t1/v0", java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli)
    backdate(s"$dir/t1/v1", java.time.Instant.parse("2020-01-03T00:00:00Z").toEpochMilli)
    // a namespaced table
    Sinks.publishVersioned(graft.io.Tables.nation(spark, sf001), s"$dir/ns/t2", None)
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.root", dir)
    dir
  }

  test("SELECT from the catalog reads the current version") {
    root
    assert(spark.sql("SELECT * FROM graft.t1").count() == 3)
    assert(spark.sql("SELECT * FROM graft.ns.t2").count() ==
      graft.io.Tables.nation(spark, sf001).count())
  }

  test("VERSION AS OF reads a pinned snapshot; absent versions fail clearly") {
    root
    assert(spark.sql("SELECT * FROM graft.t1 VERSION AS OF 0").count() ==
      graft.io.Tables.region(spark, sf001).count())
    assert(spark.sql("SELECT * FROM graft.t1 VERSION AS OF 1").count() == 3)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.t1 VERSION AS OF 7").collect())
    assert(e.getMessage.contains("version 7 not present"))
  }

  test("TIMESTAMP AS OF resolves by commit time; pre-history fails clearly") {
    root
    assert(spark.sql(
      "SELECT * FROM graft.t1 TIMESTAMP AS OF '2020-01-02 00:00:00'").count() ==
      graft.io.Tables.region(spark, sf001).count())
    assert(spark.sql(
      "SELECT * FROM graft.t1 TIMESTAMP AS OF '2020-01-04 00:00:00'").count() == 3)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM graft.t1 TIMESTAMP AS OF '2019-12-31 00:00:00'").collect())
    assert(e.getMessage.contains("no version committed at or before"))
  }

  test("SHOW TABLES lists only versioned tables, per namespace") {
    root
    // ns/ has no _CURRENT so it must not list; t1 does (t3 may exist if
    // the snapshot-isolation test ran first — don't pin the full set)
    val top = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(top.contains("t1") && !top.contains("ns"), s"got $top")
    val ns = spark.sql("SHOW TABLES IN graft.ns").collect().map(_.getString(1)).toSet
    assert(ns == Set("t2"), s"got $ns")
  }

  test("SHOW NAMESPACES lists table-free dirs; version dirs and tables are not namespaces") {
    root
    val ns = spark.sql("SHOW NAMESPACES IN graft").collect().map(_.getString(0)).toSet
    assert(ns.contains("ns"), s"got $ns")
    assert(!ns.contains("t1"), s"table listed as namespace: $ns")
    val e = intercept[Exception](
      spark.sql("SHOW NAMESPACES IN graft.absent_ns").collect())
    assert(e.getMessage.toLowerCase.contains("schema"), e.getMessage)
  }

  test("missing tables raise a loud error naming the identifier") {
    root
    // NOTE: this catalog is named `graft`, which since B184 is ALSO the
    // datasource short name — Spark's resolution therefore reports a
    // missing table here through its direct-query-on-files fallback
    // (the error still names 'graft'); catalogs under any other name
    // keep the plain TABLE_OR_VIEW_NOT_FOUND (pinned below)
    val e = intercept[Exception](spark.sql("SELECT * FROM graft.absent").collect())
    assert(e.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND")
      || e.getMessage.toLowerCase.contains("not found")
      || e.getMessage.contains("UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY"),
      e.getMessage)
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graftother_nf.absent").collect())
    assert(e2.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND"), e2.getMessage)
  }

  test("CTAS / INSERT / OVERWRITE publish new versions; pre-write states stay travelable") {
    root
    // CTAS: create publishes an empty v0 with the schema, data lands as v1
    spark.sql("CREATE TABLE graft.t5 AS SELECT * FROM graft.t1 VERSION AS OF 0")
    assert(spark.sql("SELECT * FROM graft.t5").count() == 5)
    assert(Sinks.listVersions(s"$root/t5") == Seq(0L, 1L))
    assert(spark.sql("SELECT * FROM graft.t5 VERSION AS OF 0").count() == 0)
    // INSERT INTO appends as a NEW version — v1 is untouched on disk
    spark.sql("INSERT INTO graft.t5 VALUES (99, 'x')")
    assert(spark.sql("SELECT * FROM graft.t5").count() == 6)
    assert(spark.sql("SELECT * FROM graft.t5 VERSION AS OF 1").count() == 5)
    // INSERT OVERWRITE also lands as a new version
    spark.sql(
      "INSERT OVERWRITE graft.t5 SELECT * FROM graft.t5 WHERE r_regionkey < 2")
    assert(spark.sql("SELECT * FROM graft.t5").count() == 2)
    assert(spark.sql("SELECT * FROM graft.t5 VERSION AS OF 2").count() == 6)
    // DROP TABLE removes it from listing and resolution
    spark.sql("DROP TABLE graft.t5")
    val top = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(!top.contains("t5"), s"dropped table still listed: $top")
    intercept[Exception](spark.sql("SELECT * FROM graft.t5").collect())
  }

  test("a pinned VERSION AS OF snapshot carries no write capability") {
    root
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog, TableCapability}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[TableCatalog]
    val pinned = cat.loadTable(Identifier.of(Array.empty[String], "t1"), "0")
    assert(!pinned.capabilities().contains(TableCapability.BATCH_WRITE)
      && !pinned.capabilities().contains(TableCapability.V1_BATCH_WRITE),
      "pinned snapshot must be read-only")
    val current = cat.loadTable(Identifier.of(Array.empty[String], "t1"))
    assert(current.capabilities().contains(TableCapability.V1_BATCH_WRITE))
  }

  test("ALTER TABLE ADD COLUMNS publishes an evolved version; other alters refuse") {
    root
    spark.sql("CREATE TABLE graft.t7 AS SELECT * FROM graft.t1 VERSION AS OF 0")
    try {
      spark.sql("ALTER TABLE graft.t7 ADD COLUMNS (score DOUBLE)")
      val after = spark.sql("SELECT * FROM graft.t7")
      assert(after.columns.contains("score"))
      assert(after.filter("score IS NOT NULL").count() == 0, "new column must backfill null")
      assert(after.count() == 5)
      // pre-evolution version keeps the old schema
      assert(!spark.sql("SELECT * FROM graft.t7 VERSION AS OF 1")
        .columns.contains("score"))
      // and the evolved table accepts writes carrying the new column
      spark.sql("INSERT INTO graft.t7 VALUES (98, 'y', 0.5)")
      assert(spark.sql("SELECT * FROM graft.t7 WHERE score = 0.5").count() == 1)
      // retype/reposition remain unsupported (RENAME/DROP are since
      // round 9 — see the dedicated schema-evolution tests below)
      intercept[Exception](
        spark.sql("ALTER TABLE graft.t7 ALTER COLUMN score TYPE STRING"))
    } finally spark.sql("DROP TABLE graft.t7")
  }

  test("concurrent SQL INSERTs never lose updates (statement-level OCC)") {
    root
    spark.sql("CREATE TABLE graft.t8 AS SELECT * FROM graft.t1 VERSION AS OF 0 LIMIT 1")
    try {
      import java.util.concurrent.Executors
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration._
      val pool = Executors.newFixedThreadPool(4)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      // each writer retries on the OCC conflict (the documented protocol:
      // recompute against the new current and retry) until its row lands
      val writers = (1 to 4).map { i =>
        Future {
          var done = false
          var attempts = 0
          while (!done && attempts < 20) {
            attempts += 1
            try { spark.sql(s"INSERT INTO graft.t8 VALUES (${100 + i}, 'w$i')"); done = true }
            catch { case _: Throwable => Thread.sleep(50) }
          }
          done
        }
      }
      val results = Await.result(Future.sequence(writers), 120.seconds)
      pool.shutdown()
      assert(results.forall(identity), "a writer never succeeded within its retries")
      // every row landed exactly once: no lost updates, no duplicates
      assert(spark.sql("SELECT * FROM graft.t8").count() == 5)
      assert(spark.sql(
        "SELECT count(DISTINCT r_regionkey) AS n FROM graft.t8 WHERE r_regionkey >= 100")
        .head().getLong(0) == 4)
    } finally spark.sql("DROP TABLE graft.t8")
  }

  test("CREATE OR REPLACE TABLE and reader-option time travel compose from the primitives") {
    root
    spark.sql("CREATE TABLE graft.t9 AS SELECT * FROM graft.t1 VERSION AS OF 0")
    try {
      // round-16 (B203): the staging door makes the replace ONE
      // history-preserving versioned commit — no drop, no reset
      spark.sql("CREATE OR REPLACE TABLE graft.t9 AS " +
        "SELECT * FROM graft.t1 VERSION AS OF 0 LIMIT 2")
      assert(spark.sql("SELECT * FROM graft.t9").count() == 2)
      assert(Sinks.listVersions(s"$root/t9") == Seq(0L, 1L, 2L),
        "replace lands on top of the old history")
      // DataFrameReader option spelling of VERSION AS OF reaches both
      // epochs: v0 = the original CTAS's empty shell, v1 = its data
      assert(spark.read.option("versionAsOf", "0").table("graft.t9").count() == 0)
      assert(spark.read.option("versionAsOf", "1").table("graft.t9").count() > 2)
      assert(spark.read.table("graft.t9").count() == 2)
    } finally spark.sql("DROP TABLE IF EXISTS graft.t9")
  }

  test("Sinks.history reports retained versions with commit instants") {
    root
    import graft.ops.Sinks
    val h = Sinks.history(spark, s"$root/t1")
      .orderBy("version").collect()
    assert(h.map(_.getLong(0)).toSeq == Sinks.listVersions(s"$root/t1"))
    assert(h.count(_.getBoolean(3)) == 1, "exactly one current version")
    assert(h.map(_.getTimestamp(1)).forall(_ != null))
    assert(h.map(_.getString(2)).forall(_.nonEmpty), "operation column present")
  }

  test("reserved layout names and unhonorable clauses are rejected, not reinterpreted") {
    root
    // a table named after the pointer file would corrupt its namespace
    intercept[Exception](spark.sql("CREATE TABLE graft.ns.`_CURRENT` (c INT)"))
    intercept[Exception](spark.sql("CREATE TABLE graft.`v3` (c INT)"))
    intercept[Exception](spark.sql("CREATE NAMESPACE graft.`_meta`"))
    // USING csv / LOCATION cannot be honored by the versioned layout
    val e1 = intercept[Exception](spark.sql("CREATE TABLE graft.t6 (c INT) USING csv"))
    assert(e1.getMessage.contains("parquet"), e1.getMessage)
    val e2 = intercept[Exception](
      spark.sql("CREATE TABLE graft.t6 (c INT) USING parquet LOCATION '/elsewhere'"))
    assert(e2.getMessage.contains("LOCATION"), e2.getMessage)
    // duplicate namespace raises instead of silently succeeding
    spark.sql("CREATE NAMESPACE graft.ns3")
    try intercept[Exception](spark.sql("CREATE NAMESPACE graft.ns3"))
    finally spark.sql("DROP NAMESPACE graft.ns3")
    // non-CASCADE drop refuses a namespace holding ANY content
    spark.sql("CREATE NAMESPACE graft.ns4")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/ns4/loose.txt"), "data")
    val e3 = intercept[Exception](spark.sql("DROP NAMESPACE graft.ns4"))
    assert(e3.getMessage.contains("CASCADE"), e3.getMessage)
    spark.sql("DROP NAMESPACE graft.ns4 CASCADE")
  }

  test("behavior TBLPROPERTIES persist at CREATE; typo'd graft.* fails with no table") {
    root
    // graft.dml.mode declared at CREATE must route DML merge-on-read
    // (round-12 advisor finding: only ALTER honored it)
    spark.sql("CREATE TABLE graft.bprops (k BIGINT, v STRING) USING parquet " +
      "TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql("INSERT INTO graft.bprops VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("DELETE FROM graft.bprops WHERE k = 2")
    assert(graft.ops.Dv.exists(Sinks.resolve(s"$root/bprops")),
      "a table declared MOR at CREATE must delete via deletion vector")
    assert(spark.table("graft.bprops").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    // a typo'd graft.* property fails the CREATE and leaves NO table
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.bprops2 (k BIGINT) USING parquet " +
        "TBLPROPERTIES ('graft.dml.moed' = 'mor')"))
    assert(e.getMessage.contains("graft.dml.moed"), e.getMessage)
    assert(!spark.catalog.tableExists("graft.bprops2"))
  }

  test("CREATE / DROP NAMESPACE manage warehouse directories") {
    root
    spark.sql("CREATE NAMESPACE graft.ns2")
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet.contains("ns2"))
    spark.sql("DROP NAMESPACE graft.ns2")
    assert(!spark.sql("SHOW NAMESPACES IN graft").collect()
      .map(_.getString(0)).toSet.contains("ns2"))
  }

  test("TIMESTAMP AS OF works on real commit stamps (publishVersioned stamps at the rename)") {
    val r = graft.io.Tables.region(spark, sf001)
    Sinks.publishVersioned(r, s"$root/t4", None)
    Thread.sleep(1100) // ensure distinct wall-clock stamps
    val between = java.time.Instant.now()
    Thread.sleep(1100)
    Sinks.publishVersioned(r.limit(2), s"$root/t4", Some(0L))
    // travel to the instant between the two commits → v0, not v1 —
    // this is what the commit-time stamping guarantees: the version
    // directory's mtime is its VISIBILITY instant, even though v1's
    // staging write may have started before `between`
    val ts = java.sql.Timestamp.from(between).toString
    assert(spark.sql(
      s"SELECT * FROM graft.t4 TIMESTAMP AS OF '$ts'").count() == r.count())
    val now = java.sql.Timestamp.from(java.time.Instant.now()).toString
    assert(spark.sql(
      s"SELECT * FROM graft.t4 TIMESTAMP AS OF '$now'").count() == 2)
  }

  test("version resolution is snapshot-isolated: a resolved plan survives a later publish") {
    val r = graft.io.Tables.region(spark, sf001)
    Sinks.publishVersioned(r, s"$root/t3", None) // v0: 5 rows
    // resolve BOTH reads before publishing v1 (analysis pins the paths)
    val pinned = spark.sql("SELECT * FROM graft.t3 VERSION AS OF 0")
    val current = spark.sql("SELECT * FROM graft.t3")
    assert(pinned.count() == r.count() && current.count() == r.count())
    Sinks.publishVersioned(r.limit(1), s"$root/t3", Some(0L)) // v1: 1 row
    // already-resolved plans keep reading v0's directory
    assert(pinned.count() == r.count(), "pinned plan lost its snapshot after a publish")
    assert(current.count() == r.count(), "resolved plan re-read the pointer after a publish")
    // a NEW resolution sees the new current version
    assert(spark.sql("SELECT * FROM graft.t3").count() == 1)
  }

  test("traversal segments can never escape the warehouse root") {
    root
    // a backticked `..` must answer "no such namespace", never resolve
    // the warehouse root's PARENT and recursively delete it
    val sentinel = Paths.get(root).getParent.resolve(
      "catalog_traversal_sentinel_" + System.nanoTime())
    Files.createDirectories(sentinel)
    try {
      assert(!spark.sql("DROP NAMESPACE IF EXISTS graft.`..` CASCADE").isEmpty ||
        true) // statement completes as a no-op
      assert(Files.isDirectory(Paths.get(root)), "warehouse root deleted!")
      assert(Files.isDirectory(sentinel), "sibling directory deleted!")
      // probes over illegal names answer absent, not resolve
      assert(spark.sql("SHOW TABLES IN graft.`..`").count() == 0)
    } finally graft.io.Fs.deleteRecursively(sentinel)
  }

  test("a namespace cannot be silently converted into a table, nor a table into a parent") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.convns")
    spark.sql("CREATE TABLE graft.convns.child (x INT)")
    // CREATE TABLE over the populated namespace must fail loudly
    val e1 = intercept[Exception](spark.sql("CREATE TABLE graft.convns (c INT)"))
    assert(e1.getMessage.contains("NAMESPACE"), e1.getMessage)
    assert(spark.sql("SELECT * FROM graft.convns.child").count() == 0,
      "child table lost after rejected conversion")
    // renaming a table INSIDE another table must fail — Spark's analyzer
    // rejects the SQL form (SCHEMA_NOT_FOUND, because t1 lists as no
    // schema), and the catalog's own guard covers direct TableCatalog
    // calls; accept either spelling
    spark.sql("CREATE TABLE graft.renamer (x INT)")
    val e2 = intercept[Exception](
      spark.sql("ALTER TABLE graft.renamer RENAME TO graft.t1.inner"))
    val m2 = e2.getMessage.toLowerCase
    assert(m2.contains("namespace") || m2.contains("schema"), e2.getMessage)
    // and the direct catalog-API path hits the guard itself
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val e3 = intercept[Exception](cat.renameTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "renamer"),
      org.apache.spark.sql.connector.catalog.Identifier.of(Array("t1"), "inner")))
    // the guard throws NoSuchNamespaceException, which Spark renders as
    // SCHEMA_NOT_FOUND ("schema ... cannot be found")
    assert(e3.getMessage.toLowerCase.contains("schema"), e3.getMessage)
    assert(spark.table("graft.renamer").columns.sameElements(Array("x")))
    spark.sql("DROP TABLE graft.renamer")
    spark.sql("DROP NAMESPACE graft.convns CASCADE")
  }

  test("ADD COLUMNS rejects NOT NULL (null-backfill cannot honor it)") {
    root
    spark.sql("CREATE TABLE graft.addnn (x INT)")
    try {
      val e = intercept[Exception](
        spark.sql("ALTER TABLE graft.addnn ADD COLUMNS (c INT NOT NULL)"))
      assert(e.getMessage.contains("NOT NULL"), e.getMessage)
      // the nullable form still works
      spark.sql("ALTER TABLE graft.addnn ADD COLUMNS (c INT)")
      assert(spark.table("graft.addnn").columns.contains("c"))
    } finally spark.sql("DROP TABLE graft.addnn")
  }

  test("DROP NAMESPACE CASCADE deletes child tables under their commit locks") {
    root
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.dropns")
    spark.sql("CREATE TABLE graft.dropns.a (x INT)")
    spark.sql("CREATE TABLE graft.dropns.b (x INT)")
    spark.sql("CREATE NAMESPACE graft.dropns.sub")
    spark.sql("CREATE TABLE graft.dropns.sub.c (x INT)")
    assert(spark.sql("DROP NAMESPACE graft.dropns CASCADE").collect().isEmpty)
    assert(!Files.exists(Paths.get(s"$root/dropns")))
    assert(spark.sql("SHOW NAMESPACES IN graft").collect()
      .forall(!_.getString(0).contains("dropns")))
  }

  test("DELETE FROM removes matching rows, keeps NULL-condition rows, stays travelable") {
    root
    spark.sql("CREATE TABLE graft.d1 (k INT, v STRING)")
    try {
      spark.sql("INSERT INTO graft.d1 VALUES (1, 'a'), (2, 'b'), (3, NULL), (4, 'd')")
      // condition NULL (v = 'a' on a NULL v) must KEEP the row — SQL
      // three-valued semantics: only TRUE deletes
      spark.sql("DELETE FROM graft.d1 WHERE v = 'a'")
      assert(spark.sql("SELECT * FROM graft.d1").count() == 3)
      assert(spark.sql("SELECT * FROM graft.d1 WHERE k = 3").count() == 1)
      // pre-delete state is still travelable (DELETE published a version)
      assert(spark.sql("SELECT * FROM graft.d1 VERSION AS OF 1").count() == 4)
      spark.sql("DELETE FROM graft.d1")  // unconditional: empty table, schema kept
      assert(spark.sql("SELECT * FROM graft.d1").count() == 0)
      assert(spark.sql("SELECT * FROM graft.d1").columns.toSeq == Seq("k", "v"))
    } finally spark.sql("DROP TABLE graft.d1")
  }

  test("UPDATE rewrites matching rows in place; unmatched and NULL-condition rows keep values") {
    root
    spark.sql("CREATE TABLE graft.u1 (k INT, v STRING, n INT)")
    try {
      spark.sql("INSERT INTO graft.u1 VALUES (1, 'a', 10), (2, 'b', 20), (3, NULL, 30)")
      spark.sql("UPDATE graft.u1 SET n = n + 100, v = upper(v) WHERE v = 'a'")
      val rows = spark.sql("SELECT k, v, n FROM graft.u1 ORDER BY k").collect()
      assert(rows(0).getString(1) == "A" && rows(0).getInt(2) == 110)
      assert(rows(1).getString(1) == "b" && rows(1).getInt(2) == 20)
      assert(rows(2).isNullAt(1) && rows(2).getInt(2) == 30)
      // row count never changes under UPDATE
      assert(spark.sql("SELECT * FROM graft.u1").count() == 3)
      // assignments are cast to the column type (int literal into INT col via double expr)
      spark.sql("UPDATE graft.u1 SET n = 1.0 + 1.5 WHERE k = 2")
      assert(spark.sql("SELECT n FROM graft.u1 WHERE k = 2").head().getInt(0) == 2)
    } finally spark.sql("DROP TABLE graft.u1")
  }

  test("MERGE INTO dispatches matched/not-matched/not-matched-by-source clauses in order") {
    root
    spark.sql("CREATE TABLE graft.m1 (k INT, v STRING, n INT)")
    try {
      spark.sql("INSERT INTO graft.m1 VALUES (1, 'a', 10), (2, 'b', 20), (3, 'c', 30)")
      spark.sql("""
        MERGE INTO graft.m1 t
        USING (SELECT * FROM VALUES (1, 'A', 100), (2, 'B', -1), (9, 'Z', 900) AS s(k, v, n)) s
        ON t.k = s.k
        WHEN MATCHED AND s.n < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET v = s.v, n = s.n
        WHEN NOT MATCHED THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET n = t.n + 1
      """)
      val out = spark.sql("SELECT k, v, n FROM graft.m1 ORDER BY k").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSeq
      // 1 updated, 2 deleted (first matching clause wins), 3 bumped by
      // the not-matched-by-source clause, 9 inserted
      assert(out == Seq((1, "A", 100), (3, "c", 31), (9, "Z", 900)))
      // pre-merge state travelable
      assert(spark.sql("SELECT * FROM graft.m1 VERSION AS OF 1").count() == 3)
      // INSERT with a partial column list null-backfills the rest
      spark.sql("""
        MERGE INTO graft.m1 t
        USING (SELECT 42 AS k) s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k) VALUES (s.k)
      """)
      val r42 = spark.sql("SELECT v, n FROM graft.m1 WHERE k = 42").head()
      assert(r42.isNullAt(0) && r42.isNullAt(1))
    } finally spark.sql("DROP TABLE graft.m1")
  }

  test("MERGE enforces the SQL cardinality rule: one target row, many source matches fails") {
    root
    spark.sql("CREATE TABLE graft.m2 (k INT, n INT)")
    try {
      spark.sql("INSERT INTO graft.m2 VALUES (1, 10)")
      val e = intercept[Exception] {
        spark.sql("""
          MERGE INTO graft.m2 t
          USING (SELECT * FROM VALUES (1, 1), (1, 2) AS s(k, n)) s
          ON t.k = s.k
          WHEN MATCHED THEN UPDATE SET n = s.n
        """)
      }
      assert(e.getMessage.contains("matched more than one source row"),
        s"wrong error: ${e.getMessage}")
      // the failed statement must not have published: table unchanged
      assert(spark.sql("SELECT n FROM graft.m2").head().getInt(0) == 10)
      // with no matched clauses the same source is legal (inserts only)
      spark.sql("""
        MERGE INTO graft.m2 t
        USING (SELECT * FROM VALUES (7, 1), (7, 2) AS s(k, n)) s
        ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, n) VALUES (s.k, s.n)
      """)
      assert(spark.sql("SELECT * FROM graft.m2 WHERE k = 7").count() == 2)
    } finally spark.sql("DROP TABLE graft.m2")
  }

  test("stale DML vs a concurrent publish: disjoint COW rebases, never clobbers") {
    root
    spark.sql("CREATE TABLE graft.m3 (k INT)")
    try {
      spark.sql("INSERT INTO graft.m3 VALUES (1), (2)")
      spark.sql("DELETE FROM graft.m3 WHERE k = 1")  // eager; table now {2}
      // resolve a second DELETE against the current version but do NOT
      // run it yet (spark.sql runs commands eagerly, so capture the
      // analyzed plan instead), publish a competing INSERT, then run.
      // Pre-round-13 the stale delete kept the honest CME; CowRebase
      // now re-stages it (its touched file is untouched by the blind
      // insert) — BOTH effects must land, the insert never clobbered.
      val stale = spark.sessionState.analyzer.execute(
        spark.sessionState.sqlParser.parsePlan("DELETE FROM graft.m3 WHERE k = 2"))
      spark.sql("INSERT INTO graft.m3 VALUES (3)")
      org.apache.spark.sql.GraftSqlShims.ofRows(spark, stale).collect()
      val got = spark.sql("SELECT k FROM graft.m3").collect()
        .map(_.getInt(0)).toSet
      assert(got == Set(3),
        s"serial-equivalent state expected (k=1,2 deleted, k=3 kept), got $got")
      // every commit is real history: create + 2 inserts + 2 deletes
      assert(Sinks.listVersions(s"$root/m3") == Seq(0L, 1L, 2L, 3L, 4L))
    } finally spark.sql("DROP TABLE graft.m3")
  }

  test("CREATE TABLE refuses a missing namespace and a table posing as one") {
    root
    // missing namespace: publishVersioned must not silently create it
    val e1 = intercept[Exception](spark.sql("CREATE TABLE graft.nope.t (x INT)"))
    assert(e1.getMessage.toLowerCase.contains("schema") ||
      e1.getMessage.toLowerCase.contains("namespace"), s"wrong error: ${e1.getMessage}")
    // an existing TABLE as the parent: nesting would hand the outer
    // table's DROP a silent kill of the inner one
    spark.sql("CREATE TABLE graft.tparent (x INT)")
    try {
      val e2 = intercept[Exception](spark.sql("CREATE TABLE graft.tparent.inner (x INT)"))
      assert(e2.getMessage.toLowerCase.contains("schema") ||
        e2.getMessage.toLowerCase.contains("namespace"), s"wrong error: ${e2.getMessage}")
    } finally spark.sql("DROP TABLE graft.tparent")
  }

  test("table_changes TVF resolves catalog names through the hardened catalog") {
    root
    // keyless diff over t1 (v0 = full region fixture, v1 = 3-row subset):
    // bag semantics classify the dropped rows as deletes
    val byName = spark.sql("SELECT * FROM table_changes('graft.t1', 0, 1)")
    val expected = graft.io.Tables.region(spark, sf001).count() - 3
    assert(byName.filter("_change_type = 'delete'").count() == expected)
    assert(byName.filter("_change_type = 'insert'").count() == 0)
    // a path argument reads the same feed directly
    val byPath = spark.sql(s"SELECT * FROM table_changes('$root/t1', 0, 1)")
    assert(byPath.count() == byName.count())
    // traversal through the TVF dies in the catalog's own guard
    intercept[Exception](
      spark.sql("SELECT * FROM table_changes('graft.`..`.t1', 0, 1)").collect())
    // non-literal args are rejected loudly
    val e = intercept[Exception](
      spark.sql("SELECT * FROM table_changes(rand()::string, 0, 1)").collect())
    assert(e.getMessage.contains("literal") || e.getMessage.toLowerCase.contains("resolve"),
      s"wrong error: ${e.getMessage}")
  }

  test("time-based retention: retain_hours keeps in-window versions past the count cutoff") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.cmph (k INT)")
    try {
      (1 to 2).foreach(i => spark.sql(s"INSERT INTO graft.cmph VALUES ($i)"))
      // age v0 and v1 beyond a 24h window; v2 stays recent
      Seq(0L, 1L).foreach(v =>
        backdate(s"$wh/cmph/v$v", System.currentTimeMillis() - 48L * 3600 * 1000))
      spark.sql(
        "CALL graft.system.compact(table => 'cmph', retain_versions => 0, " +
          "retain_hours => 24.0)").collect()
      // count cutoff alone would evict v0..v2; the window keeps v2
      assert(Sinks.listVersions(s"$wh/cmph") == Seq(2L, 3L),
        s"got ${Sinks.listVersions(s"$wh/cmph")}")
      // TIMESTAMP-AS-OF alignment: the retained version stays travelable
      assert(spark.sql("SELECT * FROM graft.cmph VERSION AS OF 2").count() == 2)
    } finally spark.sql("DROP TABLE graft.cmph")
  }

  test("CALL expire_versions: retention without a rewrite; tags and live survive") {
    root
    spark.sql("CREATE TABLE graft.exp1 (k BIGINT) USING parquet")
    (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.exp1 VALUES ($i)"))
    val tr = s"$root/exp1"
    assert(Sinks.listVersions(tr) == Seq(0L, 1L, 2L, 3L, 4L))
    // pin v1 with a tag; expire keeping 1 below live
    spark.sql("CALL graft.system.tag(table => 'exp1', name => 'keep1', version => 1)")
    val liveFiles = graft.io.Fs.walkParquet(
      java.nio.file.Paths.get(Sinks.versionPath(tr, 4L)))
      .map(f => java.nio.file.Files.readAttributes(f,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
    val row = spark.sql("CALL graft.system.expire_versions(" +
      "table => 'exp1', retain_versions => 1)").collect().head
    assert(row.getLong(1) == 2L && row.getLong(2) == 4L, row.toString)
    // v0 and v2 expired; v1 (tagged), v3 (retained), v4 (live) survive
    assert(Sinks.listVersions(tr) == Seq(1L, 3L, 4L))
    // NO rewrite happened: the live version's files are the same inodes
    val after = graft.io.Fs.walkParquet(
      java.nio.file.Paths.get(Sinks.versionPath(tr, 4L)))
      .map(f => java.nio.file.Files.readAttributes(f,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
    assert(after == liveFiles, "expire_versions must move zero data bytes")
    // the tagged snapshot still time-travels; an expired one fails loudly
    assert(spark.sql("SELECT count(*) FROM graft.exp1 VERSION AS OF 'keep1'")
      .collect().head.getLong(0) == 1)
    intercept[Exception](
      spark.sql("SELECT * FROM graft.exp1 VERSION AS OF 2").collect())
    // current read unaffected
    assert(spark.table("graft.exp1").count() == 4)
    spark.sql("DROP TABLE graft.exp1")
  }

  test("declared retention policy: no-arg CALL honors graft.retain.versions; explicit args override; tags pinned (round-14)") {
    root
    spark.sql("CREATE TABLE graft.rpol (k BIGINT) USING parquet " +
      "TBLPROPERTIES ('graft.retain.versions' = '1')")
    try {
      (1 to 4).foreach(i => spark.sql(s"INSERT INTO graft.rpol VALUES ($i)"))
      val tr = s"$root/rpol"
      assert(Sinks.listVersions(tr) == Seq(0L, 1L, 2L, 3L, 4L))
      spark.sql("CALL graft.system.tag(table => 'rpol', name => 'pin', version => 1)")
      // NO retention arguments: the declared policy (keep 1 below live)
      // governs — the door's no-policy fallback would have kept 2
      spark.sql("CALL graft.system.expire_versions(table => 'rpol')").collect()
      assert(Sinks.listVersions(tr) == Seq(1L, 3L, 4L),
        s"policy keep-1 + tag pin expected [1,3,4], got ${Sinks.listVersions(tr)}")
      // an EXPLICIT argument overrides the declaration
      (5 to 6).foreach(i => spark.sql(s"INSERT INTO graft.rpol VALUES ($i)"))
      assert(Sinks.listVersions(tr) == Seq(1L, 3L, 4L, 5L, 6L))
      spark.sql("CALL graft.system.expire_versions(" +
        "table => 'rpol', retain_versions => 0)").collect()
      // keep-0 explicit: only the tagged v1 and the live v6 survive
      assert(Sinks.listVersions(tr) == Seq(1L, 6L),
        s"explicit keep-0 expected [1,6], got ${Sinks.listVersions(tr)}")
      assert(spark.sql("SELECT count(*) FROM graft.rpol VERSION AS OF 'pin'")
        .head().getLong(0) == 1)
    } finally spark.sql("DROP TABLE graft.rpol")
    // a malformed policy value fails the CREATE and leaves no table
    val e = intercept[Exception](
      spark.sql("CREATE TABLE graft.rpol2 (k BIGINT) USING parquet " +
        "TBLPROPERTIES ('graft.retain.versions' = 'soon')"))
    assert(e.getMessage.contains("graft.retain.versions"), e.getMessage)
    assert(!spark.catalog.tableExists("graft.rpol2"))
  }

  test("declared bloom/cluster columns validate at CREATE and ALTER; INSERT annotates by declaration (round-14)") {
    root
    // typo'd column: fail the CREATE, leave no table (the StatsKey contract)
    val e1 = intercept[Exception](
      spark.sql("CREATE TABLE graft.bc1 (k BIGINT, u STRING) USING parquet " +
        "TBLPROPERTIES ('graft.bloom.columns' = 'usr')"))
    assert(e1.getMessage.contains("usr"), e1.getMessage)
    assert(!spark.catalog.tableExists("graft.bc1"))
    // unindexable type: bloom canonicalization covers string/integral only
    val e2 = intercept[Exception](
      spark.sql("CREATE TABLE graft.bc1 (k BIGINT, d DOUBLE) USING parquet " +
        "TBLPROPERTIES ('graft.bloom.columns' = 'd')"))
    assert(e2.getMessage.contains("integral"), e2.getMessage)
    // partition column: directory pruning owns it; annotate would fail
    // every later commit, so the declaration is refused up front
    val e3 = intercept[Exception](
      spark.sql("CREATE TABLE graft.bc1 (k BIGINT, p STRING) USING parquet " +
        "PARTITIONED BY (p) TBLPROPERTIES ('graft.bloom.columns' = 'p')"))
    assert(e3.getMessage.contains("partition"), e3.getMessage)
    // cluster-column typo fails identically
    val e4 = intercept[Exception](
      spark.sql("CREATE TABLE graft.bc1 (k BIGINT) USING parquet " +
        "TBLPROPERTIES ('graft.cluster.columns' = 'kk')"))
    assert(e4.getMessage.contains("kk"), e4.getMessage)
    assert(!spark.catalog.tableExists("graft.bc1"))
    // a valid declaration: plain SQL INSERTs annotate with no call-site
    // cooperation — the property alone builds the index
    spark.sql("CREATE TABLE graft.bc2 (k BIGINT, u STRING) USING parquet " +
      "TBLPROPERTIES ('graft.bloom.columns' = 'u', " +
      "'graft.cluster.columns' = 'k')")
    try {
      spark.sql("INSERT INTO graft.bc2 VALUES (1, 'ua'), (2, 'ub'), (3, 'uc')")
      val live = Sinks.resolve(s"$root/bc2")
      assert(graft.ops.Bloom.sidecarCols(spark, live) == Seq("u"),
        "declared bloom column must annotate on a plain INSERT")
      // cluster columns implicitly carry stats on every commit
      assert(graft.ops.Stats.sidecarCols(spark, live).contains("k"))
      // ALTER SET validates like CREATE: a typo'd column fails loudly
      val e5 = intercept[Exception](
        spark.sql("ALTER TABLE graft.bc2 SET TBLPROPERTIES " +
          "('graft.bloom.columns' = 'nope')"))
      assert(e5.getMessage.contains("nope"), e5.getMessage)
      val e6 = intercept[Exception](
        spark.sql("ALTER TABLE graft.bc2 SET TBLPROPERTIES " +
          "('graft.retain.hours' = '-5')"))
      assert(e6.getMessage.contains("graft.retain.hours"), e6.getMessage)
      // a valid ALTER retarget is accepted and persisted
      spark.sql("ALTER TABLE graft.bc2 SET TBLPROPERTIES " +
        "('graft.cluster.columns' = 'k', 'graft.retain.versions' = '2')")
      assert(graft.ops.TableProps.retainPolicy(s"$root/bc2")._1.contains(2))
    } finally spark.sql("DROP TABLE graft.bc2")
  }

  test("CALL graft.system.compact rewrites the live version and vacuums history") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.cmp (k INT, v DOUBLE)")
    try {
      // three INSERTs → v1..v3, each with its own small files
      (1 to 3).foreach(i =>
        spark.sql(s"INSERT INTO graft.cmp VALUES ($i, $i.5), (${i * 10}, $i.25)"))
      assert(Sinks.listVersions(s"$wh/cmp") == Seq(0L, 1L, 2L, 3L))
      val res = spark.sql(
        "CALL graft.system.compact(table => 'cmp', retain_versions => 1)").collect()
      // the procedure reports the version it published
      assert(res.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("cmp", 4L)))
      // data intact, file count collapsed to the target (1 at this size)
      assert(spark.sql("SELECT sum(k) FROM graft.cmp").head().getLong(0) == 6 + 60)
      assert(graft.io.Fs.walkParquet(
        java.nio.file.Paths.get(s"$wh/cmp/v4")).size == 1)
      // retention: base v3 + 1 retained version survive, older vacuumed
      assert(Sinks.listVersions(s"$wh/cmp") == Seq(2L, 3L, 4L))
      // unknown procedures and traversal table args fail loudly
      intercept[Exception](spark.sql("CALL graft.system.nope()"))
      intercept[Exception](
        spark.sql("CALL graft.system.compact(table => '../cmp')"))
    } finally spark.sql("DROP TABLE graft.cmp")
  }

  test("B149 snapshot tags: VERSION AS OF '<tag>' resolves, tags pin against vacuum, drop releases") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.tags (k INT, v DOUBLE)")
    try {
      val tr = s"$wh/tags"
      (1 to 3).foreach(i =>
        spark.sql(s"INSERT INTO graft.tags VALUES ($i, $i.5)"))
      // tag v1 explicitly and the live version by default
      val t1 = spark.sql(
        "CALL graft.system.tag(table => 'tags', name => 'first-insert', version => 1)")
        .collect()
      assert(t1.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq(("first-insert", 1L)))
      val t2 = spark.sql(
        "CALL graft.system.tag(table => 'tags', name => 'release')").collect()
      assert(t2.head.getLong(2) == 3L)
      // tag resolution in VERSION AS OF; numeric travel unaffected
      assert(spark.sql(
        "SELECT count(*) FROM graft.tags VERSION AS OF 'first-insert'")
        .head().getLong(0) == 1L)
      assert(spark.sql("SELECT count(*) FROM graft.tags VERSION AS OF 2")
        .head().getLong(0) == 2L)
      // unknown tags and all-digit / bad-char tag names fail loudly
      intercept[Exception](spark.sql(
        "SELECT * FROM graft.tags VERSION AS OF 'nope'"))
      intercept[Exception](spark.sql(
        "CALL graft.system.tag(table => 'tags', name => '7')"))
      intercept[Exception](spark.sql(
        "CALL graft.system.tag(table => 'tags', name => 'a/b')"))
      // tagging a vacuumed/absent version refuses
      intercept[Exception](spark.sql(
        "CALL graft.system.tag(table => 'tags', name => 'ghost', version => 99)"))
      // retention: retain_versions=0 would keep only the compaction base
      // and its rewrite — the tagged v1 must survive, untagged v0/v2 go
      spark.sql("CALL graft.system.compact(table => 'tags', retain_versions => 0)")
      assert(Sinks.listVersions(tr) == Seq(1L, 3L, 4L),
        s"tagged v1 must be pinned, got ${Sinks.listVersions(tr)}")
      assert(spark.sql(
        "SELECT count(*) FROM graft.tags VERSION AS OF 'first-insert'")
        .head().getLong(0) == 1L)
      // moving a tag re-pins (create-or-move semantics)
      spark.sql("CALL graft.system.tag(table => 'tags', name => 'release', version => 4)")
      assert(Sinks.resolveTag(tr, "release").contains(4L))
      // table_detail surfaces the pins an operator must see
      assert(spark.sql("SELECT tags FROM table_detail('graft.tags')")
        .head().getString(0) == "first-insert=v1,release=v4")
      // drop releases the pin: the next compaction vacuums v1
      spark.sql("CALL graft.system.drop_tag(table => 'tags', name => 'first-insert')")
      spark.sql("CALL graft.system.compact(table => 'tags', retain_versions => 0)")
      assert(!Sinks.listVersions(tr).contains(1L),
        "dropped tag must release its version to retention")
      // live reads were never disturbed
      assert(spark.sql("SELECT count(*) FROM graft.tags").head().getLong(0) == 3L)
    } finally spark.sql("DROP TABLE graft.tags")
  }

  test("B151 WAP branches: branch writes stay invisible, fast-forward is hardlink adoption, stale merges refuse") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.wap (k INT, v DOUBLE)")
    try {
      spark.sql("INSERT INTO graft.wap VALUES (1, 1.5), (2, 2.5)")
      val br = spark.sql(
        "CALL graft.system.branch(table => 'wap', name => 'audit')").collect()
      assert(br.map(r => (r.getString(1), r.getLong(2))).toSeq ==
        Seq(("wap__audit", 1L)))
      // write-audit happens on the branch; the base never sees a byte
      spark.sql("INSERT INTO graft.wap__audit VALUES (3, 3.5)")
      assert(spark.sql("SELECT count(*) FROM graft.wap").head().getLong(0) == 2L)
      assert(spark.sql("SELECT count(*) FROM graft.wap__audit").head().getLong(0) == 3L)
      // publish: fast-forward the base to the audited snapshot
      val m = spark.sql(
        "CALL graft.system.merge_branch(table => 'wap__audit')").collect()
      assert(m.head.getLong(1) == 2L)
      assert(spark.sql("SELECT sum(k) FROM graft.wap").head().getLong(0) == 6L)
      // the adoption carried files by inode, not by copy
      def inodes(dir: String): Set[Any] =
        graft.io.Fs.walkParquet(java.nio.file.Paths.get(dir))
          .map(java.nio.file.Files.getAttribute(_, "unix:ino")).toSet
      val branchLive = Sinks.versionPath(s"$wh/wap__audit",
        Sinks.currentVersion(s"$wh/wap__audit").get)
      assert(inodes(Sinks.versionPath(s"$wh/wap", 2L)).subsetOf(inodes(branchLive)),
        "fast-forward must adopt the branch's data files by hardlink")
      // a merged branch is stale (base moved past its branch point)
      intercept[Exception](spark.sql(
        "CALL graft.system.merge_branch(table => 'wap__audit')"))
      // a branch whose base advanced independently refuses too
      spark.sql("CALL graft.system.branch(table => 'wap', name => 'late')")
      spark.sql("INSERT INTO graft.wap VALUES (9, 9.5)")
      intercept[Exception](spark.sql(
        "CALL graft.system.merge_branch(table => 'wap__late')"))
      // merging a non-branch refuses; bad branch names refuse
      intercept[Exception](spark.sql(
        "CALL graft.system.merge_branch(table => 'wap')"))
      intercept[Exception](spark.sql(
        "CALL graft.system.branch(table => 'wap', name => 'a-b')"))
      // abandoning a branch is just DROP TABLE; the base is untouched
      spark.sql("DROP TABLE graft.wap__late")
      assert(spark.sql("SELECT count(*) FROM graft.wap").head().getLong(0) == 4L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.wap__audit")
      spark.sql("DROP TABLE IF EXISTS graft.wap")
    }
  }

  test("B152 SQL door: neardup_build/append + neardup_candidates run the incremental dedup flow from SQL") {
    root
    spark.sql("CREATE TABLE graft.nd_docs (doc_id BIGINT, text STRING)")
    spark.sql("CREATE TABLE graft.nd_batch (doc_id BIGINT, text STRING)")
    try {
      spark.sql(
        """INSERT INTO graft.nd_docs VALUES
          |(1, 'the quick brown fox jumps over the lazy dog tonight'),
          |(2, 'an entirely different document about spark plans today')""".stripMargin)
      val b = spark.sql(
        "CALL graft.system.neardup_build(table => 'nd_docs', index => 'nd_idx')")
        .collect()
      assert(b.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("nd_idx", 0L)))
      // append a third doc through the SQL door (O(delta))
      spark.sql("DELETE FROM graft.nd_docs WHERE doc_id = 2")
      spark.sql(
        """INSERT INTO graft.nd_batch VALUES
          |(3, 'numbers and letters mixed seven eight nine ten eleven')""".stripMargin)
      val a = spark.sql(
        "CALL graft.system.neardup_append(index => 'nd_idx', table => 'nd_batch')")
        .collect()
      assert(a.head.getLong(1) == 1L)
      // probe: a batch near-duplicating docs 1 and 3 matches both via the TVF,
      // composing with ordinary SQL around it
      spark.sql("CREATE TABLE graft.nd_probe (doc_id BIGINT, text STRING)")
      spark.sql(
        """INSERT INTO graft.nd_probe VALUES
          |(100, 'the quick brown fox jumps over the lazy dog tonight'),
          |(101, 'numbers and letters mixed seven eight nine ten eleven'),
          |(102, 'completely novel words sharing no shingles with anything')""".stripMargin)
      val got = spark.sql(
        """SELECT probe_id, match_id
          |FROM neardup_candidates('graft.nd_idx', 'graft.nd_probe')
          |ORDER BY probe_id, match_id""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((100L, 1L)) && got.contains((101L, 3L)),
        s"SQL probe must find both planted dups, got $got")
      assert(!got.exists(_._1 == 102L), s"novel doc must not match, got $got")
    } finally {
      Seq("nd_probe", "nd_batch", "nd_idx", "nd_docs").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft.$t"))
    }
  }

  test("table_files TVF: per-file inventory sums to the table's rows and tracks compaction") {
    root
    spark.sql("CREATE TABLE graft.tf (k INT, v DOUBLE)")
    try {
      (1 to 3).foreach(i =>
        spark.sql(s"INSERT INTO graft.tf VALUES ($i, $i.5), (${i * 10}, $i.25)"))
      val before = spark.sql("SELECT * FROM table_files('graft.tf')").collect()
      assert(before.length >= 3, "three inserts land at least three files")
      assert(before.map(_.getAs[Long]("n_rows")).sum == 6L,
        "footer row counts must sum to the table's rows")
      assert(before.forall(_.getAs[Long]("size_bytes") > 0L))
      assert(before.map(_.getAs[String]("file")).distinct.length == before.length)
      // compaction collapses the inventory without touching the rows
      spark.sql("CALL graft.system.compact(table => 'tf')")
      val after = spark.sql("SELECT * FROM table_files('graft.tf')").collect()
      assert(after.length < before.length, "compaction must shrink the file count")
      assert(after.map(_.getAs[Long]("n_rows")).sum == 6L)
    } finally spark.sql("DROP TABLE graft.tf")
  }

  test("table_detail TVF: one-row operational summary incl. acceleration metadata") {
    root
    val d0 = spark.sql("SELECT * FROM table_detail('graft.t1')").head()
    assert(d0.getAs[String]("format") == "parquet")
    assert(d0.getAs[Long]("n_files") >= 1 && d0.getAs[Long]("size_bytes") > 0)
    assert(d0.getAs[Long]("n_versions") >= 1)
    assert(!d0.getAs[Boolean]("is_ann_index"))
    // a bloom-indexed table reports its indexed columns
    spark.sql("CREATE TABLE graft.dtl (k BIGINT, s STRING)")
    try {
      spark.sql("INSERT INTO graft.dtl VALUES (1, 'a'), (2, 'b')")
      spark.sql("CALL graft.system.bloom_index(table => 'dtl', columns => 'k')")
      val d = spark.sql("SELECT * FROM table_detail('graft.dtl')").head()
      assert(d.getAs[String]("bloom_cols") == "k")
      assert(d.getAs[Long]("version") == 1L)
      // composes with surrounding SQL like any relation
      val joined = spark.sql(
        """SELECT h.version FROM table_history('graft.dtl') h
          |JOIN table_detail('graft.dtl') d ON h.version = d.version""".stripMargin)
      assert(joined.collect().map(_.getLong(0)).toSeq == Seq(1L))
      // round-9 observability: a MOR delete surfaces its vector
      // cardinality; an un-vectored table reports zero
      assert(d.getAs[Long]("n_deleted_positions") == 0L)
      val wh = spark.conf.get("spark.sql.catalog.graft.root")
      graft.ops.Sinks.deleteVector(spark, s"$wh/dtl",
        org.apache.spark.sql.functions.col("k") === 1L)
      val d2 = spark.sql("SELECT * FROM table_detail('graft.dtl')").head()
      assert(d2.getAs[Long]("n_deleted_positions") == 1L)
    } finally spark.sql("DROP TABLE graft.dtl")
  }

  test("CALL graft.system.bloom_index builds the sidecar; point lookups prune and stay exact") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.blx (k BIGINT, tag STRING)")
    try {
      // hash-spread keys so range stats can't prune a point probe
      graft.io.Tables.lineitem(spark, TestSpark.sf001)
        .selectExpr("l_orderkey AS k", "l_returnflag AS tag")
        .repartition(6, org.apache.spark.sql.functions.col("k"))
        .createOrReplaceTempView("blx_src")
      spark.sql("INSERT INTO graft.blx SELECT * FROM blx_src")
      val res = spark.sql(
        "CALL graft.system.bloom_index(table => 'blx', columns => 'k')").collect()
      assert(res.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq ==
        Seq(("blx", 1L, "k")))
      val live = Sinks.resolve(s"$wh/blx")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(live, graft.ops.Bloom.Sidecar)))
      // probe an existing key: few files open, result identical to SQL
      val k = spark.sql("SELECT min(k) FROM graft.blx WHERE k >= 50").head().getLong(0)
      val all = graft.io.Fs.walkParquet(java.nio.file.Paths.get(live)).size
      val kept = graft.ops.Bloom.prunedFilesEq(spark, live, "k", k).size
      assert(kept < all, s"no pruning: $kept of $all")
      val pruned = graft.ops.Bloom.readCurrentWhereEq(spark, s"$wh/blx", "k", k)
        .orderBy("k", "tag").collect().toSeq
      val full = spark.sql(s"SELECT * FROM graft.blx WHERE k = $k")
        .orderBy("k", "tag").collect().toSeq
      assert(pruned == full && pruned.nonEmpty)
      // unknown column fails loudly at the CALL, not mid-job
      val err = intercept[Exception](spark.sql(
        "CALL graft.system.bloom_index(table => 'blx', columns => 'nope')"))
      assert(err.getMessage.contains("nope"))
    } finally spark.sql("DROP TABLE graft.blx")
  }

  test("CALL graft.system.zorder clusters the live version; predicates on EITHER dimension file-prune") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("CREATE TABLE graft.zx (a BIGINT, b BIGINT, payload STRING)")
    try {
      // anti-clustered input: a ascending, b descending, round-robin
      // spread — a single-column layout could never prune both; the
      // payload is incompressible so the rewrite spans several 1 MB files
      spark.range(0, 100000)
        .selectExpr("id AS a", "(99999 - id) AS b",
          "concat(md5(cast(id AS string)), md5(cast(id * 31 + 7 AS string))) AS payload")
        .repartition(8)
        .createOrReplaceTempView("zx_src")
      spark.sql("INSERT INTO graft.zx SELECT * FROM zx_src")
      val res = spark.sql(
        "CALL graft.system.zorder(table => 'zx', columns => 'a,b', target_mb => 1)")
        .collect()
      assert(res.map(r => (r.getString(0), r.getString(2))).toSeq ==
        Seq(("zx", "a,b")))
      val live = Sinks.resolve(s"$wh/zx")
      val all = graft.io.Fs.walkParquet(Paths.get(live)).size
      assert(all > 1, s"fixture must span several files, got $all")
      // the stats sidecar landed in the SAME commit and both dimensions
      // file-prune a narrow range
      for (c <- Seq("a", "b")) {
        val kept = graft.ops.Stats.prunedFiles(spark, live, c, 100L, 200L).size
        assert(kept < all, s"dimension $c does not prune: $kept of $all")
        // pruned read ≡ full read, value for value
        val pruned = graft.ops.Stats.readCurrentWhere(spark, s"$wh/zx", c, 100L, 200L)
          .selectExpr("a", "b").orderBy("a").collect().toSeq
        val full = spark.sql(s"SELECT a, b FROM graft.zx WHERE $c BETWEEN 100 AND 200")
          .orderBy("a").collect().toSeq
        assert(pruned == full && pruned.size == 101)
      }
      assert(Sinks.opOf(live) == "zorder")
      // refusals fail the CALL loudly: unknown column, partition column,
      // single dimension
      assert(intercept[Exception](spark.sql(
        "CALL graft.system.zorder(table => 'zx', columns => 'nope,a')"))
        .getMessage.contains("nope"))
      assert(intercept[Exception](spark.sql(
        "CALL graft.system.zorder(table => 'zx', columns => 'a')"))
        .getMessage.contains(">= 2"))
    } finally spark.sql("DROP TABLE graft.zx")
  }

  test("SHOW PROCEDURES, the unknown-procedure hint, and the loader serve ONE name list") {
    root
    import org.apache.spark.sql.connector.catalog.Identifier
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[graft.catalog.GraftCatalog]
    // every listed name loads (the round-11 advisor found six served
    // procedures the listing omitted)
    graft.catalog.GraftProcedures.Names.foreach { n =>
      cat.loadProcedure(Identifier.of(Array("system"), n))
    }
    val listed = cat.listProcedures(Array("system")).map(_.name()).toSet
    assert(listed == graft.catalog.GraftProcedures.Names.toSet)
    // the unknown-procedure hint names everything the loader serves
    val e = intercept[RuntimeException](
      cat.loadProcedure(Identifier.of(Array("system"), "nope")))
    graft.catalog.GraftProcedures.Names.foreach(n =>
      assert(e.getMessage.contains(s"system.$n"), s"hint omits $n"))
  }

  test("ALTER RENAME/ADD to a reserved _COLMAP marker prefix fails loudly, never hides a column") {
    root
    spark.sql("CREATE TABLE graft.rsv (a BIGINT, b BIGINT)")
    try {
      spark.sql("INSERT INTO graft.rsv VALUES (1, 2)")
      val e1 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.rsv RENAME COLUMN b TO `__graft_dropped.b`"))
      assert(e1.getMessage.contains("reserved"), e1.getMessage)
      val e2 = intercept[Exception](spark.sql(
        "ALTER TABLE graft.rsv ADD COLUMNS (`__graft_added.c` BIGINT)"))
      assert(e2.getMessage.contains("reserved"), e2.getMessage)
      // the table is untouched and fully readable
      assert(spark.sql("SELECT * FROM graft.rsv").columns.toSeq == Seq("a", "b"))
      assert(spark.sql("SELECT * FROM graft.rsv").count() == 1)
    } finally spark.sql("DROP TABLE graft.rsv")
  }

  test("table_history TVF lists retained versions with operation and current flag") {
    root
    val h = spark.sql("SELECT * FROM table_history('graft.t1') ORDER BY version")
      .collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(h.map(r => r.getString(2)).toSeq == Seq("publish", "publish"),
      "operation column must carry the per-commit op marker")
    assert(h.map(r => r.getBoolean(3)).toSeq == Seq(false, true))
    // composes with SQL around it — the time-travel join everyone writes:
    // count rows at every retained version
    val counts = spark.sql(
      """SELECT version, (SELECT count(*) FROM graft.t1 VERSION AS OF 0) AS n0
        |FROM table_history('graft.t1') WHERE is_current
        |""".stripMargin).collect()
    assert(counts.length == 1 && counts(0).getLong(0) == 1L)
  }

  test("CHECK constraints: SET validates existing data, then gates INSERT/UPDATE/MERGE") {
    root
    spark.sql("CREATE TABLE graft.ck (k INT, v DOUBLE)")
    try {
      spark.sql("INSERT INTO graft.ck VALUES (1, 10.0), (2, 20.0)")
      // adding a constraint the data violates is refused with evidence
      val bad = intercept[Exception](
        spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES ('check.big' = 'v > 15')"))
      assert(bad.getMessage.contains("existing row"), s"wrong error: ${bad.getMessage}")
      // a satisfiable constraint lands and shows in SHOW TBLPROPERTIES
      spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES ('check.nonneg' = 'v >= 0')")
      assert(spark.sql("SHOW TBLPROPERTIES graft.ck").collect()
        .exists(r => r.getString(0) == "check.nonneg" && r.getString(1) == "v >= 0"))
      // INSERT: violating statement fails atomically, clean one lands
      val e1 = intercept[Exception](
        spark.sql("INSERT INTO graft.ck VALUES (3, -1.0), (4, 40.0)"))
      assert(e1.getMessage.contains("nonneg"), s"wrong error: ${e1.getMessage}")
      assert(spark.sql("SELECT * FROM graft.ck").count() == 2,
        "a failed INSERT published rows")
      spark.sql("INSERT INTO graft.ck VALUES (5, 50.0)")
      // UPDATE: a rewrite that would break the constraint fails, table intact
      val e2 = intercept[Exception](
        spark.sql("UPDATE graft.ck SET v = v - 100 WHERE k = 1"))
      assert(e2.getMessage.contains("nonneg"))
      assert(spark.sql("SELECT v FROM graft.ck WHERE k = 1").head().getDouble(0) == 10.0)
      // MERGE: a violating inserted row fails the whole statement
      val e3 = intercept[Exception](spark.sql(
        """MERGE INTO graft.ck t USING (SELECT 9 AS k, -5.0 AS v) s ON t.k = s.k
          |WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.v)""".stripMargin))
      assert(e3.getMessage.contains("nonneg"))
      assert(spark.sql("SELECT * FROM graft.ck WHERE k = 9").count() == 0)
      // UNSET lifts the gate
      spark.sql("ALTER TABLE graft.ck UNSET TBLPROPERTIES ('check.nonneg')")
      spark.sql("INSERT INTO graft.ck VALUES (6, -6.0)")
      assert(spark.sql("SELECT * FROM graft.ck").count() == 4)
      // malformed or non-check properties are rejected loudly
      intercept[Exception](
        spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES ('check.bad' = 'no_such_col > 0')"))
      intercept[Exception](
        spark.sql("ALTER TABLE graft.ck SET TBLPROPERTIES ('owner' = 'me')"))
      // constraints can also be declared at CREATE time
      spark.sql("CREATE TABLE graft.ck2 (x INT) TBLPROPERTIES ('check.pos' = 'x > 0')")
      try {
        intercept[Exception](spark.sql("INSERT INTO graft.ck2 VALUES (0)"))
        spark.sql("INSERT INTO graft.ck2 VALUES (1)")
        assert(spark.sql("SELECT * FROM graft.ck2").count() == 1)
        // SQL CHECK semantics: UNKNOWN (NULL) satisfies the constraint —
        // a NULL x passes 'x > 0', exactly as in Postgres/Delta
        spark.sql("INSERT INTO graft.ck2 VALUES (NULL)")
        assert(spark.sql("SELECT * FROM graft.ck2").count() == 2)
        // so the layout's null-backfill contracts compose with checks:
        // a partial-column MERGE INSERT backfills unassigned cols with
        // NULL and must not trip their constraints
        spark.sql("ALTER TABLE graft.ck2 ADD COLUMNS (y INT)")
        spark.sql("ALTER TABLE graft.ck2 SET TBLPROPERTIES ('check.ypos' = 'y > 0')")
        spark.sql("""MERGE INTO graft.ck2 t USING (SELECT 7 AS x) s ON t.x = s.x
                    |WHEN NOT MATCHED THEN INSERT (x) VALUES (s.x)""".stripMargin)
        assert(spark.sql("SELECT * FROM graft.ck2 WHERE x = 7").count() == 1)
      } finally spark.sql("DROP TABLE graft.ck2")
      // a CREATE whose constraint fails to validate leaves NO table
      // behind — the corrected retry must succeed, not hit ALREADY_EXISTS
      intercept[Exception](spark.sql(
        "CREATE TABLE graft.ck3 (x INT) TBLPROPERTIES ('check.bad' = 'nope > 0')"))
      assert(!spark.catalog.tableExists("graft.ck3"))
      spark.sql("CREATE TABLE graft.ck3 (x INT) TBLPROPERTIES ('check.ok' = 'x >= 0')")
      spark.sql("DROP TABLE graft.ck3")
    } finally spark.sql("DROP TABLE graft.ck")
  }

  test("filters push down through the delegated parquet scan") {
    root
    val plan = spark.sql(
      "SELECT r_name FROM graft.t1 VERSION AS OF 0 WHERE r_regionkey > 2")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(r_regionkey,2"),
      s"pushdown missing from plan:\n$plan")
    // pruning must be asserted on a column that EXISTS and is unprojected:
    // nation (ns.t2) has 3 columns; project 1, filter another, and the
    // third must vanish from ReadSchema
    val pruned = spark.sql(
      "SELECT n_regionkey FROM graft.ns.t2 WHERE n_nationkey > 2")
      .queryExecution.executedPlan.toString
    val readSchema = pruned.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail(s"no ReadSchema in plan:\n$pruned"))
    assert(!readSchema.contains("n_name"),
      s"column pruning missing — unprojected n_name still read: $readSchema")
  }

  test("small catalog tables broadcast WITHOUT hints (size statistics reach the planner)") {
    root
    // join a large fixture against the 3-row catalog table, no hint: the
    // delegated v2 parquet scan reports its file-size statistics, so the
    // planner must pick a broadcast join on its own — at 100 TB this is
    // what keeps dimension joins shuffle-free without per-query hints
    val big = graft.io.Tables.nation(spark, sf001)
    val small = spark.table("graft.t1")
    val joined = big.join(small, big("n_regionkey") === small("r_regionkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"small catalog table was not auto-broadcast:\n$plan")
    assert(joined.count() > 0)
  }

  test("PARTITIONED BY: Hive layout per version, pruned scans, declared types survive") {
    root
    spark.sql("""CREATE TABLE graft.pt (id INT, v DOUBLE, day STRING)
                |USING parquet PARTITIONED BY (day)""".stripMargin)
    try {
      spark.sql("""INSERT INTO graft.pt VALUES
                  |(1, 1.5, '2024-01-01'), (2, 2.5, '2024-01-01'),
                  |(3, 3.5, '2024-01-02'), (4, 4.5, '00123')""".stripMargin)
      // the inference trap: date-shaped and leading-zero values come back
      // as the DECLARED string type, not DATE / INT 123
      val df = spark.sql("SELECT * FROM graft.pt")
      assert(df.schema("day").dataType == org.apache.spark.sql.types.StringType,
        s"partition column type rewritten by inference: ${df.schema.simpleString}")
      assert(df.where("day = '00123'").select("id").head().getInt(0) == 4)
      assert(df.count() == 4)
      // the version dir is genuinely Hive-partitioned
      val wh = spark.conf.get("spark.sql.catalog.graft.root")
      val v1 = Paths.get(s"$wh/pt/v1")
      assert(Files.isDirectory(v1.resolve("day=2024-01-01")),
        "INSERT did not lay the version out by partition column")
      // and the partition filter reaches the scan (directory pruning)
      val plan = spark.sql("SELECT id FROM graft.pt WHERE day = '2024-01-01'")
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("day"),
        s"partition filter did not reach the scan:\n$plan")
      assert(spark.sql("SELECT id FROM graft.pt WHERE day = '2024-01-01'").count() == 2)
      // DESCRIBE surfaces the partitioning
      val desc = spark.sql("DESCRIBE TABLE graft.pt").collect().map(_.getString(0))
      assert(desc.contains("# Partition Information") && desc.count(_ == "day") == 2,
        s"partitioning missing from DESCRIBE: ${desc.mkString(", ")}")
      // static partition INSERT (Spark rewrites it into a projection)
      spark.sql("INSERT INTO graft.pt PARTITION (day='2024-02-01') VALUES (5, 5.5)")
      assert(spark.sql("SELECT id FROM graft.pt WHERE day = '2024-02-01'")
        .head().getInt(0) == 5)
      // SHOW CREATE TABLE round-trips schema + partitioning
      val ddl = spark.sql("SHOW CREATE TABLE graft.pt").head().getString(0)
      assert(ddl.contains("PARTITIONED BY (day)"), s"partitioning lost in DDL:\n$ddl")
    } finally spark.sql("DROP TABLE graft.pt")
  }

  test("partitioned tables: DML, ALTER, and time travel keep the layout and the types") {
    root
    val wh = spark.conf.get("spark.sql.catalog.graft.root")
    spark.sql("""CREATE TABLE graft.pt2 (id INT, v DOUBLE, day STRING)
                |USING parquet PARTITIONED BY (day)""".stripMargin)
    try {
      spark.sql("""INSERT INTO graft.pt2 VALUES
                  |(1, 1.5, '2024-01-01'), (2, 2.5, '2024-01-02')""".stripMargin)
      // UPDATE rewrites through the same publish → still partitioned
      spark.sql("UPDATE graft.pt2 SET v = v * 2 WHERE day = '2024-01-01'")
      assert(Files.isDirectory(Paths.get(s"$wh/pt2/v2/day=2024-01-01")),
        "UPDATE lost the partitioned layout")
      assert(spark.sql("SELECT v FROM graft.pt2 WHERE id = 1").head().getDouble(0) == 3.0)
      // MERGE too
      spark.sql("""MERGE INTO graft.pt2 t USING (SELECT 9 AS id, 9.0 AS v,
                  |'2024-01-03' AS day) s ON t.id = s.id
                  |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      assert(Files.isDirectory(Paths.get(s"$wh/pt2/v3/day=2024-01-03")),
        "MERGE lost the partitioned layout")
      // ADD COLUMNS evolves; partition dirs survive; old versions travel
      spark.sql("ALTER TABLE graft.pt2 ADD COLUMNS (note STRING)")
      assert(Files.isDirectory(Paths.get(s"$wh/pt2/v4/day=2024-01-02")),
        "ADD COLUMNS lost the partitioned layout")
      assert(spark.sql("SELECT * FROM graft.pt2").columns.contains("note"))
      val v1 = spark.sql("SELECT * FROM graft.pt2 VERSION AS OF 1")
      assert(v1.count() == 2 && !v1.columns.contains("note"))
      assert(v1.schema("day").dataType == org.apache.spark.sql.types.StringType)
      // CTAS with PARTITIONED BY in one statement
      spark.sql("""CREATE TABLE graft.pt3 USING parquet PARTITIONED BY (day)
                  |AS SELECT id, v, day FROM graft.pt2""".stripMargin)
      try {
        assert(spark.sql("SELECT * FROM graft.pt3").count() == 3)
        assert(graft.io.Fs.listDir(Paths.get(s"$wh/pt3/v1"))
          .exists(_.getFileName.toString.startsWith("day=")),
          "CTAS did not partition the data version")
      } finally spark.sql("DROP TABLE graft.pt3")
    } finally spark.sql("DROP TABLE graft.pt2")
  }

  test("DML is copy-on-write: untouched files are carried by hardlink, touched rewritten") {
    import spark.implicits._
    val wh = root
    // 4 disjoint-range files so a narrow predicate touches exactly one
    (0L until 400L).map(i => (i, s"p$i")).toDF("id", "pay")
      .repartitionByRange(4, org.apache.spark.sql.functions.col("id"))
      .sortWithinPartitions("id")
      .createOrReplaceTempView("cow_src")
    spark.sql("CREATE TABLE graft.cow AS SELECT * FROM cow_src")
    try {
      val tbl = s"$wh/cow"
      val v0 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      // 4 range files + the empty v0 placeholder the CTAS append carried
      val v0Files = graft.io.Fs.walkParquet(v0).map(_.getFileName.toString)
      assert(v0Files.size == 5)
      spark.sql("DELETE FROM graft.cow WHERE id BETWEEN 10 AND 20")
      val v1 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      val v1Files = graft.io.Fs.walkParquet(v1).map(_.getFileName.toString)
      // exactly one file replaced; every other carried under its
      // original name as a hardlink (same inode, zero bytes moved)
      assert(v1Files.toSet.intersect(v0Files.toSet).size == v0Files.size - 1)
      v1Files.toSet.intersect(v0Files.toSet).foreach { n =>
        assert(Files.getAttribute(v1.resolve(n), "unix:nlink")
          .asInstanceOf[Int] >= 2, s"$n should be a hardlink")
      }
      assert(spark.sql("SELECT count(*) FROM graft.cow").head.getLong(0) == 389)
      // UPDATE: same shape
      spark.sql("UPDATE graft.cow SET pay = 'X' WHERE id = 350")
      val v2 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      val v2Files = graft.io.Fs.walkParquet(v2).map(_.getFileName.toString)
      assert(v2Files.toSet.intersect(v1Files.toSet).size == v1Files.size - 1)
      assert(spark.sql("SELECT pay FROM graft.cow WHERE id = 350").head.getString(0) == "X")
      assert(spark.sql("SELECT count(*) FROM graft.cow").head.getLong(0) == 389)
      // MERGE without NOT MATCHED BY SOURCE: touched pass + COW; the
      // insert lands in a new file, matched file rewritten, rest linked
      Seq((100L, "m100"), (9999L, "new")).toDF("id", "pay")
        .createOrReplaceTempView("cow_delta")
      spark.sql(
        """MERGE INTO graft.cow t USING cow_delta s ON t.id = s.id
          |WHEN MATCHED THEN UPDATE SET pay = s.pay
          |WHEN NOT MATCHED THEN INSERT (id, pay) VALUES (s.id, s.pay)""".stripMargin)
      val v3 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      val v3Files = graft.io.Fs.walkParquet(v3).map(_.getFileName.toString)
      assert(v3Files.toSet.intersect(v2Files.toSet).size == v2Files.size - 1,
        s"MERGE should carry all but the matched file, got ${v3Files.mkString(",")}")
      assert(spark.sql("SELECT pay FROM graft.cow WHERE id = 100").head.getString(0) == "m100")
      assert(spark.sql("SELECT count(*) FROM graft.cow").head.getLong(0) == 390)
      // a no-match DELETE bumps the version with EVERYTHING carried
      spark.sql("DELETE FROM graft.cow WHERE id = -5")
      val v4 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      assert(graft.io.Fs.walkParquet(v4).map(_.getFileName.toString).toSet ==
        v3Files.toSet)
      assert(spark.sql("SELECT count(*) FROM graft.cow").head.getLong(0) == 390)
    } finally spark.sql("DROP TABLE graft.cow")
  }

  test("insert-only MERGE carries every data file and appends only the new rows") {
    import spark.implicits._
    val wh = root
    (0L until 100L).map(i => (i, s"p$i")).toDF("id", "pay")
      .createOrReplaceTempView("imrg_src")
    spark.sql("CREATE TABLE graft.imrg AS SELECT * FROM imrg_src")
    try {
      val tbl = s"$wh/imrg"
      val v0 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      val v0Files = graft.io.Fs.walkParquet(v0).map(_.getFileName.toString).toSet
      Seq((50L, "dup"), (200L, "new")).toDF("id", "pay")
        .createOrReplaceTempView("imrg_delta")
      spark.sql(
        """MERGE INTO graft.imrg t USING imrg_delta s ON t.id = s.id
          |WHEN NOT MATCHED THEN INSERT (id, pay) VALUES (s.id, s.pay)""".stripMargin)
      val v1 = Paths.get(Sinks.versionPath(tbl, Sinks.currentVersion(tbl).get))
      val v1Files = graft.io.Fs.walkParquet(v1).map(_.getFileName.toString).toSet
      // NOTHING rewritten: every old file carried, one new file appended
      assert(v0Files.subsetOf(v1Files),
        s"insert-only MERGE must not rewrite matched files: ${v0Files -- v1Files} lost")
      assert(spark.sql("SELECT count(*) FROM graft.imrg").head.getLong(0) == 101)
      assert(spark.sql("SELECT pay FROM graft.imrg WHERE id = 50").head.getString(0) == "p50",
        "a matched row must keep its TARGET values under insert-only MERGE")
      assert(spark.sql("SELECT pay FROM graft.imrg WHERE id = 200").head.getString(0) == "new")
    } finally spark.sql("DROP TABLE graft.imrg")
  }

  test("SQL DML emits its change feed — the O(delta) fast path equals the snapshot diff") {
    import spark.implicits._
    val wh = root
    (0L until 60L).map(i => (i, s"p$i")).toDF("id", "pay")
      .createOrReplaceTempView("cdfd_src")
    spark.sql("CREATE TABLE graft.cdfd AS SELECT * FROM cdfd_src")
    try {
      val tbl = s"$wh/cdfd"
      def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, String)] =
        df.select("id", "pay", "_change_type").collect()
          .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      def stepMatches(from: Long, to: Long): Unit = {
        val fast = graft.ops.Sinks.changeFeed(spark, tbl, from, to)
        assert(fast.isDefined, s"v$from→v$to must be readable via the feed fast path")
        val diff = graft.ops.Sinks.changesBetween(spark, tbl, from, to, Seq("id"))
        assert(rows(fast.get.drop("_commit_version")) == rows(diff),
          s"writer feed for v$from→v$to diverges from the snapshot diff")
      }
      spark.sql("DELETE FROM graft.cdfd WHERE id < 10")           // v2
      stepMatches(1L, 2L)
      spark.sql("UPDATE graft.cdfd SET pay = 'U' WHERE id % 7 = 0") // v3
      stepMatches(2L, 3L)
      Seq((15L, "m15", "u"), (100L, "new", "u"), (20L, "", "d"))
        .toDF("id", "pay", "act").createOrReplaceTempView("cdfd_delta")
      spark.sql(
        """MERGE INTO graft.cdfd t USING cdfd_delta s ON t.id = s.id
          |WHEN MATCHED AND s.act = 'd' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET pay = s.pay
          |WHEN NOT MATCHED THEN INSERT (id, pay) VALUES (s.id, s.pay)""".stripMargin) // v4
      stepMatches(3L, 4L)
      // and the whole range composes through the chain
      assert(graft.ops.Sinks.changeFeed(spark, tbl, 1L, 4L).get.count() > 0)
    } finally spark.sql("DROP TABLE graft.cdfd")
  }

  test("COW DML decodes escaped partition values — deleted rows never resurrect") {
    root
    spark.sql(
      "CREATE TABLE graft.cowp (id BIGINT, city STRING) USING parquet PARTITIONED BY (city)")
    try {
      // 'a:b' Hive-escapes on disk (city=a%3Ab) and URL-encodes again in
      // input_file_name (city=a%253Ab); 'x y' stays raw on disk but
      // encodes as x%20y — both break an undecoded carry-filter key
      spark.sql(
        "INSERT INTO graft.cowp VALUES (1, 'a:b'), (2, 'a:b'), (3, 'plain'), (4, 'x y')")
      spark.sql("DELETE FROM graft.cowp WHERE id = 1")
      val rows = spark.sql("SELECT id FROM graft.cowp ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows == Seq(2L, 3L, 4L),
        s"undecoded COW keys resurrect/duplicate rows: got $rows")
      spark.sql("UPDATE graft.cowp SET id = 40 WHERE city = 'x y'")
      val rows2 = spark.sql("SELECT id FROM graft.cowp ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
      assert(rows2 == Seq(2L, 3L, 40L), s"got $rows2")
    } finally spark.sql("DROP TABLE graft.cowp")
  }

  test("CALL ann_split: IVF maintenance from SQL splits the hot bucket") {
    root
    import org.apache.spark.sql.functions.{col, lit, when}
    val emb = graft.io.Tables.embeddings(spark, TestSpark.sf001)
      .withColumn("label", when(col("vec_id") % 10 < 8, lit(0L)).otherwise(col("label")))
    graft.ops.AnnIndex.buildFixed(spark, emb, s"$root/annidx")
    val out = spark.sql(
      "CALL graft.system.ann_split(table => 'annidx', factor => 2.0)").head()
    assert(out.getString(0) == "annidx" && out.getLong(1) == 1L)
    assert(out.getLong(2) == emb.select("label").distinct().count() + 1,
      "one split must add one bucket")
    spark.sql("DROP TABLE graft.annidx")
  }

  test("CALL txn_publish: bronze+silver commit atomically from pure SQL; crash legs hold") {
    root
    import graft.ops.Txn
    spark.sql("CREATE TABLE graft.txn_src AS SELECT id AS k, id * 10 AS amt FROM range(5)")
    try {
      // create both tables in ONE transaction: an append-shaped bronze
      // copy and a silver aggregate OF THE SAME statement set
      val out = spark.sql(
        """CALL graft.system.txn_publish(
          |  tables => 'txn_bronze,txn_silver',
          |  sqls => 'SELECT k, amt FROM graft.txn_src
          |           ;; SELECT count(*) AS n, sum(amt) AS total FROM graft.txn_src')
          |""".stripMargin).collect()
      assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
        Set(("txn_bronze", 0L), ("txn_silver", 0L)))
      assert(spark.sql("SELECT count(*) FROM graft.txn_bronze").head().getLong(0) == 5L)
      assert(spark.sql("SELECT total FROM graft.txn_silver").head().getLong(0) == 100L)
      // the medallion hop: append to bronze + recompute silver, one commit
      spark.sql("INSERT INTO graft.txn_src VALUES (99, 1000)")
      spark.sql(
        """CALL graft.system.txn_publish(
          |  tables => 'txn_bronze,txn_silver',
          |  sqls => 'SELECT k, amt FROM graft.txn_src WHERE k = 99
          |           ;; SELECT count(*) AS n, sum(amt) AS total FROM graft.txn_bronze',
          |  modes => 'append,publish')""".stripMargin)
      assert(spark.sql("SELECT count(*) FROM graft.txn_bronze").head().getLong(0) == 6L)
      // silver recomputed FROM THE PRE-COMMIT bronze (statement-level
      // snapshot isolation: the SELECT resolved before the flip)
      assert(spark.sql("SELECT n FROM graft.txn_silver").head().getLong(0) == 5L)
      // crash matrix through the SQL door: kill between the conditional
      // pointer parks — NOTHING moves (both tables still read their
      // pre-transaction versions)
      val bronzeV = graft.ops.Sinks.currentVersion(s"$root/txn_bronze").get
      val silverV = graft.ops.Sinks.currentVersion(s"$root/txn_silver").get
      Txn.failpoint = step =>
        if (step.startsWith("conditional:") && step.contains("txn_silver"))
          throw new RuntimeException(s"kill@$step")
      try intercept[RuntimeException](spark.sql(
        """CALL graft.system.txn_publish(
          |  tables => 'txn_bronze,txn_silver',
          |  sqls => 'SELECT k, amt FROM graft.txn_src
          |           ;; SELECT 1 AS n, 2 AS total')""".stripMargin))
      finally Txn.failpoint = _ => ()
      assert(graft.ops.Sinks.currentVersion(s"$root/txn_bronze").contains(bronzeV))
      assert(graft.ops.Sinks.currentVersion(s"$root/txn_silver").contains(silverV))
      assert(spark.sql("SELECT count(*) FROM graft.txn_bronze").head().getLong(0) == 6L)
      // kill right AFTER the marker — both tables already read their new
      // versions (the marker creation IS the commit point)
      Txn.failpoint = step =>
        if (step == "marker") throw new RuntimeException("kill@marker")
      try intercept[RuntimeException](spark.sql(
        """CALL graft.system.txn_publish(
          |  tables => 'txn_bronze,txn_silver',
          |  sqls => 'SELECT CAST(7 AS BIGINT) AS k, CAST(70 AS BIGINT) AS amt
          |           ;; SELECT CAST(1 AS BIGINT) AS n, CAST(70 AS BIGINT) AS total')""".stripMargin))
      finally Txn.failpoint = _ => ()
      assert(spark.sql("SELECT count(*) FROM graft.txn_bronze").head().getLong(0) == 1L)
      assert(spark.sql("SELECT total FROM graft.txn_silver").head().getLong(0) == 70L)
      // malformed calls refuse before anything stages
      assert(intercept[Exception](spark.sql(
        "CALL graft.system.txn_publish(tables => 'txn_bronze', sqls => 'SELECT 1 ;; SELECT 2')"))
        .getMessage.contains("1 tables but 2 statements"))
      assert(intercept[Exception](spark.sql(
        """CALL graft.system.txn_publish(tables => 'nope_new',
          |  sqls => 'SELECT 1 AS x', modes => 'append')""".stripMargin))
        .getMessage.contains("append mode requires existing table"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft.txn_src")
      spark.sql("DROP TABLE IF EXISTS graft.txn_bronze")
      spark.sql("DROP TABLE IF EXISTS graft.txn_silver")
    }
  }

  // ---- round-9 schema evolution: RENAME / DROP COLUMN ----

  test("RENAME COLUMN is metadata-only: zero data files rewritten, old versions keep their schema") {
    root
    spark.sql("CREATE TABLE graft.se1 AS SELECT id AS k, id * 2 AS v FROM range(10)")
    try {
      val preKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(s"$root/se1")))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      spark.sql("ALTER TABLE graft.se1 RENAME COLUMN v TO val")
      // the rename commit carried every data file by hardlink — the
      // Delta column-mapping contract: O(1) metadata, not O(table)
      val postKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(s"$root/se1")))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      assert(postKeys == preKeys,
        "RENAME COLUMN must not rewrite any data file (column mapping)")
      assert(graft.ops.ColMap.load(Sinks.resolve(s"$root/se1")) == Map("val" -> "v"))
      assert(spark.table("graft.se1").columns.toSeq == Seq("k", "val"))
      assert(spark.sql("SELECT sum(val) AS s FROM graft.se1").head().getLong(0) == 90L)
      // the pre-evolution version still reads under its ORIGINAL schema
      assert(spark.sql("SELECT * FROM graft.se1 VERSION AS OF 1")
        .columns.toSeq == Seq("k", "v"))
      // collision and unknown-source renames refuse
      assert(intercept[Exception](
        spark.sql("ALTER TABLE graft.se1 RENAME COLUMN k TO val"))
        .getMessage.contains("already exists"))
      intercept[Exception](
        spark.sql("ALTER TABLE graft.se1 RENAME COLUMN nope TO x"))
      // writes through the evolved schema land normally (the append
      // translates its new rows to the carried files' physical names)
      spark.sql("INSERT INTO graft.se1 VALUES (100, 200)")
      assert(spark.sql("SELECT sum(val) AS s FROM graft.se1").head().getLong(0) == 290L)
      // a second rename composes through to the ORIGINAL physical name
      spark.sql("ALTER TABLE graft.se1 RENAME COLUMN val TO value")
      assert(graft.ops.ColMap.load(Sinks.resolve(s"$root/se1")) == Map("value" -> "v"))
      assert(spark.sql("SELECT sum(value) AS s FROM graft.se1").head().getLong(0) == 290L)
      // renaming BACK to the physical name converges to an unmapped table
      spark.sql("ALTER TABLE graft.se1 RENAME COLUMN value TO v")
      assert(!graft.ops.ColMap.exists(Sinks.resolve(s"$root/se1")))
      // DML on a mapped version routes merge-on-read and sees logical names
      spark.sql("ALTER TABLE graft.se1 RENAME COLUMN v TO val")
      spark.sql("UPDATE graft.se1 SET val = 0 WHERE k = 100")
      spark.sql("DELETE FROM graft.se1 WHERE k = 9")
      assert(spark.sql("SELECT sum(val) AS s FROM graft.se1").head().getLong(0) == 72L)
      // compaction materializes the renames: files speak the logical
      // name afterwards and the marker is gone
      spark.sql("CALL graft.system.compact(table => 'se1')")
      val live = Sinks.resolve(s"$root/se1")
      assert(!graft.ops.ColMap.exists(live))
      assert(spark.read.parquet(live).columns.toSeq.sorted == Seq("k", "val"))
      assert(spark.sql("SELECT sum(val) AS s FROM graft.se1").head().getLong(0) == 72L)
    } finally spark.sql("DROP TABLE graft.se1")
  }

  test("DROP COLUMN is metadata-only: tombstoned + hardlinked; compaction purges; last column refuses") {
    root
    spark.sql(
      "CREATE TABLE graft.se2 AS SELECT id AS k, id * 2 AS v, id * 3 AS w FROM range(10)")
    try {
      val preKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(s"$root/se2")))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      spark.sql("ALTER TABLE graft.se2 DROP COLUMN w")
      // the drop commit carried every data file by hardlink (inode
      // identity) — O(1) metadata like RENAME, the Delta column-mapping
      // drop; the bytes stay until compaction purges them
      val live = Sinks.resolve(s"$root/se2")
      val postKeys = graft.io.Fs.walkParquet(Paths.get(live))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      assert(postKeys == preKeys,
        "DROP COLUMN must not rewrite any data file (column-mapping tombstone)")
      assert(graft.ops.ColMap.dropped(live) == Set("w"))
      assert(spark.table("graft.se2").columns.toSeq == Seq("k", "v"))
      assert(!spark.sql("SELECT * FROM graft.se2").columns.contains("w"))
      // and the scan PRUNES the tombstoned column (never reads its bytes)
      val scanSchemas = spark.sql("SELECT * FROM graft.se2")
        .queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).toSeq
      assert(scanSchemas.nonEmpty && !scanSchemas.exists(_.contains("w")),
        s"dropped column still read:\n${scanSchemas.mkString("\n")}")
      // DESCRIBE HISTORY names the operation
      assert(Sinks.history(spark, s"$root/se2").orderBy("version")
        .select("operation").collect().map(_.getString(0)).last == "drop-column")
      // appends through the evolved schema land normally (new files
      // simply lack the tombstoned physical column)
      spark.sql("INSERT INTO graft.se2 VALUES (100, 200)")
      assert(spark.sql("SELECT sum(v) AS s FROM graft.se2").head().getLong(0) == 290L)
      assert(graft.ops.ColMap.dropped(Sinks.resolve(s"$root/se2")) == Set("w"),
        "the tombstone must carry through linked commits")
      // a rename AFTER the drop preserves the tombstone
      spark.sql("ALTER TABLE graft.se2 RENAME COLUMN v TO val")
      val live2 = Sinks.resolve(s"$root/se2")
      assert(graft.ops.ColMap.dropped(live2) == Set("w"))
      assert(graft.ops.ColMap.load(live2) == Map("val" -> "v"))
      // re-adding the dropped name rewrites fresh (null-backfilled) and
      // purges the tombstone — no footer collision possible
      spark.sql("ALTER TABLE graft.se2 ADD COLUMNS (w STRING)")
      val live3 = Sinks.resolve(s"$root/se2")
      assert(!graft.ops.ColMap.exists(live3))
      assert(spark.sql("SELECT count(w) AS n FROM graft.se2").head().getLong(0) == 0L)
      spark.sql("ALTER TABLE graft.se2 DROP COLUMN w")
      // time travel to the pre-drop version still sees all three columns
      assert(spark.sql("SELECT * FROM graft.se2 VERSION AS OF 1")
        .columns.toSeq == Seq("k", "v", "w"))
      // compaction purges tombstoned bytes for real: files speak the
      // logical schema afterwards, the marker is gone
      spark.sql("CALL graft.system.compact(table => 'se2')")
      val live4 = Sinks.resolve(s"$root/se2")
      assert(!graft.ops.ColMap.exists(live4))
      assert(spark.read.parquet(live4).columns.toSeq.sorted == Seq("k", "val"))
      spark.sql("ALTER TABLE graft.se2 DROP COLUMN val")
      val e = intercept[Exception](spark.sql("ALTER TABLE graft.se2 DROP COLUMN k"))
      assert(e.getMessage.contains("no non-partition column"))
    } finally spark.sql("DROP TABLE graft.se2")
  }

  test("ADD COLUMNS is metadata-only: hardlinked, null from old files, values from new") {
    root
    spark.sql("CREATE TABLE graft.se5 AS SELECT id AS k, id * 2 AS v FROM range(10)")
    try {
      val preKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(s"$root/se5")))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      spark.sql("ALTER TABLE graft.se5 ADD COLUMNS (tag STRING, score DOUBLE)")
      val live = Sinks.resolve(s"$root/se5")
      val postKeys = graft.io.Fs.walkParquet(Paths.get(live))
        .map(f => Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      assert(postKeys == preKeys,
        "metadata ADD COLUMNS must not rewrite any data file")
      assert(graft.ops.ColMap.added(live).map(f =>
        (f.name, f.dataType.simpleString)) == Seq("tag" -> "string", "score" -> "double"))
      // pre-ADD files serve NULL for the new columns
      assert(spark.table("graft.se5").columns.toSeq == Seq("k", "v", "tag", "score"))
      assert(spark.sql("SELECT count(tag) AS n FROM graft.se5").head().getLong(0) == 0L)
      // a post-ADD INSERT lands real values next to the nulls
      spark.sql("INSERT INTO graft.se5 VALUES (100, 200, 'x', 1.5)")
      assert(spark.sql(
        "SELECT tag, score FROM graft.se5 WHERE k = 100").collect().map(r =>
        (r.getString(0), r.getDouble(1))).toSeq == Seq(("x", 1.5)))
      assert(spark.sql("SELECT count(tag) AS n FROM graft.se5").head().getLong(0) == 1L)
      // MOR DML on the synthesized column: the update copy materializes
      // a real value where the carried files never had the column
      spark.sql("UPDATE graft.se5 SET score = 9.9 WHERE k = 3")
      assert(spark.sql("SELECT score FROM graft.se5 WHERE k = 3")
        .head().getDouble(0) == 9.9)
      assert(spark.sql("SELECT count(score) AS n FROM graft.se5")
        .head().getLong(0) == 2L)
      // the ADD records survive a later metadata rename...
      spark.sql("ALTER TABLE graft.se5 RENAME COLUMN tag TO label")
      assert(spark.sql("SELECT count(label) AS n FROM graft.se5").head().getLong(0) == 1L)
      // ...and dropping the (renamed) added column removes its record
      // while tombstoning the post-ADD bytes
      spark.sql("ALTER TABLE graft.se5 DROP COLUMN label")
      val live2 = Sinks.resolve(s"$root/se5")
      assert(graft.ops.ColMap.added(live2).map(_.name) == Seq("score"))
      assert(!spark.table("graft.se5").columns.contains("label"))
      // DESCRIBE HISTORY names the operation
      assert(Sinks.history(spark, s"$root/se5").orderBy("version")
        .select("operation").collect().map(_.getString(0))
        .contains("add-column"))
      // re-ADDing a name that collides with tombstoned bytes falls back
      // to the honest rewrite (no footer aliasing possible)
      spark.sql("ALTER TABLE graft.se5 ADD COLUMNS (tag STRING)")
      val live3 = Sinks.resolve(s"$root/se5")
      assert(spark.sql("SELECT count(tag) AS n FROM graft.se5").head().getLong(0) == 0L)
      // compaction materializes the synthesized column into real files
      spark.sql("CALL graft.system.compact(table => 'se5')")
      val live4 = Sinks.resolve(s"$root/se5")
      assert(!graft.ops.ColMap.exists(live4))
      assert(spark.read.parquet(live4).columns.contains("score"))
      assert(spark.sql("SELECT sum(v) AS s FROM graft.se5").head().getLong(0) == 290L)
    } finally spark.sql("DROP TABLE graft.se5")
  }

  test("schema evolution migrates the skipping sidecars — never stale-keyed") {
    root
    import org.apache.spark.sql.functions.col
    import graft.ops.{Bloom, Stats}
    val tr = s"$root/se3"
    val df = spark.range(1000).selectExpr(
      "id AS k", "CAST(id % 50 AS LONG) AS grp", "id * 7 AS extra")
      .repartitionByRange(4, col("k")).sortWithinPartitions("k")
    Sinks.publishVersioned(df, tr, None,
      statsCols = Seq("grp", "k"), bloomCols = Seq("k"))
    try {
      spark.sql("ALTER TABLE graft.se3 RENAME COLUMN k TO key")
      val live = Sinks.resolve(tr)
      // metadata-only rename: the sidecars keep PHYSICAL keys and every
      // probe translates through the column mapping — never stale-keyed
      assert(Stats.sidecarCols(spark, live)
        .map(graft.ops.ColMap.toLogicalName(live, _)) == Seq("grp", "key"),
        "stats sidecar must serve the renamed column through the mapping")
      assert(Bloom.sidecarCols(spark, live)
        .map(graft.ops.ColMap.toLogicalName(live, _)) == Seq("key"),
        "bloom sidecar must serve the renamed column through the mapping")
      // pruning still PRUNES on the new name (range-clustered on key)...
      val keptFiles = Stats.prunedFiles(spark, live, "key", 10L, 20L)
      val allFiles = graft.io.Fs.walkParquet(Paths.get(live))
      assert(keptFiles.size < allFiles.size,
        s"stats pruning stopped pruning after rename (${keptFiles.size}/${allFiles.size})")
      // ...and stays exact
      val got = Stats.readCurrentWhere(spark, tr, "key", 10L, 20L)
        .agg(org.apache.spark.sql.functions.sum("key")).head().getLong(0)
      assert(got == (10L to 20L).sum)
      assert(Bloom.readCurrentWhereEq(spark, tr, "key", 500L).count() == 1)
      // an append naming the LOGICAL column for stats lands physical-
      // keyed sidecar rows (the linked-commit translation), and the
      // logical-name probe keeps pruning across old + new files
      Sinks.appendVersioned(
        spark.range(2000, 2100).selectExpr(
          "id AS key", "CAST(id % 50 AS LONG) AS grp", "id * 7 AS extra"),
        tr, Sinks.currentVersion(tr), statsCols = Seq("key"))
      assert(Stats.readCurrentWhere(spark, tr, "key", 2000L, 2010L).count() == 11)
      // CALL bloom_index accepts the logical name on a mapped table
      spark.sql("CALL graft.system.bloom_index(table => 'se3', columns => 'key')")
      assert(Bloom.readCurrentWhereEq(spark, tr, "key", 2050L).count() == 1)
      // dropping an indexed column sheds it from the sidecar-column set
      // (metadata drop: the sidecar keeps PHYSICAL keys for the surviving
      // columns, and the tombstoned one leaves the served set entirely)
      spark.sql("ALTER TABLE graft.se3 DROP COLUMN grp")
      val live2 = Sinks.resolve(tr)
      assert(Stats.sidecarCols(spark, live2)
        .map(graft.ops.ColMap.toLogicalName(live2, _)) == Seq("key"))
      assert(Bloom.sidecarCols(spark, live2)
        .map(graft.ops.ColMap.toLogicalName(live2, _)) == Seq("key"))
      // and pruning on the surviving column still serves through the map
      assert(Stats.readCurrentWhere(spark, tr, "key", 2000L, 2010L).count() == 11)
    } finally spark.sql("DROP TABLE graft.se3")
  }

  test("CHECK constraints follow renames; dropping a referenced column refuses") {
    root
    spark.sql(
      """CREATE TABLE graft.se4 (a BIGINT, b STRING) USING parquet
        |TBLPROPERTIES ('check.pos' = 'a > 0')""".stripMargin)
    try {
      spark.sql("INSERT INTO graft.se4 VALUES (1, 'x')")
      spark.sql("ALTER TABLE graft.se4 RENAME COLUMN a TO amount")
      // the REWRITTEN constraint still gates writes through the new name
      val e = intercept[Exception](
        spark.sql("INSERT INTO graft.se4 VALUES (-5, 'bad')"))
      assert(e.getMessage.contains("pos"),
        s"rewritten constraint did not fire: ${e.getMessage}")
      spark.sql("INSERT INTO graft.se4 VALUES (2, 'ok')")
      assert(spark.sql("SELECT count(*) AS n FROM graft.se4").head().getLong(0) == 2L)
      // a drop that would orphan the constraint refuses, names it, and
      // succeeds once the constraint is unset
      val e2 = intercept[Exception](
        spark.sql("ALTER TABLE graft.se4 DROP COLUMN amount"))
      assert(e2.getMessage.contains("pos"))
      spark.sql("ALTER TABLE graft.se4 UNSET TBLPROPERTIES ('check.pos')")
      spark.sql("ALTER TABLE graft.se4 DROP COLUMN amount")
      assert(spark.table("graft.se4").columns.toSeq == Seq("b"))
    } finally spark.sql("DROP TABLE graft.se4")
  }

  test("ALTER COLUMN TYPE widens exactly; lossy retypes refuse") {
    root
    import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}
    spark.sql(
      """CREATE TABLE graft.se6 AS
        |SELECT CAST(id AS INT) AS k, CAST(id AS FLOAT) AS x, id AS v
        |FROM range(10)""".stripMargin)
    try {
      spark.sql("ALTER TABLE graft.se6 ALTER COLUMN k TYPE BIGINT")
      spark.sql("ALTER TABLE graft.se6 ALTER COLUMN x TYPE DOUBLE")
      val sch = spark.table("graft.se6").schema
      assert(sch("k").dataType == LongType && sch("x").dataType == DoubleType)
      assert(spark.sql("SELECT sum(k) AS s FROM graft.se6").head().getLong(0) == 45L)
      // downcasts are refused by Spark's own analysis before the catalog
      // even sees them; the long→double precision cliff passes Spark's
      // up-cast rule and is OUR refusal
      intercept[Exception](
        spark.sql("ALTER TABLE graft.se6 ALTER COLUMN v TYPE INT"))
      assert(intercept[Exception](
        spark.sql("ALTER TABLE graft.se6 ALTER COLUMN v TYPE DOUBLE"))
        .getMessage.contains("widening"))
      // pre-widening versions keep their original types
      assert(spark.sql("SELECT * FROM graft.se6 VERSION AS OF 1")
        .schema("k").dataType == IntegerType)
    } finally spark.sql("DROP TABLE graft.se6")
  }

  test("partition column rename keeps the Hive layout; partition drop refuses") {
    root
    import graft.ops.TableProps
    spark.sql(
      "CREATE TABLE graft.se5 (v BIGINT, p STRING) USING parquet PARTITIONED BY (p)")
    try {
      spark.sql("INSERT INTO graft.se5 VALUES (1, 'x'), (2, 'y')")
      spark.sql("ALTER TABLE graft.se5 RENAME COLUMN p TO part")
      assert(TableProps.partitionCols(s"$root/se5") == Seq("part"))
      val live = Sinks.resolve(s"$root/se5")
      assert(graft.io.Fs.listDir(Paths.get(live))
        .exists(_.getFileName.toString.startsWith("part=")),
        "renamed partition column must re-lay the Hive directories")
      assert(spark.sql("SELECT sum(v) AS s FROM graft.se5 WHERE part = 'x'")
        .head().getLong(0) == 1L)
      val e = intercept[Exception](spark.sql("ALTER TABLE graft.se5 DROP COLUMN part"))
      assert(e.getMessage.contains("partition column"))
      // a rename into the layout's reserved namespace would hide every
      // data file from parquet readers — refused
      intercept[Exception](
        spark.sql("ALTER TABLE graft.se5 RENAME COLUMN part TO _part"))
    } finally spark.sql("DROP TABLE graft.se5")
  }

  test("TRUNCATE TABLE: empty live version, history keeps the rows, RESTORE undoes (round-14)") {
    root
    spark.sql("CREATE TABLE graft.t_trunc AS SELECT id AS k FROM range(0, 50)")
    spark.sql("TRUNCATE TABLE graft.t_trunc")
    assert(spark.sql("SELECT count(*) FROM graft.t_trunc").collect().head.getLong(0) == 0)
    // schema survives the truncate (an INSERT lands against it)
    spark.sql("INSERT INTO graft.t_trunc SELECT id AS k FROM range(100, 110)")
    assert(spark.sql("SELECT count(*) FROM graft.t_trunc").collect().head.getLong(0) == 10)
    // pre-truncate state stays time-travelable; history names the op
    assert(spark.sql("SELECT count(*) FROM graft.t_trunc VERSION AS OF 1")
      .collect().head.getLong(0) == 50) // v0 = CTAS schema anchor, v1 = data
    val ops = spark.sql(s"SELECT operation FROM table_history('$root/t_trunc')")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("truncate"), ops.toString)
    spark.sql("CALL graft.system.restore('t_trunc', version => 1)")
    assert(spark.sql("SELECT count(*) FROM graft.t_trunc").collect().head.getLong(0) == 50)
  }

  test("MERGE WITH SCHEMA EVOLUTION: metadata-only ADD, NULL backfill, time travel below (round-16)") {
    root
    spark.sql("CREATE TABLE graft.mev (k BIGINT, v STRING) USING parquet")
    spark.sql("INSERT INTO graft.mev VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql("SELECT CAST(2 AS BIGINT) AS k, 'B' AS v, " +
      "CAST(20.5 AS DOUBLE) AS score UNION ALL " +
      "SELECT CAST(9 AS BIGINT), 'i', CAST(90.5 AS DOUBLE)")
      .createOrReplaceTempView("mev_spec_src")
    // without the clause (and without the table property) the star
    // expansion binds TARGET columns only — the merge applies but the
    // schema must NOT silently evolve (Spark's own star semantics)
    spark.sql(
      """MERGE INTO graft.mev t USING mev_spec_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    assert(spark.table("graft.mev").columns.toSeq == Seq("k", "v"),
      "a clause-less merge must not evolve the schema")
    assert(spark.sql("SELECT v FROM graft.mev WHERE k = 2").head.getString(0)
      == "B", "the clause-less merge still applies to shared columns")
    val dataBytes = graft.io.Fs.walkParquet(
      Paths.get(Sinks.resolve(s"$root/mev")))
      .map(p => p.getFileName.toString -> Files.size(p)).toMap
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO graft.mev t
        |USING mev_spec_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(
      "SELECT k, v, score FROM graft.mev ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2).toString)).toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((1L, "a"), (2L, "B"), (3L, "c"), (9L, "i")))
    assert(got(0)._3 == null && got(2)._3 == null,
      s"pre-existing unmatched rows must NULL-backfill the added column: $got")
    assert(got(1)._3 != null && got(3)._3 != null)
    // metadata-only: every pre-merge data file survives byte-identical
    // (the evolution ADDs through ColMap records; the merge's MOR route
    // carries untouched files by hardlink)
    val after = graft.io.Fs.walkParquet(
      Paths.get(Sinks.resolve(s"$root/mev")))
      .map(p => p.getFileName.toString -> Files.size(p)).toMap
    dataBytes.foreach { case (f, sz) =>
      assert(after.get(f).contains(sz),
        s"pre-merge file $f must survive the metadata-only evolution") }
    // time travel below the evolution serves the pre-merge two-column
    // schema (v0 CREATE anchor, v1 INSERT, v2 ALTER-ADD, v3 merge)
    val pre = spark.sql("SELECT * FROM graft.mev VERSION AS OF 1")
    assert(pre.columns.toSeq == Seq("k", "v"), pre.columns.toSeq.toString)
    assert(pre.count() == 3)
    // INSERT door after the evolution: the evolved schema accepts and
    // serves a three-column row
    spark.sql("INSERT INTO graft.mev VALUES (10, 'j', 100.5)")
    assert(spark.sql("SELECT score FROM graft.mev WHERE k = 10")
      .collect().head.get(0) != null)
    // the autoMerge property folds the clause in: a PLAIN merge on an
    // opted-in table evolves too
    spark.sql("CREATE TABLE graft.mev2 (k BIGINT, v STRING) USING parquet " +
      "TBLPROPERTIES ('graft.schema.autoMerge' = 'true')")
    spark.sql("INSERT INTO graft.mev2 VALUES (1, 'a')")
    spark.sql(
      """MERGE INTO graft.mev2 t USING mev_spec_src s ON t.k = s.k
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("graft.mev2").columns.toSeq == Seq("k", "v", "score"))
    assert(spark.sql("SELECT count(*) FROM graft.mev2 WHERE score IS NULL")
      .collect().head.getLong(0) == 1L, "pre-evolution row NULL-backfills")
  }
}
