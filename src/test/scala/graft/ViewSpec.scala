package graft

import java.nio.file.Files

import org.apache.spark.sql.connector.catalog.{Identifier, ViewChange}
import org.scalatest.funsuite.AnyFunSuite

/** Persistent views over GraftCatalog (B178): CREATE/REPLACE/DROP/ALTER
  * VIEW + SHOW VIEWS through the parser seam, read inlining through the
  * resolution rule, the DSv2 ViewCatalog surface, and the semantics
  * pins — creation-context qualification, temp shadowing/refusal,
  * schema pinning vs evolution, cycle refusal, read-only enforcement,
  * and pushdown THROUGH a view into the scan.
  */
class ViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private val cat = "graftvw"

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_views").toString
    graft.ops.Sinks.publishVersioned(
      graft.io.Tables.region(spark, sf001), s"$dir/base", None)
    graft.ops.Sinks.publishVersioned(
      graft.io.Tables.nation(spark, sf001), s"$dir/ns/nat", None)
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", dir)
    dir
  }

  private def inCatalog[T](body: => T): T = {
    spark.sql(s"USE $cat")
    try body finally spark.sql("USE spark_catalog")
  }

  test("CREATE VIEW + SELECT: inlined body, alias-qualified columns") {
    root
    spark.sql(s"""CREATE VIEW $cat.view1 AS
      SELECT r_regionkey, upper(r_name) AS nm FROM $cat.base WHERE r_regionkey < 3""")
    val got = spark.sql(s"SELECT * FROM $cat.view1 ORDER BY r_regionkey")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    val want = spark.sql(
      s"""SELECT r_regionkey, upper(r_name) AS nm FROM $cat.base
         WHERE r_regionkey < 3 ORDER BY r_regionkey""")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getString(1)))
    assert(got.sameElements(want) && got.length == 3)
    // the view alias qualifies its columns
    assert(spark.sql(s"SELECT view1.nm FROM $cat.view1 WHERE view1.r_regionkey = 1")
      .collect().length == 1)
  }

  test("creation context pins unqualified references across USE changes") {
    root
    inCatalog {
      // current catalog is the graft catalog: 'base' is unqualified
      spark.sql("CREATE VIEW vctx AS SELECT count(*) AS n FROM base")
    }
    // read from a session whose current catalog is spark_catalog — the
    // stored context must resolve 'base', not the reader's namespace
    assert(spark.sql(s"SELECT n FROM $cat.vctx").collect().head.getLong(0) == 5)
  }

  test("nested views expand recursively; aggregates through views are exact") {
    root
    spark.sql(s"""CREATE VIEW $cat.vn1 AS
      SELECT n_regionkey, count(*) AS cnt FROM $cat.ns.nat GROUP BY n_regionkey""")
    spark.sql(s"CREATE VIEW $cat.vn2 AS SELECT sum(cnt) AS total FROM $cat.vn1")
    assert(spark.sql(s"SELECT total FROM $cat.vn2").collect().head.getLong(0) ==
      graft.io.Tables.nation(spark, sf001).count())
  }

  test("CTEs inside a view body resolve (and are never qualified)") {
    root
    spark.sql(s"""CREATE VIEW $cat.vcte AS
      WITH big AS (SELECT * FROM $cat.base WHERE r_regionkey >= 2)
      SELECT count(*) AS n FROM big""")
    assert(spark.sql(s"SELECT n FROM $cat.vcte").collect().head.getLong(0) == 3)
  }

  test("schema pinned at creation: ADD COLUMNS invisible, dropped column loud") {
    root
    spark.sql(s"CREATE TABLE $cat.t_evo AS SELECT r_regionkey AS k, r_name AS nm FROM $cat.base")
    spark.sql(s"CREATE VIEW $cat.v_evo AS SELECT * FROM $cat.t_evo")
    spark.sql(s"ALTER TABLE $cat.t_evo ADD COLUMNS (extra INT)")
    // SELECT * view keeps its creation shape
    assert(spark.sql(s"SELECT * FROM $cat.v_evo").columns.toSeq == Seq("k", "nm"))
    // WITH SCHEMA EVOLUTION opts out: the new column appears
    spark.sql(s"CREATE VIEW $cat.v_drift WITH SCHEMA EVOLUTION AS SELECT * FROM $cat.t_evo")
    assert(spark.sql(s"SELECT * FROM $cat.v_drift").columns.toSeq == Seq("k", "nm", "extra"))
    // dropping a pinned column fails the pinned view loudly
    spark.sql(s"ALTER TABLE $cat.t_evo DROP COLUMN nm")
    val e = intercept[Exception](spark.sql(s"SELECT * FROM $cat.v_evo").collect())
    assert(e.getMessage.contains("no longer exists"), e.getMessage)
  }

  test("temp views shadow catalog views on read; temp refs refused at CREATE") {
    root
    spark.sql(s"CREATE VIEW $cat.vshadow AS SELECT count(*) AS n FROM $cat.base")
    spark.range(1).selectExpr("CAST(42 AS BIGINT) AS n").createOrReplaceTempView("vshadow")
    try inCatalog {
      // single-part name: the temp view wins, exactly like tables
      assert(spark.sql("SELECT n FROM vshadow").collect().head.getLong(0) == 42)
      // qualified name still reaches the catalog view
      assert(spark.sql(s"SELECT n FROM $cat.vshadow").collect().head.getLong(0) == 5)
      // CREATE VIEW over a temp reference is refused
      val e = intercept[Exception](
        spark.sql("CREATE VIEW vbad AS SELECT * FROM vshadow"))
      assert(e.getMessage.contains("temporary view"), e.getMessage)
    } finally spark.catalog.dropTempView("vshadow")
  }

  test("recursive definitions are refused at CREATE (direct and via ALTER)") {
    root
    spark.sql(s"CREATE VIEW $cat.v_a AS SELECT * FROM $cat.base")
    spark.sql(s"CREATE VIEW $cat.v_b AS SELECT * FROM $cat.v_a")
    val e = intercept[Exception](
      spark.sql(s"CREATE OR REPLACE VIEW $cat.v_a AS SELECT * FROM $cat.v_b"))
    assert(e.getMessage.contains("recursive view"), e.getMessage)
    val e2 = intercept[Exception](
      spark.sql(s"ALTER VIEW $cat.v_a AS SELECT r_regionkey FROM $cat.v_b"))
    assert(e2.getMessage.contains("recursive view"), e2.getMessage)
    // and the original definition still reads
    assert(spark.sql(s"SELECT * FROM $cat.v_b").count() == 5)
  }

  test("views are read-only: INSERT/UPDATE/DELETE/MERGE refused") {
    root
    spark.sql(s"CREATE VIEW $cat.v_ro AS SELECT * FROM $cat.base")
    def refused(sql: String): Unit = {
      val e = intercept[Exception](spark.sql(sql))
      assert(e.getMessage.contains("read-only"), s"$sql => ${e.getMessage}")
    }
    refused(s"INSERT INTO $cat.v_ro VALUES (9, 'x', 'y')")
    refused(s"UPDATE $cat.v_ro SET r_name = 'x' WHERE r_regionkey = 1")
    refused(s"DELETE FROM $cat.v_ro WHERE r_regionkey = 1")
    refused(s"MERGE INTO $cat.v_ro t USING $cat.base s ON t.r_regionkey = s.r_regionkey " +
      "WHEN MATCHED THEN DELETE")
  }

  test("DROP VIEW, IF EXISTS, and the table/view guards") {
    root
    spark.sql(s"CREATE VIEW $cat.v_drop AS SELECT * FROM $cat.base")
    assert(spark.sql(s"SELECT * FROM $cat.v_drop").count() == 5)
    spark.sql(s"DROP VIEW $cat.v_drop")
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.v_drop").collect())
    // IF EXISTS: silent; without: loud
    spark.sql(s"DROP VIEW IF EXISTS $cat.v_drop")
    intercept[Exception](spark.sql(s"DROP VIEW $cat.v_drop"))
    // DROP VIEW on a table refused with direction
    val e = intercept[Exception](spark.sql(s"DROP VIEW $cat.base"))
    assert(e.getMessage.contains("DROP TABLE"), e.getMessage)
    // CREATE TABLE over a view refused
    spark.sql(s"CREATE VIEW $cat.v_block AS SELECT * FROM $cat.base")
    val e2 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.v_block AS SELECT * FROM $cat.base"))
    assert(e2.getMessage.contains("VIEW"), e2.getMessage)
    // CREATE VIEW over a table refused
    val e3 = intercept[Exception](
      spark.sql(s"CREATE VIEW $cat.base AS SELECT 1 AS one"))
    assert(e3.getMessage.contains("is a table"), e3.getMessage)
  }

  test("CREATE OR REPLACE swaps the definition; IF NOT EXISTS is a no-op") {
    root
    spark.sql(s"CREATE VIEW $cat.v_rep AS SELECT 1 AS x")
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v_rep AS SELECT 2 AS x")
    assert(spark.sql(s"SELECT x FROM $cat.v_rep").collect().head.getInt(0) == 2)
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.v_rep AS SELECT 3 AS x")
    assert(spark.sql(s"SELECT x FROM $cat.v_rep").collect().head.getInt(0) == 2)
    intercept[Exception](spark.sql(s"CREATE VIEW $cat.v_rep AS SELECT 4 AS x"))
  }

  test("user column list renames; duplicate output names refused") {
    root
    spark.sql(s"""CREATE VIEW $cat.v_cols (key COMMENT 'the key', name) AS
      SELECT r_regionkey, r_name FROM $cat.base""")
    assert(spark.sql(s"SELECT * FROM $cat.v_cols").columns.toSeq == Seq("key", "name"))
    val e = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.v_dup AS SELECT r_regionkey, r_regionkey FROM $cat.base"))
    assert(e.getMessage.contains("duplicate output column"), e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE VIEW $cat.v_ar (a, b, c) AS SELECT r_regionkey FROM $cat.base"))
    assert(e2.getMessage.contains("declares 3 columns"), e2.getMessage)
  }

  test("SHOW VIEWS lists catalog views (pattern-filtered) + temp views") {
    root
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.view1 AS SELECT 1 AS one")
    val rows = spark.sql(s"SHOW VIEWS IN $cat").collect()
    assert(rows.exists(r => r.getString(1) == "view1" && !r.getBoolean(2)))
    val pat = spark.sql(s"SHOW VIEWS IN $cat LIKE 'v_re*'").collect()
    assert(pat.forall(r => r.getString(1).startsWith("v_re") || r.getBoolean(2)))
    // SHOW TABLES must NOT list views
    val tables = spark.sql(s"SHOW TABLES IN $cat").collect().map(_.getString(1))
    assert(tables.contains("base") && !tables.contains("view1"))
  }

  test("filters push THROUGH a view into the parquet scan") {
    root
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.v_push AS SELECT * FROM $cat.base")
    val df = spark.sql(s"SELECT r_name FROM $cat.v_push WHERE r_regionkey = 2")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("EqualTo(r_regionkey,2)"), physical)
    assert(df.collect().length == 1)
  }

  test("the DSv2 ViewCatalog surface: load/exists/alter/rename/drop/list") {
    root
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v_api AS SELECT r_regionkey FROM $cat.base")
    val g = org.apache.spark.sql.GraftSqlShims.catalogByName(spark, cat)
      .asInstanceOf[graft.catalog.GraftCatalog]
    val id = Identifier.of(Array.empty, "v_api")
    assert(g.viewExists(id))
    val v = g.loadView(id)
    assert(v.query().contains("SELECT r_regionkey") &&
      v.schema().fieldNames.sameElements(Array("r_regionkey")) &&
      v.currentCatalog() == "spark_catalog")
    g.alterView(id, ViewChange.setProperty("team", "data"))
    assert(g.loadView(id).properties().get("team") == "data")
    g.renameView(id, Identifier.of(Array.empty, "v_api2"))
    assert(!g.viewExists(id) &&
      spark.sql(s"SELECT * FROM $cat.v_api2").count() == 5)
    assert(g.listViews().map(_.name()).contains("v_api2"))
    assert(g.dropView(Identifier.of(Array.empty, "v_api2")))
    assert(!g.dropView(Identifier.of(Array.empty, "v_api2")))
  }

  test("views in namespaces; namespace listing unaffected") {
    root
    spark.sql(s"CREATE VIEW $cat.ns.v_in_ns AS SELECT count(*) AS n FROM $cat.ns.nat")
    assert(spark.sql(s"SELECT n FROM $cat.ns.v_in_ns").collect().head.getLong(0) == 25)
    val nss = spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0))
    assert(nss.contains("ns"))
    // a view directory is not a namespace
    assert(!nss.contains("view1"))
  }

  test("DESCRIBE and SHOW CREATE TABLE serve views") {
    root
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v_desc (key COMMENT 'pk', nm) AS " +
      s"SELECT r_regionkey, r_name FROM $cat.base")
    val d = spark.sql(s"DESCRIBE $cat.v_desc").collect()
    assert(d.map(_.getString(0)).toSeq == Seq("key", "nm"))
    assert(d.head.getString(2) == "pk")
    val ext = spark.sql(s"DESCRIBE EXTENDED $cat.v_desc").collect()
      .map(_.getString(0))
    assert(ext.contains("View Text") && ext.contains("View Catalog and Namespace"))
    val ddl = spark.sql(s"SHOW CREATE TABLE $cat.v_desc").collect().head.getString(0)
    assert(ddl.startsWith(s"CREATE VIEW $cat.v_desc") &&
      ddl.contains("COMMENT 'pk'") && ddl.contains("SELECT r_regionkey"), ddl)
    // DESCRIBE of a TABLE still reaches the native v2 path
    assert(spark.sql(s"DESCRIBE $cat.base").collect()
      .exists(_.getString(0) == "r_name"))
  }

  test("ALTER VIEW SET/UNSET TBLPROPERTIES and RENAME TO") {
    root
    spark.sql(s"CREATE OR REPLACE VIEW $cat.v_props AS SELECT 1 AS one")
    spark.sql(s"ALTER VIEW $cat.v_props SET TBLPROPERTIES ('team' = 'data', 'tier' = 'gold')")
    val g = org.apache.spark.sql.GraftSqlShims.catalogByName(spark, cat)
      .asInstanceOf[graft.catalog.GraftCatalog]
    def props = g.loadView(Identifier.of(Array.empty, "v_props")).properties()
    assert(props.get("team") == "data" && props.get("tier") == "gold")
    spark.sql(s"ALTER VIEW $cat.v_props UNSET TBLPROPERTIES ('tier')")
    assert(props.get("team") == "data" && props.get("tier") == null)
    spark.sql(s"ALTER VIEW $cat.v_props RENAME TO v_props2")
    assert(spark.sql(s"SELECT one FROM $cat.v_props2").collect().head.getInt(0) == 1)
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.v_props").collect())
    spark.sql(s"DROP VIEW $cat.v_props2")
  }

  test("streaming read of a view is refused with direction") {
    root
    spark.sql(s"CREATE VIEW IF NOT EXISTS $cat.v_s AS SELECT * FROM $cat.base")
    val e = intercept[Exception] {
      spark.readStream.table(s"$cat.v_s").writeStream
        .format("noop").start().awaitTermination(2000)
    }
    assert(e.getMessage.contains("stream"), e.getMessage)
  }

  test("views pin VERSION AS OF: the frozen-audit-view pattern") {
    root
    // base table gets a second version; the view pins the FIRST
    graft.ops.Sinks.publishVersioned(
      graft.io.Tables.region(spark, sf001).limit(2), s"$root/base2", None)
    graft.ops.Sinks.publishVersioned(
      graft.io.Tables.region(spark, sf001), s"$root/base2", Some(0L))
    spark.sql(s"CREATE VIEW $cat.v_frozen AS " +
      s"SELECT count(*) AS n FROM $cat.base2 VERSION AS OF 0")
    assert(spark.sql(s"SELECT n FROM $cat.v_frozen").collect().head.getLong(0) == 2)
    // the live table moved on; the view still reads the pinned snapshot
    assert(spark.sql(s"SELECT count(*) FROM $cat.base2").collect().head.getLong(0) == 5)
    assert(spark.sql(s"SELECT n FROM $cat.v_frozen").collect().head.getLong(0) == 2)
  }
}
