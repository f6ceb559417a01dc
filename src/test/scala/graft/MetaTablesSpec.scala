package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B187 SQL metadata tables: `tbl.history` / `tbl.files` /
  * `tbl.partitions` / `tbl.tags` / `tbl.detail` resolve as ordinary
  * relations over a catalog table's operational metadata, compose with
  * SQL (filters, joins, aggregates), never shadow real tables, and
  * refuse where footer counts would lie.
  */
class MetaTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): String = {
    seq += 1
    val cat = s"gmeta$seq"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("graft_metatables").toString)
    cat
  }

  test("history: one row per retained version, operations tagged, exactly one current") {
    val cat = mkCat()
    import spark.implicits._
    (0 until 10).map(i => (i, s"v$i")).toDF("k", "v").createOrReplaceTempView("mt_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM mt_src")
    spark.sql(s"INSERT INTO $cat.t VALUES (100, 'x')")
    spark.sql(s"INSERT INTO $cat.t VALUES (101, 'y')")
    // CTAS = the v0 schema anchor + the v1 data publish; two inserts on top
    val h = spark.sql(s"SELECT version, operation, is_current FROM $cat.t.history " +
      "ORDER BY version").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(h.count(_.getBoolean(2)) == 1 && h.last.getBoolean(2))
    // SQL composes: a filtered aggregate over the metadata relation
    val appends = spark.sql(
      s"SELECT count(*) FROM $cat.t.history WHERE operation = 'append'")
      .head.getLong(0)
    assert(appends == 3, s"CTAS data write + 2 INSERTs = 3 appends, got $appends " +
      h.map(_.getString(1)).mkString("/"))
    assert(h.map(_.getString(1)).distinct.size >= 2,
      "operations must distinguish the create/publish from the inserts")
  }

  test("files + partitions: inventory sums to the table, partition rollup matches a group-by") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 3000L).map(i => (i, s"r${i % 4}")).toDF("k", "region")
      .createOrReplaceTempView("mt_part_src")
    spark.sql(s"CREATE TABLE $cat.p (k BIGINT, region STRING) USING parquet " +
      "PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $cat.p SELECT * FROM mt_part_src")
    val files = spark.sql(s"SELECT * FROM $cat.p.files").collect()
    assert(files.map(_.getAs[Long]("n_rows")).sum == 3000L)
    assert(files.forall(_.getAs[Long]("size_bytes") > 0))
    val parts = spark.sql(
      s"SELECT region, n_rows FROM $cat.p.partitions ORDER BY region").collect()
    assert(parts.map(r => r.getString(0) -> r.getLong(1)).toSeq ==
      Seq("r0" -> 750L, "r1" -> 750L, "r2" -> 750L, "r3" -> 750L))
    // per-partition file counts cover the inventory exactly
    // the zero-row schema anchor stays OUT of the partition rollup
    val nf = spark.sql(s"SELECT sum(n_files) FROM $cat.p.partitions").head.getLong(0)
    assert(nf == files.count(_.getAs[Long]("n_rows") > 0).toLong)
    // unpartitioned: one rollup row
    spark.sql(s"CREATE TABLE $cat.flat AS SELECT * FROM mt_part_src")
    val flat = spark.sql(s"SELECT * FROM $cat.flat.partitions").collect()
    assert(flat.length == 1 && flat.head.getAs[Long]("n_rows") == 3000L)
  }

  test("tags + detail: snapshot tags list, DESCRIBE DETAIL row reads as a relation") {
    val cat = mkCat()
    import spark.implicits._
    (0 until 5).map(i => (i, i * 2)).toDF("k", "v").createOrReplaceTempView("mt_tag_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM mt_tag_src")
    spark.sql(s"INSERT INTO $cat.t VALUES (9, 18)")
    spark.sql(s"CALL $cat.system.tag('t', 'baseline', version => 1)").collect()
    val tags = spark.sql(s"SELECT * FROM $cat.t.tags").collect()
    assert(tags.map(r => r.getString(0) -> r.getLong(1)).toSeq == Seq("baseline" -> 1L))
    val d = spark.sql(s"SELECT version, n_versions, n_files, tags FROM $cat.t.detail")
      .head
    assert(d.getLong(0) == 2L && d.getLong(1) == 3L && d.getLong(2) >= 1L)
    assert(d.getString(3) == "baseline=v1")
  }

  test("a REAL table named like a metadata suffix wins; unknown suffixes still fail") {
    val cat = mkCat()
    import spark.implicits._
    Seq((1, "real")).toDF("k", "v").createOrReplaceTempView("mt_shadow_src")
    spark.sql(s"CREATE NAMESPACE $cat.db")
    spark.sql(s"CREATE TABLE $cat.db.history AS SELECT * FROM mt_shadow_src")
    val got = spark.sql(s"SELECT v FROM $cat.db.history").collect()
    assert(got.map(_.getString(0)).toSeq == Seq("real"),
      "a user table named 'history' must shadow the metadata suffix")
    // and ITS metadata table still works one level down
    val h = spark.sql(s"SELECT version FROM $cat.db.history.history").collect()
    assert(h.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    intercept[Exception](spark.sql(s"SELECT * FROM $cat.db.history.nope").collect())
  }

  test("partitions refuses under deletion vectors — footer counts would over-report") {
    val cat = mkCat()
    import spark.implicits._
    (0 until 100).map(i => (i, s"r${i % 2}")).toDF("k", "region")
      .createOrReplaceTempView("mt_dv_src")
    spark.sql(s"CREATE TABLE $cat.d (k INT, region STRING) USING parquet " +
      "PARTITIONED BY (region) TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM mt_dv_src")
    spark.sql(s"DELETE FROM $cat.d WHERE k < 10")
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.d.partitions").collect())
    assert(e.getMessage.contains("compact"), e.getMessage)
    // history and tags stay serveable (they describe versions, not rows)
    assert(spark.sql(s"SELECT * FROM $cat.d.history").count() == 3L)
  }
}
