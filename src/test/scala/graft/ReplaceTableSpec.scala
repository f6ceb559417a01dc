package graft

import java.nio.file.Files

import graft.ops.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Atomic CREATE [OR REPLACE] TABLE … AS SELECT / REPLACE TABLE
  * (round-16, B203): the catalog implements StagingTableCatalog, so
  * Spark routes CTAS/RTAS through the staged doors — CTAS keeps the
  * createTable ordering (and a failed data write leaves NO table),
  * while REPLACE is a HISTORY-PRESERVING versioned commit: the new
  * definition's props swap in and the new contents land as the NEXT
  * version; VERSION AS OF below the replace serves the old schema,
  * data and layout (the Delta CREATE OR REPLACE semantic, not the
  * non-staging drop+create that destroys history).
  */
class ReplaceTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): (String, String) = {
    seq += 1
    val cat = s"grpl$seq"
    val root = Files.createTempDirectory("graft_replace").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("CREATE OR REPLACE AS SELECT: history preserved, props replaced, layout applies") {
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 40L).map(i => (i, s"n$i")).toDF("k", "nm")
      .createOrReplaceTempView("rpl_src")
    spark.sql(s"CREATE TABLE $cat.t TBLPROPERTIES ('check.pos' = 'k >= 0') " +
      "AS SELECT * FROM rpl_src")
    assert(Sinks.listVersions(s"$root/t") == Seq(0L, 1L),
      "CTAS through the staged door keeps the empty-v0 + data-v1 ordering")
    Sinks.tagVersion(s"$root/t", "before", 1L)
    // replace with a DIFFERENT schema and a declared partitioning
    spark.sql(s"CREATE OR REPLACE TABLE $cat.t USING parquet " +
      "PARTITIONED BY (g) AS " +
      "SELECT k * 10 AS v, CAST(k % 3 AS STRING) AS g FROM rpl_src")
    // the replace is ONE new version on top of the old history
    assert(Sinks.listVersions(s"$root/t") == Seq(0L, 1L, 2L))
    assert(spark.table(s"$cat.t").columns.toSeq == Seq("v", "g"))
    assert(spark.table(s"$cat.t").count() == 40)
    // the new layout is real: directory grid + declared partitioning
    assert(graft.io.Fs.listDir(
      java.nio.file.Paths.get(Sinks.versionPath(s"$root/t", 2L)))
      .exists(_.getFileName.toString.startsWith("g=")))
    assert(graft.ops.TableProps.partitionCols(s"$root/t") == Seq("g"))
    // the OLD check constraint is gone with the old definition
    assert(!graft.ops.TableProps.load(s"$root/t").keys.exists(_.startsWith("check.")))
    // history below the replace serves the OLD schema and data — by
    // version number and by the surviving tag
    val old = spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1")
    assert(old.columns.toSeq == Seq("k", "nm") && old.count() == 40)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 'before'").count() == 40)
    // partition pruning fires on the new layout
    val plan = spark.table(s"$cat.t").filter($"g" === "1")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"), plan.take(2000))
  }

  test("REPLACE TABLE without AS: empty redefinition; missing table refuses") {
    val (cat, root) = mkCat()
    import spark.implicits._
    val e = intercept[Exception](
      spark.sql(s"REPLACE TABLE $cat.none (k BIGINT) USING parquet"))
    assert(e.getMessage.toLowerCase.contains("table"), e.getMessage)
    assert(Sinks.currentVersion(s"$root/none").isEmpty,
      "a refused REPLACE must create nothing")
    Seq((1L, "a")).toDF("k", "nm").createOrReplaceTempView("rpl2_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM rpl2_src")
    spark.sql(s"REPLACE TABLE $cat.t (x DOUBLE, y STRING) USING parquet")
    assert(spark.table(s"$cat.t").columns.toSeq == Seq("x", "y"))
    assert(spark.table(s"$cat.t").count() == 0)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").count() == 1,
      "the pre-replace contents stay travelable")
    // the replaced (empty) definition accepts writes under its schema
    spark.sql(s"INSERT INTO $cat.t VALUES (1.5, 'z')")
    assert(spark.table(s"$cat.t").count() == 1)
  }

  test("atomicity: a failing RTAS write rolls the definition back; failed CTAS leaves no table") {
    val (cat, root) = mkCat()
    import spark.implicits._
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // CTAS whose declared CHECK the data violates: no table survives
    (0L until 10L).map(i => (i, i * 2)).toDF("k", "w")
      .createOrReplaceTempView("rpl3_src")
    val e = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad TBLPROPERTIES ('check.small' = 'k < 5') " +
        "AS SELECT * FROM rpl3_src"))
    assert(msgs(e).exists(_.contains("expectation failed")), msgs(e).mkString(" | "))
    assert(Sinks.currentVersion(s"$root/bad").isEmpty,
      "a failed atomic CTAS must leave NO half-created table")
    // RTAS whose new CHECK the query violates: the OLD definition and
    // contents stay live, props rolled back
    spark.sql(s"CREATE TABLE $cat.t AS SELECT k FROM rpl3_src WHERE k < 3")
    val e2 = intercept[Exception](spark.sql(
      s"CREATE OR REPLACE TABLE $cat.t TBLPROPERTIES ('check.tiny' = 'k < 2') " +
        "AS SELECT k FROM rpl3_src"))
    assert(msgs(e2).exists(_.contains("expectation failed")), msgs(e2).mkString(" | "))
    assert(spark.table(s"$cat.t").count() == 3,
      "a failed replace must leave the old contents live")
    assert(!graft.ops.TableProps.load(s"$root/t").contains("check.tiny"),
      "a failed replace must roll its props back")
    // and the table still accepts writes under the OLD definition
    spark.sql(s"INSERT INTO $cat.t VALUES (7)")
    assert(spark.table(s"$cat.t").count() == 4)
  }

  test("DataFrameWriterV2: writeTo create / append / createOrReplace ride the same doors") {
    val (cat, _) = mkCat()
    import spark.implicits._
    (0L until 10L).map(i => (i, s"n$i")).toDF("k", "nm")
      .writeTo(s"$cat.t").create()
    assert(spark.table(s"$cat.t").count() == 10)
    (10L until 13L).map(i => (i, s"n$i")).toDF("k", "nm")
      .writeTo(s"$cat.t").append()
    assert(spark.table(s"$cat.t").count() == 13)
    // createOrReplace = the staged history-preserving replace
    (0L until 4L).map(i => (i * 2, s"r$i")).toDF("v", "w")
      .writeTo(s"$cat.t").createOrReplace()
    assert(spark.table(s"$cat.t").columns.toSeq == Seq("v", "w"))
    assert(spark.table(s"$cat.t").count() == 4)
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2").count() == 13,
      "the pre-replace epoch stays travelable under writeTo too")
  }

  test("IF NOT EXISTS CTAS stays a no-op on an existing table") {
    val (cat, _) = mkCat()
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "nm").createOrReplaceTempView("rpl4_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM rpl4_src")
    spark.sql(s"CREATE TABLE IF NOT EXISTS $cat.t AS " +
      "SELECT k * 100 AS k, nm FROM rpl4_src")
    assert(spark.table(s"$cat.t").select(sum($"k")).head.getLong(0) == 1L)
  }
}
