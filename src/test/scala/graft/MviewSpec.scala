package graft

import graft.ops.{Mview, Sinks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental materialized view (B111): refresh-by-change-feed must equal
  * the full recompute after any mix of inserts/updates/deletes, survive
  * bookkeeping loss by falling back to a recompute, and keep null groups
  * intact.
  */
class MviewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("mview").toString

  private def rows(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong,
      if (i % 5 == 0) null else s"g${i % 3}", (i * 10).toLong)).toDF("id", "grp", "v")
  }

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("incremental refresh over inserts/updates/deletes equals the full recompute") {
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    Sinks.publishVersioned(rows(100), src, None)
    Mview.create(spark, src, mv, dims = Seq("grp"), sumCols = Seq("v"))
    // v1: delete ids%7==0, update v for ids%4==0, insert 20 new rows
    import spark.implicits._
    val v1 = rows(100).filter(col("id") % 7 =!= 0)
      .withColumn("v", when(col("id") % 4 === 0, col("v") * 3).otherwise(col("v")))
      .unionByName((201 to 220).map(i => (i.toLong, s"g${i % 3}", 7L)).toDF("id", "grp", "v"))
    Sinks.publishVersioned(v1, src, Some(0L))
    val mvV = Mview.refresh(spark, src, mv, srcKeys = Seq("id"),
      dims = Seq("grp"), sumCols = Seq("v"))
    assert(mvV == 1L)
    val want = Mview.full(Sinks.readCurrent(spark, src), Seq("grp"), Seq("v"))
    assert(same(Mview.readCurrent(spark, mv), want),
      "incremental refresh diverged from full recompute")
    // null group survives and is correct
    val nullGrp = Mview.readCurrent(spark, mv).filter(col("grp").isNull)
    assert(nullGrp.count() == 1)
  }

  test("a group whose rows all vanish drops out; one whose dims move transfers") {
    import spark.implicits._
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    val v0 = Seq((1L, "a", 5L), (2L, "a", 6L), (3L, "b", 7L)).toDF("id", "grp", "v")
    Sinks.publishVersioned(v0, src, None)
    Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
    // b's only row moves to group a; a's id=1 row is deleted
    val v1 = Seq((2L, "a", 6L), (3L, "a", 7L)).toDF("id", "grp", "v")
    Sinks.publishVersioned(v1, src, Some(0L))
    Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    val got = Mview.readCurrent(spark, mv).collect()
    assert(got.length == 1)
    assert(got.head.getString(0) == "a" && got.head.getLong(1) == 2 &&
      got.head.getLong(2) == 13)
  }

  test("refresh is a no-op when already current; repeated refresh stays stable") {
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    Sinks.publishVersioned(rows(50), src, None)
    val v0 = Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
    assert(Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v")) == v0)
    assert(Sinks.currentVersion(mv).contains(v0), "no-op refresh published a version")
  }

  test("lost or stale bookkeeping falls back to a full recompute, never a wrong answer") {
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    Sinks.publishVersioned(rows(60), src, None)
    Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
    import spark.implicits._
    Sinks.publishVersioned(rows(60).filter(col("id") <= 30), src, Some(0L))
    // simulate the crash window: marker deleted after a publish
    java.nio.file.Files.delete(java.nio.file.Paths.get(mv, "_MV_BASE"))
    val v = Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    assert(v == 1L)
    val want = Mview.full(Sinks.readCurrent(spark, src), Seq("grp"), Seq("v"))
    assert(same(Mview.readCurrent(spark, mv), want))
    assert(Mview.syncedVersions(mv).contains((1L, 1L)), "marker not restored")
  }

  test("an all-null sum group stays NULL through refresh, exactly like the recompute") {
    import spark.implicits._
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    // group 'n' holds only null values; group 'a' has one non-null row
    val v0 = Seq((1L, "n", Option.empty[Long]), (2L, "n", Option.empty[Long]),
      (3L, "a", Some(7L))).toDF("id", "grp", "v")
    Sinks.publishVersioned(v0, src, None)
    Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
    // v1: touch only group 'a'; 'n' must remain (n_rows=2, sum_v=NULL)
    Sinks.publishVersioned(
      v0.unionByName(Seq((4L, "a", Some(1L))).toDF("id", "grp", "v")), src, Some(0L))
    Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    val want = Mview.full(Sinks.readCurrent(spark, src), Seq("grp"), Seq("v"))
    assert(same(Mview.readCurrent(spark, mv), want),
      "refresh rewrote a NULL sum to 0 (or vice versa)")
    val n = Mview.readCurrent(spark, mv).filter(col("grp") === "n").collect().head
    assert(n.getAs[Long]("n_rows") == 2 && n.isNullAt(n.fieldIndex("sum_v")))
    // and deleting the only non-null row of a group nulls its sum again
    Sinks.publishVersioned(
      Sinks.readCurrent(spark, src).filter(col("id") =!= 3 && col("id") =!= 4)
        .unionByName(Seq((5L, "a", Option.empty[Long])).toDF("id", "grp", "v")),
      src, Some(1L))
    Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    val a = Mview.readCurrent(spark, mv).filter(col("grp") === "a").collect().head
    assert(a.getAs[Long]("n_rows") == 1 && a.isNullAt(a.fieldIndex("sum_v")),
      "sum must return to NULL when the last non-null contributor is deleted")
  }

  test("multi-step: two source versions elapse between refreshes — ONE feed catches up") {
    val root = tmp()
    val (src, mv) = (s"$root/src", s"$root/mv")
    Sinks.publishVersioned(rows(40), src, None)
    Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
    import spark.implicits._
    Sinks.publishVersioned(rows(40).withColumn("v", col("v") + 1), src, Some(0L))
    Sinks.publishVersioned(
      rows(40).withColumn("v", col("v") + 1).filter(col("id") > 10), src, Some(1L))
    val v = Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    // one incremental publish, not one per elapsed source version
    assert(v == 1L, s"expected a single catch-up publish, got mv v$v")
    val want = Mview.full(Sinks.readCurrent(spark, src), Seq("grp"), Seq("v"))
    assert(same(Mview.readCurrent(spark, mv), want))
  }

  test("CALL mview_create / mview_refresh: stored definition drives O(delta) refresh (round-14)") {
    val root = java.nio.file.Files.createTempDirectory("graft_mvcall").toString
    val cat = "graftmvc"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.sales AS " +
      "SELECT id AS sale_id, id % 5 AS region, id * 10 AS amount FROM range(0, 200)")
    val r = spark.sql(s"CALL $cat.system.mview_create('sales', 'sales_by_region', " +
      "dims => 'region', sum_cols => 'amount', keys => 'sale_id')").collect().head
    assert(r.getString(0) == "sales_by_region")
    // the MV is a normal catalog table
    assert(spark.sql(s"SELECT count(*) FROM $cat.sales_by_region")
      .collect().head.getLong(0) == 5)
    // change the source: insert + delete, then refresh by TARGET NAME ONLY
    spark.sql(s"INSERT INTO $cat.sales " +
      "SELECT id AS sale_id, id % 5 AS region, id * 10 AS amount FROM range(200, 260)")
    spark.sql(s"DELETE FROM $cat.sales WHERE sale_id < 20")
    spark.sql(s"CALL $cat.system.mview_refresh('sales_by_region')")
    val got = spark.sql(
      s"SELECT region, n_rows, sum_amount FROM $cat.sales_by_region ORDER BY region")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val want = spark.sql(
      s"""SELECT region, count(*) AS n, sum(amount) AS s FROM $cat.sales
         |GROUP BY region ORDER BY region""".stripMargin)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(got == want, s"$got vs $want")
    // refresh on a table without a stored definition fails with direction
    val e = intercept[Exception](
      spark.sql(s"CALL $cat.system.mview_refresh('sales')"))
    assert(e.getMessage.contains("mview_create"), e.getMessage)
  }
}
