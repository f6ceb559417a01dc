package graft

import java.nio.file.{Files, Paths}

import graft.ops.{ColMap, Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B162 metadata-only ALTER COLUMN TYPE widening: the marker records
  * PHYSICAL name → wide type, every data file hardlinks, readers pin
  * the wide type (the parquet reader upcasts narrow footers per file),
  * writers land wide files from the next commit, compaction
  * materializes. byte→short→int→long and float→double only — the
  * widenings that preserve every stored value exactly.
  */
class WidenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_widen").toString
    spark.conf.set("spark.sql.catalog.graftw", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftw.root", dir)
    dir
  }

  private def fileKeys(dir: java.nio.file.Path): Map[String, Any] =
    graft.io.Fs.walkParquet(dir).map { f =>
      f.getFileName.toString -> java.nio.file.Files.readAttributes(
        f, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    }.toMap

  test("int->long widen: zero data movement, mixed footers read wide, big inserts land") {
    import spark.implicits._
    val _ = root // force the catalog registration before any SQL
    spark.sql("CREATE TABLE graftw.w1 (k INT, v INT, s STRING) USING parquet")
    spark.sql("INSERT INTO graftw.w1 VALUES (1, 10, 'a'), (2, 20, 'b')")
    val before = fileKeys(Paths.get(Sinks.resolve(s"$root/w1")))
    spark.sql("ALTER TABLE graftw.w1 ALTER COLUMN v TYPE BIGINT")
    // zero movement: every pre-widen file is the same inode
    val after = fileKeys(Paths.get(Sinks.resolve(s"$root/w1")))
    assert(before.forall { case (n, key) => after.get(n).contains(key) },
      "widen must hardlink, not rewrite")
    // schema is wide; a value beyond int range inserts fine
    assert(spark.table("graftw.w1").schema("v").dataType.typeName == "long")
    spark.sql("INSERT INTO graftw.w1 VALUES (3, 9999999999, 'c')")
    val got = spark.sql("SELECT v FROM graftw.w1 ORDER BY k")
      .as[Long].collect().toSeq
    assert(got == Seq(10L, 20L, 9999999999L))
    // aggregation across narrow and wide files
    assert(spark.sql("SELECT sum(v) FROM graftw.w1").collect()
      .head.getLong(0) == 10000000029L)
  }

  test("float->double and chained byte->short->long widen through the Scala funnel") {
    import spark.implicits._
    val tbl = s"$root/w2"
    val df = Seq((1.toByte, 1.5f), (2.toByte, 2.5f)).toDF("b", "f")
    Sinks.publishVersioned(df, tbl, None)
    Sinks.publishTypeWidening(spark, tbl, 0L,
      Map("b" -> org.apache.spark.sql.types.ShortType,
        "f" -> org.apache.spark.sql.types.DoubleType))
    val v1 = Sinks.readCurrent(spark, tbl)
    assert(v1.schema("b").dataType.typeName == "short")
    assert(v1.schema("f").dataType.typeName == "double")
    assert(v1.orderBy("b").as[(Short, Double)].collect().toSeq ==
      Seq((1.toShort, 1.5), (2.toShort, 2.5)))
    // chain: short -> long replaces the entry (validated from the
    // EFFECTIVE current type by the ALTER door; the funnel trusts)
    Sinks.publishTypeWidening(spark, tbl, 1L,
      Map("b" -> org.apache.spark.sql.types.LongType))
    assert(Sinks.readCurrent(spark, tbl).schema("b").dataType.typeName == "long")
    // time travel reads each version under ITS declared width
    assert(Sinks.readVersion(spark, tbl, 0).schema("b").dataType.typeName == "byte")
    assert(Sinks.readVersion(spark, tbl, 1).schema("b").dataType.typeName == "short")
  }

  test("widen survives RENAME and rides MOR DML; DELETE works across footer widths") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftw.w3 (k INT, v INT) USING parquet")
    spark.sql("INSERT INTO graftw.w3 VALUES (1, 10), (2, 20), (3, 30)")
    spark.sql("ALTER TABLE graftw.w3 ALTER COLUMN v TYPE BIGINT")
    spark.sql("ALTER TABLE graftw.w3 RENAME COLUMN v TO val")
    assert(spark.table("graftw.w3").schema("val").dataType.typeName == "long",
      "a RENAME must not re-narrow a widened column")
    spark.sql("INSERT INTO graftw.w3 VALUES (4, 8888888888)")
    spark.sql("DELETE FROM graftw.w3 WHERE val = 20")
    assert(spark.sql("SELECT val FROM graftw.w3 ORDER BY k")
      .as[Long].collect().toSeq == Seq(10L, 30L, 8888888888L))
  }

  test("widened partition column re-pins the spec; pruning keeps firing") {
    import spark.implicits._
    val tbl = s"$root/w4"
    val df = spark.range(0, 40).select(($"id" % 4).cast("int").as("p"), $"id".as("k"))
      .select("k", "p")
    Sinks.publishVersioned(df, tbl, None)
    Sinks.repartitionTable(spark, tbl, Seq("p"))
    Sinks.publishTypeWidening(spark, tbl,
      Sinks.currentVersion(tbl).get,
      Map("p" -> org.apache.spark.sql.types.LongType))
    assert(TableProps.partitionSchema(tbl).get("p").dataType.typeName == "long")
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.schema("p").dataType.typeName == "long")
    assert(cur.filter($"p" === 2L).count() == 10)
    val q = spark.sql("SELECT count(*) FROM graftw.w4 WHERE p = 2")
    assert(q.collect().head.getLong(0) == 10)
  }

  test("stats skipping stays exact across the widen (long-domain bounds)") {
    import spark.implicits._
    val tbl = s"$root/w5"
    val df = spark.range(0, 40).select($"id".cast("int").as("k"),
      ($"id" % 7).cast("double").as("v"))
    Sinks.publishVersioned(df.repartitionByRange(4, $"k"), tbl, None,
      statsCols = Seq("k"))
    Sinks.publishTypeWidening(spark, tbl, 0L,
      Map("k" -> org.apache.spark.sql.types.LongType))
    val dir = Sinks.resolve(tbl)
    val all = graft.io.Fs.walkParquet(Paths.get(dir)).size
    val kept = graft.ops.Stats.prunedFiles(spark, dir, "k", 0L, 5L).size
    assert(all > 1 && kept < all, s"kept $kept of $all")
    val got = graft.ops.Stats.readCurrentWhere(spark, tbl, "k", 5L, 9L)
      .orderBy("k").select("k").as[Long].collect().toSeq
    assert(got == (5L to 9L).toSeq)
  }

  test("compaction materializes: wide footers, marker gone") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftw.w6 (k INT, v INT) USING parquet")
    spark.sql("INSERT INTO graftw.w6 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graftw.w6 ALTER COLUMN v TYPE BIGINT")
    Sinks.compactVersioned(spark, s"$root/w6")
    val live = Sinks.resolve(s"$root/w6")
    assert(ColMap.widened(live).isEmpty, "compaction must shed the marker")
    val footer = spark.read.parquet(
      graft.io.Fs.walkParquet(Paths.get(live)).head.toString).schema
    assert(footer("v").dataType.typeName == "long",
      "the rewrite must land physically wide files")
    assert(spark.sql("SELECT sum(v) FROM graftw.w6").collect().head.getLong(0) == 30L)
  }

  test("refusals: narrowing, string retype, hidden bucket-transform source") {
    import spark.implicits._
    spark.sql("CREATE TABLE graftw.w7 (k BIGINT, v INT, s STRING) USING parquet")
    spark.sql("INSERT INTO graftw.w7 VALUES (1, 1, 'x')")
    intercept[Exception](
      spark.sql("ALTER TABLE graftw.w7 ALTER COLUMN k TYPE INT"))
    intercept[Exception](
      spark.sql("ALTER TABLE graftw.w7 ALTER COLUMN s TYPE BIGINT"))
    val tbl = s"$root/w8"
    val df = spark.range(0, 20).select($"id".cast("int").as("u"), $"id".as("k"))
    Sinks.publishVersioned(df, tbl, None)
    Sinks.repartitionTable(spark, tbl, Seq("bucket(4, u)"))
    intercept[IllegalArgumentException](
      Sinks.publishTypeWidening(spark, tbl, Sinks.currentVersion(tbl).get,
        Map("u" -> org.apache.spark.sql.types.LongType)))
  }
}
