package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Sinks, Stats, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B134 partition evolution ([[Sinks.repartitionTable]] +
  * `CALL system.repartition_table`): the live version re-lays under a
  * new spec in one OCC commit; every retained version reads, time-
  * travels, and RESTOREs under the layout its files actually have via
  * the version-local `_PSPEC` stamp.
  */
class PartitionEvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_pevo").toString
    spark.conf.set("spark.sql.catalog.graftpe", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftpe.root", dir)
    dir
  }

  private def mk(name: String): (String, Long) = {
    import spark.implicits._
    val df = spark.range(0, 40)
      .select($"id".as("k"), ($"id" % 4).cast("string").as("grp"),
        format_string("%05d", $"id" % 7).as("code"))
    val tbl = s"$root/$name"
    (tbl, Sinks.publishVersioned(df.repartition(2), tbl, None,
      statsCols = Seq("k")))
  }

  test("unpartitioned -> partitioned: layout, values, pruning, and old-version reads") {
    val (tbl, _) = mk("t1")
    val before = Sinks.readCurrent(spark, tbl).orderBy("k").collect()
    val v = Sinks.repartitionTable(spark, tbl, Seq("grp"))
    assert(v == 1L)
    // Hive dirs exist and the current read is value-identical
    assert(graft.io.Fs.listDir(Paths.get(Sinks.versionPath(tbl, 1)))
      .exists(_.getFileName.toString.startsWith("grp=")))
    val after = Sinks.readCurrent(spark, tbl)
      .select("k", "grp", "code").orderBy("k").collect()
    assert(after.toSeq == before.map(r =>
      org.apache.spark.sql.Row(r.getLong(0), r.getString(1), r.getString(2))).toSeq)
    // partition pruning fires through the catalog
    val q = spark.sql("SELECT k FROM graftpe.t1 WHERE grp = '2'")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"), plan.take(2000))
    assert(q.count() == 10)
    // v0 still reads under ITS layout (files carry grp as a data column)
    val v0 = spark.sql("SELECT k, grp FROM graftpe.t1 VERSION AS OF 0")
    assert(v0.orderBy("k").collect().map(_.getLong(0)).toSeq == (0L until 40L))
  }

  test("repartition to a leading-zero string column keeps STRING in current AND time-travel reads") {
    val (tbl, _) = mk("t2")
    Sinks.repartitionTable(spark, tbl, Seq("code"))
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.schema("code").dataType.typeName == "string",
      "directory-name inference must not rewrite '00123' into an int")
    assert(cur.filter(col("code") === "00003").count() > 0)
    // evolve AGAIN to another spec; the code-partitioned version becomes
    // history and must STILL read code as string via its own _PSPEC
    Sinks.repartitionTable(spark, tbl, Seq("grp"))
    val hist = spark.sql("SELECT * FROM graftpe.t2 VERSION AS OF 1")
    assert(hist.schema("code").dataType.typeName == "string",
      s"time travel lost the historical spec's type pinning: ${hist.schema}")
  }

  test("partitioned -> unpartitioned puts the column back into the files") {
    val (tbl, _) = mk("t3")
    Sinks.repartitionTable(spark, tbl, Seq("grp"))
    Sinks.repartitionTable(spark, tbl, Nil)
    assert(TableProps.partitionCols(tbl).isEmpty)
    assert(!graft.io.Fs.listDir(Paths.get(Sinks.resolve(tbl)))
      .exists(_.getFileName.toString.startsWith("grp=")))
    assert(Sinks.readCurrent(spark, tbl).select("grp").distinct().count() == 4)
  }

  test("RESTORE across the evolution restores the spec; the next append lays out compatibly") {
    val (tbl, _) = mk("t4")
    Sinks.repartitionTable(spark, tbl, Seq("grp"))
    assert(TableProps.partitionCols(tbl) == Seq("grp"))
    // rewind to the unpartitioned v0 — the spec must follow the data
    Sinks.restoreVersion(spark, tbl, 0L)
    assert(TableProps.partitionCols(tbl).isEmpty,
      "restore must carry the restored version's partition spec")
    assert(!graft.io.Fs.listDir(Paths.get(Sinks.resolve(tbl)))
      .exists(_.getFileName.toString.startsWith("grp=")))
    // an append now lands flat next to flat carried files — no mixed layout
    import spark.implicits._
    val extra = Seq((100L, "9", "00099")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Sinks.currentVersion(tbl))
    val all = Sinks.readCurrent(spark, tbl)
    assert(all.count() == 41 && all.filter($"k" === 100L).count() == 1)
  }

  test("stats sidecar survives the rewrite: skipping still prunes on the stats column") {
    val (tbl, _) = mk("t5")
    Sinks.repartitionTable(spark, tbl, Seq("grp"))
    val dir = Sinks.resolve(tbl)
    val all = graft.io.Fs.walkParquet(Paths.get(dir)).size
    val kept = Stats.prunedFiles(spark, dir, "k", 0L, 1L).size
    assert(all > 1 && kept < all, s"kept $kept of $all")
  }

  test("CALL system.repartition_table + refusals") {
    val (tbl, _) = mk("t6")
    val row = spark.sql(
      "CALL graftpe.system.repartition_table(table => 't6', partition_by => 'grp')")
      .collect().head
    assert(row.getString(0) == "t6" && row.getLong(1) == 1L)
    assert(TableProps.partitionCols(tbl) == Seq("grp"))
    intercept[Exception](Sinks.repartitionTable(spark, tbl, Seq("nope")))
    intercept[Exception](Sinks.repartitionTable(spark, tbl, Seq("grp", "grp")))
    intercept[Exception](
      Sinks.repartitionTable(spark, tbl, Seq("k", "grp", "code")))
    // failed evolution rolled the spec back
    assert(TableProps.partitionCols(tbl) == Seq("grp"))
  }
}
