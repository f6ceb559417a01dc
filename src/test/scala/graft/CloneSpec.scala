package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Sinks, Stats, TableProps, TableStream}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B131 zero-copy CLONE ([[Sinks.cloneTable]] + `CALL system.clone`):
  * the clone shares immutable inodes with the source snapshot, starts
  * its own history at v0, carries table metadata + descriptive sidecars,
  * and evolves fully independently afterwards.
  */
class CloneSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private def tmp(): String = Files.createTempDirectory("graft_clone").toString

  test("clone equals the source snapshot, shares inodes, and histories diverge") {
    val dir = tmp()
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    val nation = graft.io.Tables.nation(spark, sf001)
    Sinks.publishVersioned(nation, src, None)
    val v = Sinks.cloneTable(spark, src, dst)
    assert(v == 0L, "a clone's history starts at v0")
    // value-identical to the cloned snapshot
    assert(Sinks.readCurrent(spark, dst).orderBy("n_nationkey").collect().toSeq ==
      Sinks.readCurrent(spark, src).orderBy("n_nationkey").collect().toSeq)
    // zero-copy: every data file in the clone shares its inode with a
    // source file (hardlink carry — the local binding's manifest copy)
    val srcKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(src)))
      .map(f => Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
      .toSet
    val dstFiles = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(dst)))
    assert(dstFiles.nonEmpty)
    dstFiles.foreach { f =>
      val k = Files.readAttributes(f, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
      assert(srcKeys.contains(k), s"clone file $f does not share an inode with the source")
    }
    // divergence: a write to either side is invisible to the other
    Sinks.appendVersioned(nation.filter(col("n_nationkey") === 0)
      .withColumn("n_nationkey", lit(901)), dst, Some(0L))
    Sinks.publishVersioned(nation.filter(col("n_nationkey") < 5), src, Some(0L))
    assert(Sinks.readCurrent(spark, dst).count() == nation.count() + 1)
    assert(Sinks.readCurrent(spark, src).count() == 5)
    // the clone's time travel sees only its OWN commits
    assert(Sinks.listVersions(dst) == Seq(0L, 1L))
  }

  test("vacuuming the source does not break the clone (shared inodes survive)") {
    val dir = tmp()
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    val nation = graft.io.Tables.nation(spark, sf001)
    Sinks.publishVersioned(nation, src, None)
    Sinks.cloneTable(spark, src, dst)
    // rewrite + vacuum ALL source history below the new compaction base
    Sinks.compactVersioned(spark, src, targetBytes = 64L * 1024 * 1024,
      retainVersions = 0)
    assert(Sinks.readCurrent(spark, dst).count() == nation.count(),
      "clone must keep reading after the source vacuumed the cloned version")
  }

  test("clone carries stats/bloom sidecars (pruning works) and CHECK constraints; strips stream high-water marks") {
    val dir = tmp()
    val src = s"$dir/src"
    val dst = s"$dir/dst"
    import spark.implicits._
    val df = spark.range(0, 80).select(($"id" % 8).as("bucket"), $"id".as("k"))
      .repartitionByRange(8, $"bucket")
    Sinks.publishVersioned(df, src, None, statsCols = Seq("k"), bloomCols = Seq("k"))
    TableProps.update(src)(_ ++ Map(
      "check.pos" -> "k >= 0",
      TableStream.lastBatchKey("deadbeef") -> "41"))
    Sinks.cloneTable(spark, src, dst)
    // descriptive sidecars rode along: skipping prunes on the clone
    val all = graft.io.Fs.walkParquet(Paths.get(Sinks.resolve(dst))).size
    val kept = Stats.prunedFiles(spark, Sinks.resolve(dst), "k", 3L, 4L).size
    assert(all > 1 && kept < all, s"stats pruning on the clone kept $kept of $all")
    val props = TableProps.load(dst)
    assert(props.get("check.pos").contains("k >= 0"),
      "CHECK constraints are table metadata and must ride the clone")
    assert(!props.contains(TableStream.lastBatchKey("deadbeef")),
      "stream writer high-water marks are per-table identities and must NOT ride")
  }

  test("refusals: existing target, vacuumed as-of version") {
    val dir = tmp()
    val src = s"$dir/src"
    val nation = graft.io.Tables.nation(spark, sf001)
    Sinks.publishVersioned(nation, src, None)
    Sinks.cloneTable(spark, src, s"$dir/dst")
    val e = intercept[IllegalArgumentException](
      Sinks.cloneTable(spark, src, s"$dir/dst"))
    assert(e.getMessage.contains("already holds"))
    val e2 = intercept[IllegalStateException](
      Sinks.cloneTable(spark, src, s"$dir/dst2", asOf = Some(7L)))
    assert(e2.getMessage.contains("does not exist"))
  }

  test("CALL system.clone: SQL door with CREATE-side guards") {
    val dir = tmp()
    spark.conf.set("spark.sql.catalog.graftclone", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftclone.root", dir)
    graft.io.Tables.region(spark, sf001).createOrReplaceTempView("clone_src_v")
    spark.sql("CREATE TABLE graftclone.r USING parquet AS SELECT * FROM clone_src_v")
    val row = spark.sql(
      "CALL graftclone.system.clone(source => 'r', target => 'r2')").collect().head
    assert(row.getString(0) == "r2" && row.getLong(1) == 0L)
    assert(spark.sql("SELECT * FROM graftclone.r2").count() ==
      spark.sql("SELECT * FROM graftclone.r").count())
    // target guards: existing table and traversal identifiers refuse
    intercept[Exception](spark.sql(
      "CALL graftclone.system.clone(source => 'r', target => 'r2')"))
    intercept[Exception](spark.sql(
      "CALL graftclone.system.clone(source => 'r', target => '../evil')"))
    // as-of clone of a historical version
    spark.sql("DELETE FROM graftclone.r WHERE r_regionkey >= 3")
    spark.sql(
      "CALL graftclone.system.clone(source => 'r', target => 'r0', version => 1)")
    assert(spark.sql("SELECT * FROM graftclone.r0").count() ==
      graft.io.Tables.region(spark, sf001).count())
  }
}
