package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B137 COPY INTO ([[Sinks.copyInto]] + `CALL system.copy_into`):
  * idempotent batch file ingestion — exactly once per source file
  * across re-runs, crashes between commit and props fold, and vacuum.
  */
class CopyIntoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def mkSrc(dir: String, name: String, ids: Range): String = {
    import spark.implicits._
    val tmp = s"$dir/.stage_$name"
    ids.map(i => (i.toLong, s"row$i")).toDF("k", "s")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = graft.io.Fs.walkParquet(Paths.get(tmp)).head
    val dst = Paths.get(dir, name)
    Files.move(part, dst)
    graft.io.Fs.deleteRecursively(Paths.get(tmp))
    dst.toString
  }

  test("ingests once, re-run is a no-op, new files ingest incrementally") {
    val dir = Files.createTempDirectory("graft_copyin").toString
    val src = s"$dir/landing"; Files.createDirectories(Paths.get(src))
    val tbl = s"$dir/t"
    mkSrc(src, "a.parquet", 0 until 10)
    mkSrc(src, "b.parquet", 10 until 30)
    val (v1, in1) = Sinks.copyInto(spark, tbl, src)
    assert(v1 == 0L && in1.size == 2)
    assert(Sinks.readCurrent(spark, tbl).count() == 30)
    // re-run: nothing new, NO new version
    val (v2, in2) = Sinks.copyInto(spark, tbl, src)
    assert(v2 == 0L && in2.isEmpty)
    assert(Sinks.listVersions(tbl) == Seq(0L))
    // drop one more file: only it ingests
    mkSrc(src, "c.parquet", 30 until 35)
    val (v3, in3) = Sinks.copyInto(spark, tbl, src)
    assert(v3 == 1L && in3.size == 1 && in3.head.endsWith("c.parquet"))
    assert(Sinks.readCurrent(spark, tbl).count() == 35)
  }

  test("avro landing zone ingests through AvroIO with the same exactly-once receipts (round-14)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_copyin_avro").toString
    val src = s"$dir/landing"
    val root = s"$dir/t"
    // batch 1: two avro containers
    graft.sources.AvroIO.write(
      (0L until 50L).map(i => (i, s"row$i")).toDF("k", "s").repartition(2), src)
    val (v1, in1) = Sinks.copyInto(spark, root, src, format = "avro")
    assert(in1.size == 2)
    assert(Sinks.readCurrent(spark, root).count() == 50)
    // idempotent re-run
    val (v2, in2) = Sinks.copyInto(spark, root, src, format = "avro")
    assert(v2 == v1 && in2.isEmpty)
    // a NEW container lands: only the delta ingests
    val extra = s"$dir/extra"
    graft.sources.AvroIO.write(
      (100L until 120L).map(i => (i, s"row$i")).toDF("k", "s").coalesce(1), extra)
    val part = graft.io.Fs.listDir(Paths.get(extra))
      .find(_.getFileName.toString.endsWith(".avro")).get
    Files.move(part, Paths.get(src, "late.avro"))
    val (_, in3) = Sinks.copyInto(spark, root, src, format = "avro")
    assert(in3.size == 1)
    assert(Sinks.readCurrent(spark, root).count() == 70)
    assert(Sinks.readCurrent(spark, root).agg(sum("k")).head().getLong(0) ==
      (0L until 50L).sum + (100L until 120L).sum)
  }

  test("crash between commit and props fold does not double-ingest; vacuum folds receipts") {
    val dir = Files.createTempDirectory("graft_copyin").toString
    val src = s"$dir/landing"; Files.createDirectories(Paths.get(src))
    val tbl = s"$dir/t"
    mkSrc(src, "a.parquet", 0 until 10)
    Sinks.copyInto(spark, tbl, src)
    mkSrc(src, "b.parquet", 10 until 20)
    Sinks.copyInto(spark, tbl, src)
    // simulate the crash window: wipe the durable props fold — the
    // receipts in the retained versions must still prevent re-ingestion
    TableProps.update(tbl)(_.filterNot(_._1.startsWith("graft.copyin.")))
    val (_, again) = Sinks.copyInto(spark, tbl, src)
    assert(again.isEmpty, "receipts in retained versions must dedupe")
    // vacuum evicts the receipt-carrying versions: folding must happen
    TableProps.update(tbl)(_.filterNot(_._1.startsWith("graft.copyin.")))
    Sinks.compactVersioned(spark, tbl, targetBytes = 64L * 1024 * 1024,
      retainVersions = 0)
    assert(TableProps.load(tbl).exists(_._1.startsWith("graft.copyin.")),
      "vacuum must fold evicted receipts into props")
    val (_, postVacuum) = Sinks.copyInto(spark, tbl, src)
    assert(postVacuum.isEmpty, "vacuum-folded receipts must dedupe")
    assert(Sinks.readCurrent(spark, tbl).count() == 20)
  }

  test("schema drift fails loudly without committing") {
    val dir = Files.createTempDirectory("graft_copyin").toString
    val src = s"$dir/landing"; Files.createDirectories(Paths.get(src))
    val tbl = s"$dir/t"
    mkSrc(src, "a.parquet", 0 until 5)
    Sinks.copyInto(spark, tbl, src)
    // a drifted file (extra column) in the landing zone
    import spark.implicits._
    val tmp = s"$dir/.bad"
    Seq((99L, "x", 1.5)).toDF("k", "s", "extra")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    Files.move(graft.io.Fs.walkParquet(Paths.get(tmp)).head,
      Paths.get(src, "bad.parquet"))
    val vBefore = Sinks.currentVersion(tbl)
    intercept[Exception](Sinks.copyInto(spark, tbl, src))
    assert(Sinks.currentVersion(tbl) == vBefore)
    // and it was NOT marked ingested — fixing the file re-ingests it
    assert(!TableProps.load(tbl).values.exists(_.endsWith("bad.parquet")))
  }

  test("CALL system.copy_into over an existing catalog table") {
    val root = Files.createTempDirectory("graft_copyin_cat").toString
    spark.conf.set("spark.sql.catalog.graftci", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftci.root", root)
    val src = s"$root/landing"; Files.createDirectories(Paths.get(src))
    spark.sql("CREATE TABLE graftci.t (k BIGINT, s STRING) USING parquet")
    mkSrc(src, "a.parquet", 0 until 7)
    val row = spark.sql(
      s"CALL graftci.system.copy_into(table => 't', source => '$src')")
      .collect().head
    assert(row.getString(0) == "t" && row.getLong(2) == 1L)
    assert(spark.sql("SELECT * FROM graftci.t").count() == 7)
    val again = spark.sql(
      s"CALL graftci.system.copy_into(table => 't', source => '$src')")
      .collect().head
    assert(again.getLong(2) == 0L)
  }
}
