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

  // ------------------------------------------------------------------
  // metadata-only evolution (Iceberg spec-append form): zero data
  // movement, mixed-layout reads, per-layout pruning, MOR, compaction
  // ------------------------------------------------------------------

  private def fileKeys(dir: java.nio.file.Path): Map[String, Any] =
    graft.io.Fs.walkParquet(dir).map { f =>
      f.getFileName.toString -> java.nio.file.Files.readAttributes(
        f, classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()
    }.toMap

  test("metadata-only evolve: zero data movement (inode-asserted), spec recorded for future writes") {
    val (tbl, _) = mk("m1")
    val v0 = Paths.get(Sinks.versionPath(tbl, 0))
    val before = fileKeys(v0)
    val v = Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    assert(v == 1L)
    val v1 = Paths.get(Sinks.versionPath(tbl, 1))
    // every data file is the SAME inode, now under _layout0/ — nothing
    // was rewritten, nothing remains at the top level
    val after = fileKeys(v1)
    assert(after == before, "evolution must hardlink, not rewrite")
    assert(graft.io.Fs.walkParquet(v1).forall(f =>
      v1.relativize(f).getName(0).toString == "_layout0"))
    // the leg keeps the OLD spec; the version and table speak the NEW one
    assert(new String(java.nio.file.Files.readAllBytes(
      v1.resolve("_layout0").resolve("_PSPEC")), "UTF-8").trim.isEmpty)
    assert(TableProps.partitionCols(tbl) == Seq("grp"))
    // values identical through the funnel
    assert(Sinks.readCurrent(spark, tbl).orderBy("k").collect().toSeq ==
      Sinks.readVersion(spark, tbl, 0).orderBy("k").collect().toSeq)
  }

  test("mixed-layout reads: appends land under the new spec; pruning fires on BOTH layouts") {
    import spark.implicits._
    val (tbl, _) = mk("m2")
    // start unpartitioned, evolve to grp-partitioning metadata-only,
    // then append — new files get grp= dirs, old files stay flat in the leg
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val extra = (40L until 80L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(1L))
    val v2 = Paths.get(Sinks.versionPath(tbl, 2))
    assert(graft.io.Fs.listDir(v2).exists(_.getFileName.toString.startsWith("grp=")),
      "append after evolution must lay out under the NEW spec")
    assert(java.nio.file.Files.isDirectory(v2.resolve("_layout0")),
      "the carried leg must survive the append")
    // whole-table read = old rows ∪ new rows, exactly
    val all = Sinks.readCurrent(spark, tbl)
    assert(all.count() == 80 && all.select("k").distinct().count() == 80)
    // SQL partition pruning on the NEW layout's column
    val q = spark.sql("SELECT k FROM graftpe.m2 WHERE grp = '2'")
    assert(q.count() == 20)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("grp"),
      plan.take(3000))
    // the legacy leg has no grp= dirs, but its rows still qualify —
    // 10 from the leg (flat files) + 10 from the new layout's grp=2 dir
    val legRows = spark.sql(
      "SELECT count(*) FROM graftpe.m2 WHERE grp = '2' AND k < 40")
      .collect().head.getLong(0)
    assert(legRows == 10)
  }

  test("old-partition-column pruning keeps firing on the leg after evolving AWAY from it") {
    import spark.implicits._
    val (tbl, _) = mk("m3")
    // rewrite-partition by grp first (Hive dirs), THEN metadata-evolve to code
    Sinks.repartitionTable(spark, tbl, Seq("grp"))
    Sinks.repartitionTable(spark, tbl, Seq("code"), metadataOnly = true)
    val extra = (40L until 60L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(2L))
    // grp is a DIRECTORY in the leg, a data column on top; code the reverse
    val byOld = spark.sql("SELECT k FROM graftpe.m3 WHERE grp = '1'")
    val byNew = spark.sql("SELECT k FROM graftpe.m3 WHERE code = '00003'")
    assert(byOld.count() == 15) // 10 leg + 5 appended
    assert(byNew.count() ==
      (0L until 60L).count(i => i % 7 == 3).toLong)
    val planOld = byOld.queryExecution.executedPlan.toString
    assert(planOld.contains("PartitionFilters") && planOld.contains("grp"),
      "leg-side partition pruning lost: " + planOld.take(3000))
    val planNew = byNew.queryExecution.executedPlan.toString
    assert(planNew.contains("PartitionFilters") && planNew.contains("code"),
      "top-side partition pruning lost: " + planNew.take(3000))
    // exact metadata count still answers on the mixed-layout table
    assert(spark.sql("SELECT count(*) FROM graftpe.m3").collect()
      .head.getLong(0) == 60)
  }

  test("stats skipping survives the evolution: rewritten keys prune, pruned read stays exact") {
    import spark.implicits._
    // k-clustered files (disjoint ranges) so the sidecar CAN prune;
    // the evolution moves them by hardlink and must keep it pruning
    val df = spark.range(0, 40)
      .select($"id".as("k"), ($"id" % 4).cast("string").as("grp"),
        format_string("%05d", $"id" % 7).as("code"))
    val tbl = s"$root/m4"
    Sinks.publishVersioned(df.repartitionByRange(4, $"k"), tbl, None,
      statsCols = Seq("k"))
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val dir = Sinks.resolve(tbl)
    val allFiles = graft.io.Fs.walkParquet(Paths.get(dir)).size
    val kept = Stats.prunedFiles(spark, dir, "k", 0L, 1L).size
    assert(allFiles > 1 && kept < allFiles,
      s"rewritten stats keys must keep pruning: kept $kept of $allFiles")
    val got = Stats.readCurrentWhere(spark, tbl, "k", 5L, 9L)
      .orderBy("k").collect().map(_.getLong(0)).toSeq
    assert(got == (5L to 9L).toSeq)
  }

  test("MOR delete on a mixed-layout table: leg-prefixed vector keys, exact subtraction") {
    import spark.implicits._
    val (tbl, _) = mk("m5")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val extra = (40L until 50L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(1L))
    // rows matched in BOTH layouts (k<40 lives in the leg, k>=40 on top)
    Sinks.deleteVector(spark, tbl, col("k") % 10 === 0)
    val left = Sinks.readCurrent(spark, tbl).select("k").as[Long].collect().toSet
    assert(left == (0L until 50L).filter(_ % 10 != 0).toSet)
    val keys = graft.ops.Dv.vector(spark, Sinks.resolve(tbl))
      .select("file").distinct().collect().map(_.getString(0))
    assert(keys.exists(_.startsWith("_layout0/")),
      s"leg rows must be keyed under their leg: ${keys.mkString(", ")}")
    assert(keys.exists(!_.startsWith("_layout0/")),
      "top-layout rows must be keyed at the top")
  }

  test("SQL DML on a mixed-layout table routes merge-on-read and stays exact") {
    import spark.implicits._
    val (tbl, _) = mk("m12")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val extra = (40L until 48L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(1L))
    // DELETE touches rows in both layouts; the COW pruned-file scan
    // cannot serve a mixed layout, so the route must be merge-on-read
    spark.sql("DELETE FROM graftpe.m12 WHERE k % 8 = 1")
    assert(graft.ops.Dv.exists(Sinks.resolve(tbl)),
      "mixed-layout DELETE must route merge-on-read")
    val ks = spark.sql("SELECT k FROM graftpe.m12").as[Long].collect().toSet
    assert(ks == (0L until 48L).filter(_ % 8 != 1).toSet)
    // UPDATE crosses layouts too (new copies land under the NEW spec)
    spark.sql("UPDATE graftpe.m12 SET code = 'XXXXX' WHERE k % 8 = 2")
    assert(spark.sql(
      "SELECT count(*) FROM graftpe.m12 WHERE code = 'XXXXX'")
      .collect().head.getLong(0) == 6)
    assert(spark.sql("SELECT count(*) FROM graftpe.m12")
      .collect().head.getLong(0) == 42)
  }

  test("compaction materializes the legs away under the current spec") {
    import spark.implicits._
    val (tbl, _) = mk("m6")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val extra = (40L until 50L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(1L))
    val v = Sinks.compactVersioned(spark, tbl)
    val dir = Paths.get(Sinks.versionPath(tbl, v))
    assert(!graft.io.Fs.listDir(dir).exists(d =>
      graft.io.Fs.isLayoutLeg(d.getFileName.toString)),
      "compaction must dissolve the layout legs")
    assert(graft.io.Fs.listDir(dir).exists(_.getFileName.toString.startsWith("grp=")),
      "the rewrite lays out under the CURRENT spec")
    assert(Sinks.readCurrent(spark, tbl).count() == 50)
  }

  test("time travel and RESTORE across a metadata-only evolution") {
    val (tbl, _) = mk("m7")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    // v0 (flat) still reads under its own layout
    assert(spark.sql("SELECT k FROM graftpe.m7 VERSION AS OF 0").count() == 40)
    // restore to pre-evolution: spec follows the data back
    Sinks.restoreVersion(spark, tbl, 0L)
    assert(TableProps.partitionCols(tbl).isEmpty)
    assert(Sinks.readCurrent(spark, tbl).count() == 40)
  }

  test("back-to-back evolutions without appends do not mint empty legs") {
    val (tbl, _) = mk("m8")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    Sinks.repartitionTable(spark, tbl, Seq("code"), metadataOnly = true)
    val live = Paths.get(Sinks.resolve(tbl))
    val legs = graft.io.Fs.listDir(live)
      .filter(d => graft.io.Fs.isLayoutLeg(d.getFileName.toString))
      .map(_.getFileName.toString)
    assert(legs == Seq("_layout0"), s"got legs ${legs.mkString(", ")}")
    assert(TableProps.partitionCols(tbl) == Seq("code"))
    assert(Sinks.readCurrent(spark, tbl).count() == 40)
  }

  test("metadata-only refusals: same spec, unknown column, column-mapping rename") {
    val (tbl, _) = mk("m9")
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Nil, metadataOnly = true)) // already unpartitioned
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("nope"), metadataOnly = true))
    Sinks.publishColumnMapping(spark, tbl, 0L, Map("code2" -> "code"))
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true))
  }

  test("CALL system.repartition_table(metadata_only => true)") {
    val (tbl, _) = mk("m10")
    val row = spark.sql(
      "CALL graftpe.system.repartition_table(table => 'm10', " +
        "partition_by => 'grp', metadata_only => true)").collect().head
    assert(row.getString(0) == "m10" && row.getLong(1) == 1L)
    assert(java.nio.file.Files.isDirectory(
      Paths.get(Sinks.versionPath(tbl, 1), "_layout0")))
    assert(spark.sql("SELECT count(*) FROM graftpe.m10 WHERE grp = '3'")
      .collect().head.getLong(0) == 10)
  }

  test("CLONE carries the legs and their spec stamps") {
    import spark.implicits._
    val (tbl, _) = mk("m11")
    Sinks.repartitionTable(spark, tbl, Seq("grp"), metadataOnly = true)
    val extra = (40L until 44L).map(i =>
      (i, (i % 4).toString, f"${i % 7}%05d")).toDF("k", "grp", "code")
    Sinks.appendVersioned(extra, tbl, Some(1L))
    val dst = s"$root/m11_clone"
    Sinks.cloneTable(spark, tbl, dst)
    assert(Sinks.readCurrent(spark, dst).count() == 44)
    assert(java.nio.file.Files.exists(
      Paths.get(Sinks.resolve(dst), "_layout0", "_PSPEC")),
      "the clone must carry the leg spec stamp")
  }

  test("optimized writes: graft.write.distribute lands ONE file per partition value") {
    import spark.implicits._
    def mkDistributed(name: String, distribute: Boolean): String = {
      val tbl = s"$root/$name"
      TableProps.update(tbl) { _ =>
        Map(TableProps.PartitionKey -> "grp STRING") ++
          (if (distribute) Map(TableProps.DistributeKey -> "true") else Map.empty)
      }
      val df = spark.range(0, 80)
        .select($"id".as("k"), ($"id" % 4).cast("string").as("grp"))
      // 8 input partitions, each holding every grp value — the
      // (tasks x values) worst case the switch exists for
      Sinks.publishVersioned(df.repartition(8), tbl, None)
      tbl
    }
    def filesPerDir(tbl: String): Seq[Int] =
      graft.io.Fs.listDir(Paths.get(Sinks.resolve(tbl)))
        .filter(_.getFileName.toString.startsWith("grp="))
        .map(d => graft.io.Fs.walkParquet(d).size)
    val plain = mkDistributed("d1", distribute = false)
    assert(filesPerDir(plain).forall(_ > 1),
      s"control: the worst case must actually produce many files, got ${filesPerDir(plain)}")
    val opt = mkDistributed("d2", distribute = true)
    assert(filesPerDir(opt) == Seq(1, 1, 1, 1),
      s"distributed write must land one file per value, got ${filesPerDir(opt)}")
    // appends distribute too, and values stay identical
    val extra = spark.range(80, 160)
      .select($"id".as("k"), ($"id" % 4).cast("string").as("grp"))
    Sinks.appendVersioned(extra.repartition(8), opt, Sinks.currentVersion(opt))
    assert(filesPerDir(opt) == Seq(2, 2, 2, 2),
      s"each append adds exactly one file per value, got ${filesPerDir(opt)}")
    assert(Sinks.readCurrent(spark, opt).count() == 160)
    // SQL door: declared at CREATE, honored by INSERT
    spark.conf.set("spark.sql.catalog.graftpe.root", root)
    spark.sql("CREATE TABLE graftpe.d3 (k BIGINT, grp STRING) USING parquet " +
      "PARTITIONED BY (grp) TBLPROPERTIES ('graft.write.distribute' = 'true')")
    spark.range(0, 80).select($"id".as("k"), ($"id" % 4).cast("string").as("grp"))
      .repartition(8).createOrReplaceTempView("pe_d3_src")
    spark.sql("INSERT INTO graftpe.d3 SELECT * FROM pe_d3_src")
    assert(filesPerDir(s"$root/d3") == Seq(1, 1, 1, 1),
      s"got ${filesPerDir(s"$root/d3")}")
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
