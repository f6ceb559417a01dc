package graft.examples

import graft.io.Tables
import graft.ops.{Dv, Sinks, TableProps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-9 lakehouse surface composed into one runnable job — the
  * month-two operational loop over a stored corpus:
  *
  *   1. COPY INTO         (landing-zone files ingested exactly once —
  *                         the second call is a receipt-deduped no-op)
  *   2. zero-copy CLONE   (a dev/staging fork of the table: hardlink
  *                         carry, zero data bytes, fully independent)
  *   3. MOR DELETE/UPDATE (deletion vectors: positions commit, data
  *                         files don't rewrite; reads subtract at scan)
  *   4. metadata count    (count(*) answered from the stats sidecar —
  *                         on the un-vectored clone: a LocalRelation)
  *   5. partition evolve  (the clone re-lays PARTITIONED BY status;
  *                         its history keeps the old layout via _PSPEC)
  *   6. compact + retain  (the purge: vectors materialize into files;
  *                         time-window retention keeps recent versions)
  *
  * `sbt "runMain graft.examples.MorLakehousePipeline [sfDir]"`.
  */
object MorLakehousePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rootDir = java.nio.file.Files.createTempDirectory("graft_mor")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val landing = s"$rootDir/landing"
    val tbl = s"$rootDir/orders"
    val fork = s"$rootDir/orders_fork"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))

    // 1. land the fixture as two files and ingest them exactly once
    val orders = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orders.filter(col("o_orderkey") % 2 === 0).coalesce(1)
      .write.parquet(s"$landing/drop_even")
    orders.filter(col("o_orderkey") % 2 =!= 0).coalesce(1)
      .write.parquet(s"$landing/drop_odd")
    // files land one directory deep in the write above — flatten them in
    Seq("drop_even", "drop_odd").foreach { d =>
      graft.io.Fs.walkParquet(java.nio.file.Paths.get(s"$landing/$d")).foreach(f =>
        java.nio.file.Files.move(f,
          java.nio.file.Paths.get(landing, s"$d.parquet")))
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(s"$landing/$d"))
    }
    val (v0, ingested) = Sinks.copyInto(spark, tbl, landing)
    val (_, rerun) = Sinks.copyInto(spark, tbl, landing)
    println(s"[1] COPY INTO: v$v0 with ${ingested.size} files; " +
      s"re-run ingested ${rerun.size} (receipt-deduped)")

    // annotate the ingested version with footer stats (the post-commit
    // retrofit door), then DECLARE the columns (round-13): every later
    // commit — DML, MERGE, compaction — re-collects them by itself, so
    // the sidecar can never go stale again
    graft.ops.Stats.annotate(spark, Sinks.resolve(tbl),
      Seq("o_orderkey", "o_custkey"))
    TableProps.update(tbl)(_ +
      (TableProps.StatsKey -> "o_orderkey,o_custkey"))

    // 2. a zero-copy fork for the risky work
    Sinks.cloneTable(spark, tbl, fork)
    println(s"[2] CLONE: fork at v0 = main v${Sinks.currentVersion(tbl).get}, " +
      "zero bytes moved")

    // 3. merge-on-read surgery on the MAIN table: no data files rewrite
    TableProps.update(tbl)(_ + ("graft.dml.mode" -> "mor"))
    Sinks.deleteVector(spark, tbl, col("o_custkey") % 10 === 3)
    Sinks.updateVector(spark, tbl, col("o_orderstatus") === "P",
      Map("o_totalprice" -> lit(0.0)))
    val live = Sinks.readCurrent(spark, tbl)
    println(s"[3] MOR: ${live.count()} rows live, vector=" +
      Dv.exists(Sinks.resolve(tbl)) +
      s", zeroed P-rows=${live.filter(col("o_totalprice") === 0.0).count()}")
    // ... and a full SQL MERGE routes merge-on-read too (update + insert
    // in one vector commit, still no file rewrites)
    spark.conf.set("spark.sql.catalog.morm", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.morm.root", rootDir.toString)
    spark.sql(
      """MERGE INTO morm.orders t USING (SELECT 1 AS mk, 9.99 AS np
        |  UNION ALL SELECT -7, 1.25) s
        |ON t.o_orderkey = s.mk
        |WHEN MATCHED THEN UPDATE SET o_totalprice = s.np
        |WHEN NOT MATCHED THEN INSERT
        |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice)
        |  VALUES (s.mk, 0, 'Z', s.np)""".stripMargin)
    println(s"[3b] MOR MERGE: ${Sinks.readCurrent(spark, tbl).count()} rows, " +
      s"versions=${Sinks.listVersions(tbl).size}")

    // 4. metadata-only count on the (un-vectored) fork through SQL
    spark.conf.set("spark.sql.catalog.morx", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.morx.root", rootDir.toString)
    val cq = spark.sql("SELECT count(*) AS n FROM morx.orders_fork")
    val metaOnly = cq.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    }.isDefined
    println(s"[4] metadata count on the fork: ${cq.head().getLong(0)} rows, " +
      s"LocalRelation=$metaOnly (zero files opened)")

    // 5. the fork evolves its layout independently
    Sinks.repartitionTable(spark, fork, Seq("o_orderstatus"))
    println(s"[5] fork re-laid PARTITIONED BY (o_orderstatus): " +
      s"versions=${Sinks.listVersions(fork).mkString(",")}")

    // 6. purge the main table's vectors; keep a day of history
    Sinks.compactVersioned(spark, tbl, retainVersions = 0, retainHours = 24.0)
    println(s"[6] compacted: vector=${Dv.exists(Sinks.resolve(tbl))}, " +
      s"versions=${Sinks.listVersions(tbl).mkString(",")} " +
      "(in-window history retained)")

    // 7. metadata-only RENAME on the fork (round-10 column mapping):
    // every data file carried by hardlink, logical name changes, DML
    // keeps working (routed merge-on-read on the mapped version)
    val preRename = graft.io.Fs.walkParquet(
      java.nio.file.Paths.get(Sinks.resolve(fork))).size
    spark.sql("ALTER TABLE morx.orders_fork RENAME COLUMN o_totalprice TO total_price")
    spark.sql("UPDATE morx.orders_fork SET total_price = 1.0 WHERE o_orderkey = 2")
    println(s"[7] RENAME COLUMN metadata-only: mapped=" +
      graft.ops.ColMap.exists(Sinks.resolve(fork)) +
      s", files carried=$preRename, sum(total_price)=" +
      spark.sql("SELECT round(sum(total_price),2) FROM morx.orders_fork").head().get(0))

    // 8. bronze+silver in ONE multi-table transaction (round-10): the
    // derived rollup can never be observed against a base it wasn't
    // computed from — both tables flip on one atomic marker
    val bronze = s"$rootDir/tx_bronze"
    val silver = s"$rootDir/tx_silver"
    val b0 = Sinks.readCurrent(spark, tbl)
    val s0 = b0.groupBy("o_orderstatus")
      .agg(round(sum("o_totalprice"), 2).as("revenue"))
    val committed = graft.ops.Txn.publishAll(Seq(
      graft.ops.TxnWrite(bronze, b0, None),
      graft.ops.TxnWrite(silver, s0, None)))
    println(s"[8] multi-table txn: bronze v${committed(bronze)} + " +
      s"silver v${committed(silver)} committed atomically " +
      s"(${Sinks.readCurrent(spark, silver).count()} rollup rows)")

    // 9. operator hygiene: vacuum aged crash debris (none here — the
    // point is the zero, proving live state is never touched)
    val (nStages, nOrphans, nForeign) = Sinks.vacuumOrphans(tbl, olderThanMs = 0L)
    println(s"[9] vacuum_orphans: $nStages stage dirs, $nOrphans orphan " +
      s"versions, $nForeign foreign entries removed; " +
      s"table intact=${Sinks.readCurrent(spark, tbl).count() > 0}")

    // 10. retention WITHOUT a rewrite (round-13): history on the fork
    // expires as pure metadata — compaction is for layout, not expiry
    val expired = Sinks.expireVersions(spark, fork, retainVersions = 1)
    println(s"[10] expire_versions on the fork: ${expired.size} snapshots " +
      s"unlinked (${expired.mkString(",")}), live + 1 retained, " +
      s"rows=${Sinks.readCurrent(spark, fork).count()}")

    spark.stop()
  }
}
