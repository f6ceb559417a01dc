package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Right-to-erasure purge (B179, `Sinks.purgeWhere` + `CALL
  * system.purge`): matching rows physically gone from the live version
  * AND all history, clean files carried by inode, deletion vectors on
  * carried files still subtracting, no change feed re-publishing the
  * purged payload, refusals for every state that would silently retain
  * data, and the raw-scan proof.
  */
class PurgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_purge").toString

  private def fileKeys(dir: String): Set[Object] =
    graft.io.Fs.walkParquet(Paths.get(dir)).map(f =>
      Files.readAttributes(f,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet

  /** Raw content of every parquet file anywhere under the table root —
    * the auditor's view: sidecars don't hide rows here.
    */
  private def rawEverything(root: String) = {
    val files = graft.io.Fs.walkParquet(Paths.get(root))
      .filterNot(_.toString.contains("/_")) // sidecar dirs
      .map(_.toString)
    spark.read.parquet(files: _*)
  }

  test("purge: rows gone everywhere, history expired, clean files carried") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 100).select($"id".as("k"), ($"id" % 10).as("g"))
    // range-clustered layout: k<10 lands in the first file(s) only
    Sinks.publishVersioned(
      df.repartitionByRange(4, $"k").sortWithinPartitions($"k"), tbl, None)
    // history that also contains the doomed rows
    Sinks.appendVersioned(df.filter($"k" >= 200).limit(0), tbl, Some(0L))
    assert(Sinks.listVersions(tbl) == Seq(0L, 1L))
    val keysBefore = fileKeys(Sinks.versionPath(tbl, 1))
    val (purged, rewritten, expired, live) =
      Sinks.purgeWhere(spark, tbl, "k < 10")
    assert(purged == 10 && rewritten >= 1 && expired >= 1)
    assert(Sinks.listVersions(tbl) == Seq(live))
    // state: exactly the survivors
    val got = Sinks.readCurrent(spark, tbl).agg(count("*"), min("k")).collect().head
    assert(got.getLong(0) == 90 && got.getLong(1) == 10)
    // the auditor's scan: no matching bytes anywhere under the root
    assert(rawEverything(tbl).filter($"k" < 10).count() == 0)
    // clean files carried by inode (subset of the pre-purge live keys)
    val keysAfter = fileKeys(Sinks.versionPath(tbl, live))
    assert(keysAfter.intersect(keysBefore).nonEmpty, "no file carried")
    // no change feed in the purged version (the payload must not re-publish)
    assert(!Files.isDirectory(Paths.get(Sinks.versionPath(tbl, live), "_changes")))
    // time travel to pre-purge state is gone, loudly
    intercept[Exception](Sinks.readVersion(spark, tbl, 0L).collect())
  }

  test("purge composes with deletion vectors: touched materialize, carried subtract") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 100).select($"id".as("k"), ($"id" % 10).as("g"))
    Sinks.publishVersioned(
      df.repartitionByRange(4, $"k").sortWithinPartitions($"k"), tbl, None)
    // MOR delete g==7 (bytes stay, vector hides) across ALL files
    Sinks.deleteVector(spark, tbl, col("g") === 7)
    val (purged, _, _, live) = Sinks.purgeWhere(spark, tbl, "k < 10")
    // g==7 rows with k<10 were already hidden: purge counts only live rows
    assert(purged == 9)
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 81) // 100 - 10 (g==7) - 9 (k<10 live)
    assert(cur.filter($"g" === 7).count() == 0) // carried files still subtract
    assert(rawEverything(tbl).filter($"k" < 10).count() == 0)
    // carried files still have their g==7 bytes (positions-only vectors
    // are not payload; purge deliberately leaves them) — the REWRITTEN
    // files materialized theirs away
    assert(Sinks.listVersions(tbl) == Seq(live))
  }

  test("no-match purge still expires history (old copies may match)") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 50).select($"id".as("k"))
    Sinks.publishVersioned(df, tbl, None)
    Sinks.publishVersioned(df.filter($"k" >= 10), tbl, Some(0L))
    // live has no k<10, but v0 still does — purge must expire it
    val (purged, rewritten, expired, live) = Sinks.purgeWhere(spark, tbl, "k < 10")
    assert(purged == 0 && rewritten == 0 && expired == 1)
    assert(Sinks.listVersions(tbl) == Seq(live) && live == 1L)
    assert(rawEverything(tbl).filter($"k" < 10).count() == 0)
  }

  test("refusals: tags, equality deletes, empty predicate — each with remedy") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    Sinks.publishVersioned(spark.range(0, 10).select($"id".as("k")), tbl, None)
    Sinks.tagVersion(tbl, "keep", 0L)
    val e = intercept[Exception](Sinks.purgeWhere(spark, tbl, "k < 5"))
    assert(e.getMessage.contains("tags") && e.getMessage.contains("drop_tag"),
      e.getMessage)
    Sinks.dropTag(tbl, "keep")
    val e2 = intercept[Exception](Sinks.purgeWhere(spark, tbl, " "))
    assert(e2.getMessage.contains("predicate"))
    // pending equality deletes: tombstones carry keys — refused
    val eqTbl = s"${tmp()}/eq"
    Sinks.publishVersioned(
      spark.range(0, 10).select($"id".as("k"), lit("x").as("v")), eqTbl, None)
    graft.ops.EqDel.upsertBatch(spark,
      spark.range(0, 3).select($"id".as("k"), lit("y").as("v")), eqTbl, Seq("k"))
    val e3 = intercept[Exception](Sinks.purgeWhere(spark, eqTbl, "k = 1"))
    assert(e3.getMessage.toLowerCase.contains("equality"), e3.getMessage)
  }

  test("partitioned table: partition-scoped purge carries other partitions by inode") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 100)
      .select($"id".as("k"), ($"id" % 4).cast("int").as("p"))
    TableProps.store(tbl, Map(TableProps.PartitionKey -> "p INT"))
    Sinks.publishVersioned(df, tbl, None)
    val preKeys = graft.io.Fs.walkParquet(Paths.get(Sinks.versionPath(tbl, 0)))
      .filterNot(_.toString.contains("p=2")).map(f =>
        Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
    val (purged, _, _, live) = Sinks.purgeWhere(spark, tbl, "p = 2")
    assert(purged == 25)
    val postKeys = fileKeys(Sinks.versionPath(tbl, live))
    assert(preKeys.subsetOf(postKeys), "unaffected partitions must carry by inode")
    assert(Sinks.readCurrent(spark, tbl).filter($"p" === 2).count() == 0)
    // the auditor's check for a partition column is the PATH itself:
    // no p=2 directory survives anywhere under the root
    assert(!graft.io.Fs.walkParquet(Paths.get(tbl))
      .exists(_.toString.contains("p=2")))
  }

  test("CALL system.purge: the SQL door returns the audit row") {
    val root = tmp()
    val cat = "graftpg"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.users AS " +
      "SELECT id AS k, concat('u', id) AS email FROM range(0, 40)")
    spark.sql(s"INSERT INTO $cat.users SELECT id AS k, concat('u', id) AS email " +
      "FROM range(40, 50)")
    val row = spark.sql(
      s"CALL $cat.system.purge('users', where => \"email = 'u7'\")").collect().head
    assert(row.getLong(1) == 1, row.toString) // rows_purged
    assert(row.getLong(3) >= 1) // versions_expired
    assert(spark.sql(s"SELECT count(*) FROM $cat.users").collect().head.getLong(0) == 49)
    assert(spark.sql(s"SELECT count(*) FROM $cat.users WHERE email = 'u7'")
      .collect().head.getLong(0) == 0)
    // history is gone, loudly
    intercept[Exception](
      spark.sql(s"SELECT * FROM $cat.users VERSION AS OF 0").collect())
  }

  test("purge composes with hidden partitioning: derived dirs re-derive, source predicate works") {
    val root = tmp()
    val cat = "graftpgh"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE TABLE $cat.ev (user_id BIGINT, ts TIMESTAMP) " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.ev SELECT id AS user_id, " +
      "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts " +
      "FROM range(0, 96)")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").collect().head.getLong(0) == 96)
    val row = spark.sql(
      s"CALL $cat.system.purge('ev', where => 'user_id % 8 = 3')").collect().head
    assert(row.getLong(1) == 12, row.toString)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev").collect().head.getLong(0) == 84)
    assert(spark.sql(s"SELECT count(*) FROM $cat.ev WHERE user_id % 8 = 3")
      .collect().head.getLong(0) == 0)
    // the hidden day-dirs survive for untouched days' files and the
    // rewritten rows re-derived theirs: a day-ranged read still prunes
    val oneDay = spark.sql(
      s"SELECT count(*) FROM $cat.ev WHERE ts >= timestamp'2024-03-02 00:00:00' " +
        "AND ts < timestamp'2024-03-03 00:00:00'").collect().head.getLong(0)
    assert(oneDay == 21, s"day-2 rows: $oneDay") // 24 - 3 purged (user 11,19? keys 27,35,43 in window)
  }
}
