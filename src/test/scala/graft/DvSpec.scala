package graft

import java.nio.file.{Files, Paths}

import graft.ops.{Dv, Sinks, Stats, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B135 merge-on-read DELETE via deletion vectors ([[Sinks.deleteVector]],
  * [[graft.plans.DvReadRule]], the `_dv` sidecar): deletes record row
  * positions, data files never rewrite, every reader subtracts, and the
  * raw-read paths that cannot subtract refuse loudly.
  */
class DvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String = Files.createTempDirectory("graft_dv").toString

  private def dataFileKeys(dir: String): Set[Object] =
    graft.io.Fs.walkParquet(Paths.get(dir)).map(f =>
      Files.readAttributes(f,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet

  test("MOR delete: rows vanish, zero data files rewrite, history keeps them") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 100).select($"id".as("k"), ($"id" % 10).as("g"))
    Sinks.publishVersioned(df.repartition(4), tbl, None)
    val v0Keys = dataFileKeys(Sinks.versionPath(tbl, 0))
    val v = Sinks.deleteVector(spark, tbl, col("g") === 7)
    assert(v == 1L)
    // every data file of v1 IS a v0 file (hardlink carry, nothing rewritten)
    assert(dataFileKeys(Sinks.versionPath(tbl, 1)).subsetOf(v0Keys))
    assert(Dv.exists(Sinks.versionPath(tbl, 1)))
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 90 && cur.filter($"g" === 7).count() == 0)
    // time travel to v0 still sees everything
    assert(Sinks.readVersion(spark, tbl, 0).count() == 100)
    // second delete merges vectors, still zero rewrites
    Sinks.deleteVector(spark, tbl, col("k") < 5)
    assert(dataFileKeys(Sinks.versionPath(tbl, 2)).subsetOf(v0Keys))
    val cur2 = Sinks.readCurrent(spark, tbl)
    assert(cur2.count() == 85)
    assert(cur2.agg(min("k")).head().getLong(0) == 5L)
    // DESCRIBE HISTORY's operation column tells the story
    assert(Sinks.history(spark, tbl).orderBy("version")
      .select("operation").collect().map(_.getString(0)).toSeq ==
      Seq("publish", "mor-dml", "mor-dml"))
  }

  test("NULL condition keeps the row (SQL three-valued delete semantics)") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = Seq[(Long, java.lang.Long)]((1L, 10L), (2L, null), (3L, 30L))
      .toDF("k", "v")
    Sinks.publishVersioned(df, tbl, None)
    Sinks.deleteVector(spark, tbl, col("v") > 15)
    val left = Sinks.readCurrent(spark, tbl).orderBy("k").collect()
    assert(left.map(_.getLong(0)).toSeq == Seq(1L, 2L),
      "NULL > 15 is unknown — the row must survive")
  }

  test("SQL door: property-routed MOR DELETE, subtracted SELECT, time travel, counts") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.graftdv", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdv.root", root)
    import spark.implicits._
    val df = spark.range(0, 60).select($"id".as("k"), ($"id" % 6).as("g"))
    val tbl = s"$root/t"
    Sinks.publishVersioned(df.repartition(3), tbl, None, statsCols = Seq("k"))
    TableProps.update(tbl)(_ + ("graft.dml.mode" -> "mor"))
    val keys0 = dataFileKeys(Sinks.versionPath(tbl, 0))
    spark.sql("DELETE FROM graftdv.t WHERE g = 2")
    assert(Dv.exists(Sinks.resolve(tbl)), "SQL DELETE must route merge-on-read")
    assert(dataFileKeys(Sinks.resolve(tbl)).subsetOf(keys0))
    // SQL read subtracts (DvReadRule)
    assert(spark.sql("SELECT * FROM graftdv.t").count() == 50)
    assert(spark.sql("SELECT * FROM graftdv.t WHERE g = 2").count() == 0)
    // filters still push into the scan of the swapped plan
    val q = spark.sql("SELECT k FROM graftdv.t WHERE k = 11")
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"))
    assert(q.count() == 1)
    // time travel: v0 full, under the ordinary scan
    assert(spark.sql("SELECT * FROM graftdv.t VERSION AS OF 0").count() == 60)
    // count(*): answered from METADATA even under the vector — sidecar
    // rows minus vector cardinality (the Delta stats-minus-DV count);
    // the plan collapses to a LocalRelation, zero files open
    val cnt = spark.sql("SELECT count(*) AS n FROM graftdv.t")
    assert(cnt.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    }.isDefined, s"\n${cnt.queryExecution.optimizedPlan}")
    assert(cnt.head().getLong(0) == 50)
    // per-column counts and bounds still decline (which rows the vector
    // hides is unknowable from metadata) — served by the subtracted scan
    val mn = spark.sql("SELECT min(k) AS m FROM graftdv.t")
    assert(mn.queryExecution.optimizedPlan.collectFirst {
      case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => true
    }.isEmpty)
    assert(mn.head().getLong(0) == 0L)
  }

  test("appends carry the vector; deleted rows stay deleted next to new rows") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 40).select($"id".as("k"), ($"id" % 4).as("g"))
    Sinks.publishVersioned(df, tbl, None)
    Sinks.deleteVector(spark, tbl, col("g") === 1)
    Sinks.appendVersioned(
      spark.range(1000, 1010).select($"id".as("k"), lit(1L).as("g")),
      tbl, Sinks.currentVersion(tbl))
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 40)
    assert(cur.filter($"g" === 1 && $"k" < 1000).count() == 0,
      "appending must not resurrect MOR-deleted rows")
    assert(cur.filter($"k" >= 1000).count() == 10)
  }

  test("compaction purges the vector; COW publish refuses; stats fast path subtracts") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 50).select($"id".as("k"), ($"id" % 5).as("g"))
    Sinks.publishVersioned(df.repartition(2), tbl, None, statsCols = Seq("k"))
    Sinks.deleteVector(spark, tbl, col("g") === 0)
    // a direct COW publish (raw touched-file reads) refuses while the
    // vector exists — SQL DML routes MOR instead
    val e = intercept[IllegalArgumentException](
      Sinks.cowPublish(spark, tbl, Sinks.currentVersion(tbl).get,
        Set("nope"), Sinks.readCurrent(spark, tbl).limit(0)))
    assert(e.getMessage.contains("compact"))
    // the stats-pruned fast path SUBTRACTS (no refusal, no resurrection)
    val pruned = Stats.readWhere(spark, Sinks.resolve(tbl), "k", 0L, 10L)
    assert(pruned.count() ==
      df.filter($"k".between(0, 10) && $"g" =!= 0).count())
    assert(pruned.filter($"g" === 0).count() == 0,
      "pruned fast path must not resurrect MOR-deleted rows")
    Sinks.compactVersioned(spark, tbl, targetBytes = 64L * 1024 * 1024)
    assert(!Dv.exists(Sinks.resolve(tbl)), "compaction is the purge")
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 40 && cur.filter($"g" === 0).count() == 0)
  }

  test("the MOR commit's change feed is exactly the newly deleted rows") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 30).select($"id".as("k"), ($"id" % 3).as("g"))
    Sinks.publishVersioned(df, tbl, None)
    Sinks.deleteVector(spark, tbl, col("g") === 2)
    val feed = spark.read.parquet(s"${Sinks.versionPath(tbl, 1)}/_changes")
    assert(feed.count() == 10)
    assert(feed.select("_change_type").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("delete"))
    // re-deleting the same predicate adds an EMPTY delta (no re-deletes)
    Sinks.deleteVector(spark, tbl, col("g") === 2)
    assert(spark.read.parquet(s"${Sinks.versionPath(tbl, 2)}/_changes").count() == 0)
    // the snapshot diff agrees with the feed
    val diff = Sinks.changesBetween(spark, tbl, 0L, 1L, Seq("k"))
    assert(diff.filter($"_change_type" === "delete").count() == 10)
  }

  test("MOR UPDATE: old copies vanish behind the vector, new copies land as the only new files") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 60).select($"id".as("k"), ($"id" % 6).as("g"),
      lit(1.0).as("w"))
    Sinks.publishVersioned(df.repartition(3), tbl, None)
    val keys0 = dataFileKeys(Sinks.versionPath(tbl, 0))
    Sinks.updateVector(spark, tbl, col("g") === 4,
      Map("w" -> lit(9.5), "g" -> lit(40L)))
    val v1 = Sinks.versionPath(tbl, 1)
    // carried files are v0's; the only NEW files hold the updated copies
    val newFiles = dataFileKeys(v1) -- keys0
    assert(newFiles.nonEmpty && (dataFileKeys(v1) -- newFiles) == keys0)
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 60)
    assert(cur.filter($"g" === 4).count() == 0)
    assert(cur.filter($"g" === 40L && $"w" === 9.5).count() == 10)
    // history: v0 untouched
    assert(Sinks.readVersion(spark, tbl, 0).filter($"g" === 4).count() == 10)
    // feed carries full pre/post pairs
    val feed = spark.read.parquet(s"$v1/_changes")
    assert(feed.filter($"_change_type" === "update_preimage").count() == 10)
    assert(feed.filter($"_change_type" === "update_postimage" && $"g" === 40L).count() == 10)
  }

  test("SQL MOR UPDATE routes by property, subtracts on read, and CHECKs gate the copies") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.graftdvu", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdvu.root", root)
    import spark.implicits._
    val tbl = s"$root/t"
    Sinks.publishVersioned(
      spark.range(0, 30).select($"id".as("k"), ($"id" % 3).as("g")),
      tbl, None)
    TableProps.update(tbl)(_ ++ Map(
      "graft.dml.mode" -> "mor", "check.small" -> "g < 100"))
    val keys0 = dataFileKeys(Sinks.versionPath(tbl, 0))
    spark.sql("UPDATE graftdvu.t SET g = g + 10 WHERE g = 1")
    assert(graft.ops.Dv.exists(Sinks.resolve(tbl)),
      "SQL UPDATE must route merge-on-read")
    assert(keys0.subsetOf(dataFileKeys(Sinks.resolve(tbl))))
    assert(spark.sql("SELECT * FROM graftdvu.t WHERE g = 1").count() == 0)
    assert(spark.sql("SELECT * FROM graftdvu.t WHERE g = 11").count() == 10)
    assert(spark.sql("SELECT count(*) AS n FROM graftdvu.t").head().getLong(0) == 30)
    // a CHECK-violating assignment aborts before any commit
    val vBefore = Sinks.currentVersion(tbl)
    intercept[Exception](spark.sql("UPDATE graftdvu.t SET g = 500 WHERE g = 2"))
    assert(Sinks.currentVersion(tbl) == vBefore,
      "failed CHECK must leave no new version")
    // a second MOR update stacks on the existing vector
    spark.sql("UPDATE graftdvu.t SET g = 99 WHERE g = 11")
    assert(spark.sql("SELECT * FROM graftdvu.t WHERE g = 99").count() == 10)
    assert(spark.sql("SELECT count(*) AS n FROM graftdvu.t").head().getLong(0) == 30)
  }

  test("MOR MERGE: update+delete+insert in one vector commit, value-identical to the COW path") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.graftdvm", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdvm.root", root)
    import spark.implicits._
    val base = spark.range(0, 30).select($"id".as("k"), ($"id" % 3).as("g"),
      $"id".cast("double").as("w"))
    // twin tables: same content, one merge-on-read, one copy-on-write
    Sinks.publishVersioned(base.repartition(3), s"$root/morT", None)
    Sinks.publishVersioned(base.repartition(3), s"$root/cowT", None)
    TableProps.update(s"$root/morT")(_ + ("graft.dml.mode" -> "mor"))
    Seq((1L, "u", 100.0), (4L, "u", 400.0), (2L, "d", 0.0), (5L, "d", 0.0),
      (100L, "i", 500.0)).toDF("k", "op", "nw")
      .createOrReplaceTempView("dv_merge_src")
    val mergeSql = (tbl: String) =>
      s"""MERGE INTO graftdvm.$tbl t USING dv_merge_src s ON t.k = s.k
         |WHEN MATCHED AND s.op = 'u' THEN UPDATE SET w = s.nw
         |WHEN MATCHED AND s.op = 'd' THEN DELETE
         |WHEN NOT MATCHED THEN INSERT (k, g, w) VALUES (s.k, 9, s.nw)""".stripMargin
    val keys0 = dataFileKeys(Sinks.versionPath(s"$root/morT", 0))
    spark.sql(mergeSql("morT"))
    spark.sql(mergeSql("cowT"))
    assert(Dv.exists(Sinks.resolve(s"$root/morT")), "MERGE must route merge-on-read")
    // every original file carried untouched; new files = copies + inserts
    assert(keys0.subsetOf(dataFileKeys(Sinks.resolve(s"$root/morT"))))
    val mor = spark.sql("SELECT * FROM graftdvm.morT").orderBy("k", "w").collect()
    val cow = spark.sql("SELECT * FROM graftdvm.cowT").orderBy("k", "w").collect()
    assert(mor.toSeq == cow.toSeq,
      s"MOR and COW MERGE diverged:\nmor=${mor.mkString(",")}\ncow=${cow.mkString(",")}")
    assert(mor.length == 29)
    // feed parity: insert, 2 deletes, 2 update pairs
    val feed = spark.read.parquet(s"${Sinks.resolve(s"$root/morT")}/_changes")
    assert(feed.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("insert" -> 1L, "delete" -> 2L,
        "update_preimage" -> 2L, "update_postimage" -> 2L))
    // metadata count still fires on the vectored table
    val cnt = spark.sql("SELECT count(*) AS n FROM graftdvm.morT")
    assert(cnt.head().getLong(0) == 29)
  }

  test("MOR MERGE: WHEN NOT MATCHED BY SOURCE and cardinality refusal") {
    val root = tmp()
    spark.conf.set("spark.sql.catalog.graftdvn", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graftdvn.root", root)
    import spark.implicits._
    Sinks.publishVersioned(
      spark.range(0, 10).select($"id".as("k"), lit(0L).as("tag")),
      s"$root/t", None)
    TableProps.update(s"$root/t")(_ + ("graft.dml.mode" -> "mor"))
    Seq(3L, 4L).toDF("k").createOrReplaceTempView("dv_nmbs_src")
    spark.sql(
      """MERGE INTO graftdvn.t t USING dv_nmbs_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET tag = 1
        |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET tag = -1""".stripMargin)
    val out = spark.sql("SELECT * FROM graftdvn.t").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 1L && out(4L) == 1L)
    assert((out.keySet -- Set(3L, 4L)).forall(out(_) == -1L))
    assert(out.size == 10)
    // a duplicated source key refuses with the SQL cardinality error
    Seq(3L, 3L).toDF("k").createOrReplaceTempView("dv_dup_src")
    val e = intercept[Exception](spark.sql(
      """MERGE INTO graftdvn.t t USING dv_dup_src s ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET tag = 2""".stripMargin))
    assert(e.getMessage.contains("cardinality") ||
      e.getMessage.contains("more than one"))
  }

  test("the exactly-once streaming sink composes with MOR: batches append past the vector") {
    val dir = tmp()
    val tbl = s"$dir/t"
    import spark.implicits._
    Sinks.publishVersioned(
      spark.range(0, 20).select($"id".as("k"), ($"id" % 2).as("g")), tbl, None)
    Sinks.deleteVector(spark, tbl, col("g") === 1)
    // a streaming micro-batch lands as a linked append; the carry must
    // bring the vector along so deleted rows stay deleted
    val src = s"$dir/src"
    Seq((1000L, 5L), (1001L, 5L)).toDF("k", "g")
      .coalesce(1).write.mode("append").parquet(src)
    val q = graft.ops.TableStream.streamTo(
      spark.readStream.schema("k LONG, g LONG").parquet(src), tbl, s"$dir/ckpt")
    q.processAllAvailable(); q.stop()
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 12, s"10 survivors + 2 streamed, got ${cur.count()}")
    assert(cur.filter($"g" === 1).count() == 0,
      "a streamed append must not resurrect MOR-deleted rows")
    assert(cur.filter($"g" === 5).count() == 2)
  }

  test("RESTORE carries the vector; partitioned layouts (encoded values) subtract exactly") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 24).select($"id".as("k"),
      concat(lit("grp "), ($"id" % 3).cast("string")).as("part"))
    TableProps.store(tbl, Map(TableProps.PartitionKey -> "part STRING"))
    Sinks.publishVersioned(df, tbl, None)
    Sinks.deleteVector(spark, tbl, col("k") % 2 === 0)
    assert(Sinks.readCurrent(spark, tbl).count() == 12)
    // the partition value contains a space — the stored key is the
    // URI-encoded subpath, consistent between build and subtract
    assert(Sinks.readCurrent(spark, tbl).filter($"k" % 2 === 0).count() == 0)
    Sinks.publishVersioned(df.limit(5), tbl, Some(1L)) // unrelated v2
    Sinks.restoreVersion(spark, tbl, 1L)
    assert(Dv.exists(Sinks.resolve(tbl)), "restore must carry the vector")
    assert(Sinks.readCurrent(spark, tbl).count() == 12)
  }

  private def dvPartKeys(versionDir: String): Map[String, Object] =
    graft.io.Fs.listDir(Paths.get(versionDir, Dv.Sidecar))
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(f => f.getFileName.toString -> Files.readAttributes(f,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
      .toMap

  test("delete churn: per-commit sidecar bytes stay O(matched), parts fold at the threshold") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 2000).select($"id".as("k"), ($"id" % 40).as("g"))
    Sinks.publishVersioned(df.repartition(4), tbl, None)
    val dataKeys = dataFileKeys(Sinks.versionPath(tbl, 0))
    val rounds = 40
    var maxNewBytes = 0L
    var maxParts = 0
    (0 until rounds).foreach { i =>
      val v = Sinks.deleteVector(spark, tbl, col("g") === i)
      val dir = Sinks.versionPath(tbl, v)
      // zero data rewrite, every commit
      assert(dataFileKeys(dir).subsetOf(dataKeys))
      val parts = dvPartKeys(dir)
      val prevParts: Set[Object] =
        if (v == 1) Set.empty
        else dvPartKeys(Sinks.versionPath(tbl, v - 1)).values.toSet
      // commit bytes = parts NOT hardlink-shared with the previous
      // version's sidecar — must be O(this commit's 50 matched rows),
      // never the cumulative vector
      val newBytes = graft.io.Fs.listDir(Paths.get(dir, Dv.Sidecar))
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .filter(f => !prevParts.contains(Files.readAttributes(f,
          classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()))
        .map(Files.size).sum
      maxNewBytes = math.max(maxNewBytes, newBytes)
      maxParts = math.max(maxParts, parts.size)
    }
    // each delta is ~50 positions over 4 files; a cumulative rewrite
    // would grow linearly to ~2000 positions. The fold commit rewrites
    // the pile once (still small); nothing should approach data scale.
    assert(maxNewBytes < 64 * 1024, s"per-commit dv bytes grew to $maxNewBytes")
    // the checkpoint fold keeps reader-side part counts bounded
    assert(maxParts <= Sinks.StatsCheckpointEvery + 1,
      s"dv parts grew unbounded: $maxParts")
    val finalV = Sinks.currentVersion(tbl).get
    assert(maxParts > 2, "expected the pile to actually accumulate between folds")
    // correctness after 40 vector commits
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.count() == 0L || rounds < 40) // all 40 groups deleted
    assert(Dv.cardinality(spark, Sinks.versionPath(tbl, finalV)) == 2000L)
    // history: an intermediate version still subtracts exactly
    assert(Sinks.readVersion(spark, tbl, 20).count() == 2000 - 20 * 50)
  }

  test("subtraction is join-free: no Exchange, no join — even with auto-broadcast disabled") {
    // the round-10 verdict's finding #2: the old anti-join silently fell
    // to a full sort-merge shuffle of the scan once the expanded vector
    // outgrew autoBroadcastJoinThreshold. The bitmap-probe filter adds
    // NO join and NO Exchange at ANY threshold — assert under the
    // adversarial setting (auto-broadcast off entirely).
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    Sinks.publishVersioned(
      spark.range(0, 200).select($"id".as("k"), ($"id" % 10).as("g"))
        .repartition(4), tbl, None)
    Sinks.deleteVector(spark, tbl, col("g") === 3)
    val old = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Sinks.readCurrent(spark, tbl)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"DV subtraction added an Exchange to the scan:\n$plan")
      assert(!plan.toLowerCase.contains("join"),
        s"DV subtraction still joins:\n$plan")
      assert(plan.contains("dv_probe"),
        s"expected the codegen'd dv_probe filter in:\n$plan")
      // and it still subtracts correctly under that plan
      assert(df.count() == 180 && df.filter($"g" === 3).count() == 0)
    } finally old match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("oversized-vector fallback: past the probe byte budget, subtraction routes a distributed anti-join — values identical") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    Sinks.publishVersioned(
      spark.range(0, 200).select($"id".as("k"), ($"id" % 10).as("g"))
        .repartition(4), tbl, None)
    Sinks.deleteVector(spark, tbl, col("g") === 3)
    spark.conf.set("graft.dv.maxProbeBytes", "0")
    try {
      val df = Sinks.readCurrent(spark, tbl)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("dv_probe"),
        s"budget 0 must route the anti-join, not the probe:\n$plan")
      assert(plan.toLowerCase.contains("leftanti"),
        s"expected the distributed anti-join fallback in:\n$plan")
      assert(df.count() == 180 && df.filter($"g" === 3).count() == 0)
      // the MOR writer takes the same fallback and still deletes exactly
      Sinks.deleteVector(spark, tbl, col("k") === 0L)
      assert(Sinks.readCurrent(spark, tbl).count() == 179)
    } finally spark.conf.unset("graft.dv.maxProbeBytes")
  }

  test("legacy v1 (file,row_index) sidecars read exactly and fold to v2 on the next MOR commit") {
    val tbl = s"${tmp()}/t"
    import spark.implicits._
    val df = spark.range(0, 100).select($"id".as("k"), ($"id" % 10).as("g"))
    Sinks.publishVersioned(df.repartition(2), tbl, None)
    // hand-craft a v1-format vector: delete g==3 by positions, written
    // as row-per-position parquet exactly as pre-upgrade commits did
    val dir = Sinks.versionPath(tbl, 0)
    val legacy = spark.read.parquet(dir)
      .select(col("g"), col("_metadata.file_path").as("fp"),
        col("_metadata.row_index").as("row_index"))
      .filter(col("g") === 3)
      .select(expr(s"substring(fp, ${s"file:$dir/".length + 1})").as("file"),
        col("row_index"))
    legacy.coalesce(1).write.parquet(s"$dir/${Dv.Sidecar}")
    // reads subtract the legacy vector
    assert(Sinks.readCurrent(spark, tbl).count() == 90)
    assert(Dv.cardinality(spark, dir) == 10)
    // the next MOR commit folds to v2: single part, bitmap schema,
    // both the old and the new deletions apply
    Sinks.deleteVector(spark, tbl, col("g") === 5)
    val v1dir = Sinks.versionPath(tbl, 1)
    val schema = spark.read.parquet(s"$v1dir/${Dv.Sidecar}").schema.fieldNames.toSet
    assert(schema == Set("file", "bitmap"), s"expected v2 fold, got $schema")
    assert(Sinks.readCurrent(spark, tbl).count() == 80)
    assert(Dv.cardinality(spark, v1dir) == 20)
  }
}
