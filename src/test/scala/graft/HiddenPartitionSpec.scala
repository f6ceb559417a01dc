package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.ops.{Sinks, TableProps, Transforms}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B161 hidden partitioning (Iceberg transform specs): the table
  * partitions by a derived `_tp_<src>__<tag>` column — writers
  * materialize it (re-deriving on every commit so it can never go
  * stale), readers hide it, and [[graft.plans.HiddenPartitionRule]]
  * injects the implied directory predicate so filters on the raw
  * source column partition-prune a spec the user never sees.
  */
class HiddenPartitionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val root: String = {
    val dir = Files.createTempDirectory("graft_hp").toString
    spark.conf.set("spark.sql.catalog.grafthp", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.grafthp.root", dir)
    dir
  }

  /** 200 rows over 20 days (10/day), user_id 0..49, 4 codes; row 199
    * has a NULL ts (the three-valued-filter leg).
    */
  private def mk(name: String): String = {
    import spark.implicits._
    val df = spark.range(0, 200).select(
      $"id".as("k"),
      when($"id" === 199, lit(null).cast("timestamp"))
        .otherwise(expr(
          "timestamp'2024-03-01 06:00:00' + " +
            "make_interval(0, 0, 0, CAST(id % 20 AS INT), 0, 0, 0)")).as("ts"),
      ($"id" % 50).as("user_id"),
      concat(lit("C"), ($"id" % 4).cast("string")).as("code"),
      ($"id" % 7).cast("double").as("value"))
    val tbl = s"$root/$name"
    Sinks.publishVersioned(df.repartition(3), tbl, None)
    tbl
  }

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrite-form repartition to day(ts): derived dirs, hidden schema, pruned reads") {
    val tbl = mk("h1")
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"))
    // the spec records the derived column; the layout has its dirs
    assert(TableProps.partitionCols(tbl) == Seq("_tp_ts__day"))
    assert(graft.io.Fs.listDir(Paths.get(Sinks.resolve(tbl)))
      .exists(_.getFileName.toString.startsWith("_tp_ts__day=")))
    // the reader NEVER sees the derived column
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.columns.toSeq == Seq("k", "ts", "user_id", "code", "value"))
    assert(cur.count() == 200)
    // a range filter on raw ts prunes the hidden directories
    val q = spark.sql(
      "SELECT k FROM grafthp.h1 WHERE ts >= timestamp'2024-03-05 00:00:00' " +
        "AND ts < timestamp'2024-03-08 00:00:00'")
    assert(q.count() == 30)
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters") && plan.contains("_tp_ts__day"),
      plan.take(3000))
  }

  test("CREATE TABLE PARTITIONED BY (days(ts), bucket(8, user_id)) + INSERT + pruning") {
    import spark.implicits._
    val src = mk("h2_src")
    Sinks.readCurrent(spark, src).createOrReplaceTempView("hp_src")
    spark.sql(
      "CREATE TABLE grafthp.h2 USING parquet " +
        "PARTITIONED BY (days(ts), bucket(8, user_id)) " +
        "AS SELECT * FROM hp_src")
    // logical schema hides both derived columns
    assert(spark.table("grafthp.h2").columns.toSeq ==
      Seq("k", "ts", "user_id", "code", "value"))
    spark.sql("INSERT INTO grafthp.h2 VALUES " +
      "(500, timestamp'2024-03-05 12:00:00', 7, 'C9', 1.5)")
    assert(spark.table("grafthp.h2").count() == 201)
    // bucket-equality pruning on the raw user_id
    val q = spark.sql("SELECT k FROM grafthp.h2 WHERE user_id = 7")
    val expect = (0L until 200L).count(_ % 50 == 7) + 1
    assert(q.count() == expect)
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters") && plan.contains("_tp_user_id__b8"),
      plan.take(3000))
    // day pruning composes on the same table
    val q2 = spark.sql("SELECT k FROM grafthp.h2 " +
      "WHERE ts >= timestamp'2024-03-05 00:00:00' AND " +
      "ts < timestamp'2024-03-06 00:00:00' AND user_id = 7")
    assert(planOf(q2).contains("_tp_ts__day"))
    val got = q2.as[Long].collect().toSet
    val want = (0L until 200L)
      .filter(i => i % 20 == 4 && i % 50 == 7).toSet + 500L
    assert(got == want)
  }

  test("pruned results are value-identical to the unpartitioned twin (nulls included)") {
    import spark.implicits._
    val tbl = mk("h3")
    val before = Sinks.readCurrent(spark, tbl)
      .filter($"ts" >= lit(Timestamp.valueOf("2024-03-10 00:00:00")))
      .select("k").as[Long].collect().toSet
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"))
    val after = Sinks.readCurrent(spark, tbl)
      .filter($"ts" >= lit(Timestamp.valueOf("2024-03-10 00:00:00")))
      .select("k").as[Long].collect().toSet
    assert(after == before)
    // IS NULL rows survive un-filtered reads (null ts → null dir value)
    assert(Sinks.readCurrent(spark, tbl).filter($"ts".isNull).count() == 1)
  }

  test("truncate(2, code) prunes string-prefix equality") {
    val tbl = mk("h4")
    Sinks.repartitionTable(spark, tbl, Seq("truncate(2, code)"))
    assert(TableProps.partitionCols(tbl) == Seq("_tp_code__t2"))
    val q = spark.sql("SELECT k FROM grafthp.h4 WHERE code = 'C3'")
    assert(q.count() == 50)
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters") && plan.contains("_tp_code__t2"),
      plan.take(3000))
  }

  test("MOR UPDATE moving the source value moves the row's hidden partition") {
    val tbl = mk("h5")
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"))
    // force MOR and move k=0 (2024-03-01) to a far day
    spark.sql("UPDATE grafthp.h5 SET ts = timestamp'2024-06-01 00:00:00' WHERE k = 0")
    val q = spark.sql("SELECT k FROM grafthp.h5 " +
      "WHERE ts >= timestamp'2024-06-01 00:00:00'")
    assert(q.collect().map(_.getLong(0)).toSeq == Seq(0L),
      "the updated copy must be findable through the PRUNED read " +
        "(stale derivation would leave it in the old directory)")
    assert(planOf(q).contains("_tp_ts__day"))
    // and the old day no longer serves it
    assert(spark.sql("SELECT count(*) FROM grafthp.h5 " +
      "WHERE ts >= timestamp'2024-03-01 00:00:00' AND " +
      "ts < timestamp'2024-03-02 00:00:00'").collect().head.getLong(0) == 9)
  }

  test("metadata-only evolve TO a hidden spec: leg + pruned top layout") {
    import spark.implicits._
    val tbl = mk("h6")
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"), metadataOnly = true)
    assert(TableProps.partitionCols(tbl) == Seq("_tp_ts__day"))
    // append lands under the hidden spec; the leg stays flat
    val extra = Seq((600L, Timestamp.valueOf("2024-03-02 10:00:00"),
      3L, "C1", 2.0)).toDF("k", "ts", "user_id", "code", "value")
    Sinks.appendVersioned(extra, tbl, Sinks.currentVersion(tbl))
    val live = Paths.get(Sinks.resolve(tbl))
    assert(graft.io.Fs.listDir(live)
      .exists(_.getFileName.toString.startsWith("_tp_ts__day=")))
    assert(Files.isDirectory(live.resolve("_layout0")))
    val all = Sinks.readCurrent(spark, tbl)
    assert(all.count() == 201 &&
      all.columns.toSeq == Seq("k", "ts", "user_id", "code", "value"))
    // the filter prunes the top layout's hidden dirs (the leg is flat
    // and serves ts from file contents)
    val q = spark.sql("SELECT k FROM grafthp.h6 " +
      "WHERE ts >= timestamp'2024-03-02 00:00:00' AND " +
      "ts < timestamp'2024-03-03 00:00:00'")
    assert(q.count() == 11)
    assert(planOf(q).contains("_tp_ts__day"))
  }

  test("reserved-namespace and transform refusals") {
    import spark.implicits._
    val bad = Seq((1L, "x")).toDF("k", "_tp_k__day")
    intercept[IllegalArgumentException](
      Sinks.publishVersioned(bad, s"$root/hbad", None))
    val tbl = mk("h7")
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("day(code)"))) // wrong type
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("week(ts)"))) // unsupported
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("hour(code)"))) // wrong type
    intercept[IllegalArgumentException](
      Sinks.repartitionTable(spark, tbl, Seq("day(nope)"))) // no source
  }

  test("derived-name parse is TOTAL: malformed shapes are identity, not a crash") {
    import spark.implicits._
    // zero / overflowing tag parameters must parse to None …
    assert(Transforms.parse("_tp_x__b0").isEmpty)
    assert(Transforms.parse("_tp_x__t0").isEmpty)
    assert(Transforms.parse("_tp_x__b99999999999").isEmpty)
    assert(Transforms.parse("_tp_x__w3").isEmpty)
    assert(Transforms.parse("_tp_x__b8").contains(Transforms.Bucket(8, "x")))
    assert(Transforms.parse("_tp_ts__hour").contains(Transforms.Hour("ts")))
    // … and a NON-Graft frame carrying such a column name must not
    // crash the optimizer (HiddenPartitionRule parses every Filter
    // child's attributes session-wide, round-12 advisor finding)
    val df = Seq((1L, "a"), (2L, "b")).toDF("a", "_tp_x__b0")
      .filter($"a" > 0)
    assert(df.count() == 2)
    val df2 = Seq((1L, "a")).toDF("a", "_tp_x__b99999999999").filter($"a" > 0)
    assert(df2.count() == 1)
  }

  test("hour(ts): epoch-hour dirs, hidden schema, range pruning, SQL CALL door") {
    val tbl = mk("h11")
    // the SQL door with a PARAMETERIZED transform in the same list — the
    // comma inside bucket(4, user_id) must survive the split
    spark.sql("CALL grafthp.system.repartition_table(table => 'h11', " +
      "partition_by => 'hour(ts), bucket(4, user_id)')")
    assert(TableProps.partitionCols(tbl) == Seq("_tp_ts__hour", "_tp_user_id__b4"))
    assert(graft.io.Fs.listDir(Paths.get(Sinks.resolve(tbl)))
      .exists(_.getFileName.toString.startsWith("_tp_ts__hour=")))
    val cur = Sinks.readCurrent(spark, tbl)
    assert(cur.columns.toSeq == Seq("k", "ts", "user_id", "code", "value"))
    assert(cur.count() == 200)
    // range filter on raw ts prunes epoch-hour directories
    val q = spark.sql(
      "SELECT k FROM grafthp.h11 WHERE ts >= timestamp'2024-03-05 00:00:00' " +
        "AND ts < timestamp'2024-03-08 00:00:00'")
    assert(q.count() == 30)
    val plan = planOf(q)
    assert(plan.contains("PartitionFilters") && plan.contains("_tp_ts__hour"),
      plan.take(3000))
    // bucket equality composes through the same paren-aware CALL spec
    val q2 = spark.sql("SELECT k FROM grafthp.h11 WHERE user_id = 7")
    assert(q2.count() == (0L until 200L).count(_ % 50 == 7))
    assert(planOf(q2).contains("_tp_user_id__b4"))
  }

  test("day(ts) written under UTC reads correctly (and pruned) from another timezone") {
    import spark.implicits._
    // rows late in the UTC day (21:00Z), one per day — in any zone east
    // of UTC their wall-clock date differs from their UTC directory
    val df = spark.range(0, 20).select(
      $"id".as("k"),
      expr("timestamp'2024-03-01 21:00:00' + " +
        "make_interval(0, 0, 0, CAST(id AS INT), 0, 0, 0)").as("ts"))
    val tbl = s"$root/h12"
    Sinks.publishVersioned(df, tbl, None)
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"))
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      // Tokyo 2024-03-06 05:00 = 2024-03-05T20:00Z: the only matching
      // row (2024-03-05T21:00Z, k=4) lives in UTC directory 2024-03-05
      // — a session-zone image (wall date 03-06) would prune it away
      val q = spark.sql(
        "SELECT k FROM grafthp.h12 WHERE " +
          "ts >= timestamp'2024-03-06 05:00:00' AND " +
          "ts < timestamp'2024-03-07 05:00:00'")
      assert(q.as[Long].collect().toSet == Set(4L),
        "UTC-pinned day images must keep the boundary-day directory")
      val plan = planOf(q)
      assert(plan.contains("PartitionFilters") && plan.contains("_tp_ts__day"),
        plan.take(3000))
      // writes from the flipped session derive the SAME UTC directories
      Sinks.appendVersioned(
        Seq((100L, java.time.Instant.parse("2024-03-25T23:30:00Z")))
          .toDF("k", "ts").withColumn("ts", $"ts".cast("timestamp")),
        tbl, Sinks.currentVersion(tbl))
      val live = Paths.get(Sinks.resolve(tbl))
      assert(graft.io.Fs.listDir(live)
        .exists(_.getFileName.toString == "_tp_ts__day=2024-03-25"),
        "derivation must be UTC-pinned regardless of the writer session zone")
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("DROP COLUMN of a transform source is refused (writers would brick)") {
    mk("h10")
    Sinks.repartitionTable(spark, s"$root/h10", Seq("day(ts)"))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE grafthp.h10 DROP COLUMN ts"))
    assert(e.getMessage.contains("day(ts)"), e.getMessage)
    // the table still reads and writes
    spark.sql("INSERT INTO grafthp.h10 VALUES " +
      "(700, timestamp'2024-03-04 01:00:00', 1, 'C0', 0.0)")
    assert(spark.table("grafthp.h10").count() == 201)
  }

  test("compaction keeps the hidden spec and re-lays by it") {
    import spark.implicits._
    val tbl = mk("h8")
    Sinks.repartitionTable(spark, tbl, Seq("day(ts)"))
    val extra = Seq((600L, Timestamp.valueOf("2024-03-19 08:00:00"),
      1L, "C2", 3.0)).toDF("k", "ts", "user_id", "code", "value")
    Sinks.appendVersioned(extra, tbl, Sinks.currentVersion(tbl))
    Sinks.compactVersioned(spark, tbl)
    val live = Paths.get(Sinks.resolve(tbl))
    assert(graft.io.Fs.listDir(live)
      .exists(_.getFileName.toString.startsWith("_tp_ts__day=")))
    assert(Sinks.readCurrent(spark, tbl).count() == 201)
    // pruned count == the funnel's own filter count, post-compaction
    val cutoff = Timestamp.valueOf("2024-03-15 00:00:00")
    val want = Sinks.readCurrent(spark, tbl)
      .filter($"ts" >= lit(cutoff)).count()
    val q = spark.sql("SELECT count(*) FROM grafthp.h8 " +
      "WHERE ts >= timestamp'2024-03-15 00:00:00'")
    assert(q.collect().head.getLong(0) == want)
  }

  test("DESCRIBE surfaces the transform partitioning") {
    mk("h9")
    Sinks.repartitionTable(spark, s"$root/h9", Seq("day(ts)", "bucket(4, user_id)"))
    val part = spark.sql("DESCRIBE TABLE EXTENDED grafthp.h9")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(part.contains("days(ts)") && part.contains("bucket(4, user_id)"),
      part)
  }
}
