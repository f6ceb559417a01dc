package graft

import java.nio.file.Files

import graft.ops.{Dv, Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 (B193): storage-partitioned joins over hidden RANGE grids.
  * `days`/`months`/`years`/`hours`/`truncate` are now catalog
  * ScalarFunctions (the bucket pattern), the scan wrapper reports their
  * KeyGroupedPartitioning, and the builder's implied directory
  * predicates (HiddenPartitionRule's rewrite, shared) prune on the v2
  * path — so range-hidden tables no longer swap to the v1 funnel at
  * all, and two day-partitioned event tables join with zero Exchange:
  * the dominant stream-history shape at 100 TB.
  */
class RangeSpjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): (String, String) = {
    seq += 1
    val cat = s"grspj$seq"
    val root = Files.createTempDirectory("graft_rangespj").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  private def tsCol(i: org.apache.spark.sql.Column) =
    to_timestamp(lit("2026-03-01 00:00:00")) + i * expr("INTERVAL 1 MINUTE")

  test("two day-partitioned event tables join with zero Exchange, exact") {
    val (cat, _) = mkCat()
    import spark.implicits._
    // ~21 days of minutes on each side, joined on the exact instant
    spark.range(0, 30000).select(
      tsCol(col("id").cast("long")).as("ts"), ($"id" * 3).as("a"))
      .createOrReplaceTempView("rspj_l_src")
    spark.range(0, 30000, 2).select(
      tsCol(col("id").cast("long")).as("ts"), ($"id" * 7).as("b"))
      .createOrReplaceTempView("rspj_r_src")
    spark.sql(s"CREATE TABLE $cat.l (ts TIMESTAMP, a BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.l SELECT * FROM rspj_l_src")
    spark.sql(s"CREATE TABLE $cat.r (ts TIMESTAMP, b BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM rspj_r_src")
    // no funnel anywhere: the bare read is the v2 scan, schema hidden
    val df = spark.table(s"$cat.l")
    assert(df.columns.toSeq == Seq("ts", "a"))
    assert(df.queryExecution.executedPlan.toString.contains("BatchScan"),
      "a day-partitioned table must stay on the v2 path (round-15)")
    val expected = spark.table("rspj_l_src")
      .join(spark.table("rspj_r_src"), "ts")
      .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.l").join(spark.table(s"$cat.r"), "ts")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-day-partitioned join must be zero-Exchange:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
        == expected)
    }
  }

  test("v2-path pruning: the implied day/hour predicates reach PartitionFilters") {
    val (cat, _) = mkCat()
    import spark.implicits._
    spark.range(0, 10000).select(
      tsCol(col("id").cast("long")).as("ts"), $"id".as("v"))
      .createOrReplaceTempView("rspj_p_src")
    spark.sql(s"CREATE TABLE $cat.p (ts TIMESTAMP, v BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.p SELECT * FROM rspj_p_src")
    val q = spark.table(s"$cat.p").filter(
      $"ts" >= "2026-03-03 00:00:00" && $"ts" < "2026-03-04 00:00:00")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"must stay v2:\n$plan")
    assert(plan.contains("_tp_ts__day"),
      s"the implied day predicate must reach the scan:\n$plan")
    assert(q.count() == 1440, "one full day of minutes")
    // hour grid: INT directories, epoch-hour math
    spark.sql(s"CREATE TABLE $cat.h (ts TIMESTAMP, v BIGINT) USING parquet " +
      "PARTITIONED BY (hours(ts))")
    spark.range(0, 600).select(
      tsCol(col("id").cast("long")).as("ts"), $"id".as("v"))
      .createOrReplaceTempView("rspj_h_src")
    spark.sql(s"INSERT INTO $cat.h SELECT * FROM rspj_h_src")
    val qh = spark.table(s"$cat.h").filter($"ts" === "2026-03-01 02:30:00")
    assert(qh.queryExecution.executedPlan.toString.contains("_tp_ts__hour"))
    assert(qh.count() == 1)
  }

  test("truncate grid joins shuffle-free; month grid prunes") {
    val (cat, _) = mkCat()
    import spark.implicits._
    (0 until 4000).map(i => (f"c${i % 40}%03d_$i", i.toLong))
      .toDF("code", "x").createOrReplaceTempView("rspj_t_l")
    (0 until 4000 by 3).map(i => (f"c${i % 40}%03d_$i", i.toLong * 2))
      .toDF("code", "y").createOrReplaceTempView("rspj_t_r")
    spark.sql(s"CREATE TABLE $cat.tl (code STRING, x BIGINT) USING parquet " +
      "PARTITIONED BY (truncate(4, code))")
    spark.sql(s"INSERT INTO $cat.tl SELECT * FROM rspj_t_l")
    spark.sql(s"CREATE TABLE $cat.tr (code STRING, y BIGINT) USING parquet " +
      "PARTITIONED BY (truncate(4, code))")
    spark.sql(s"INSERT INTO $cat.tr SELECT * FROM rspj_t_r")
    val expected = spark.table("rspj_t_l").join(spark.table("rspj_t_r"), "code")
      .agg(count(lit(1)).as("n"), sum($"x" + $"y").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.tl").join(spark.table(s"$cat.tr"), "code")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-truncate-partitioned join must be zero-Exchange:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum($"x" + $"y").as("s")).head
        == expected)
    }
    // month grid prunes through the builder's implied predicate
    spark.range(0, 200).select(
      (to_timestamp(lit("2026-01-15 12:00:00")) +
        expr("INTERVAL 1 DAYS") * col("id")).as("ts"), $"id".as("v"))
      .createOrReplaceTempView("rspj_m_src")
    spark.sql(s"CREATE TABLE $cat.m (ts TIMESTAMP, v BIGINT) USING parquet " +
      "PARTITIONED BY (months(ts))")
    spark.sql(s"INSERT INTO $cat.m SELECT * FROM rspj_m_src")
    val qm = spark.table(s"$cat.m")
      .filter($"ts" >= "2026-03-01 00:00:00" && $"ts" < "2026-04-01 00:00:00")
    assert(qm.queryExecution.executedPlan.toString.contains("_tp_ts__month"))
    assert(qm.count() == 31)
  }

  test("a day grid joins a month grid shuffle-free via the calendar-floor reducer") {
    val (cat, _) = mkCat()
    import spark.implicits._
    // ~4 months of hours on the day side; a monthly rollup on the other
    spark.range(0, 3000).select(
      (to_timestamp(lit("2026-01-01 00:00:00")) +
        col("id") * expr("INTERVAL 1 HOUR")).as("ts"), ($"id" * 3).as("a"))
      .createOrReplaceTempView("rspj_dm_l")
    spark.range(0, 3000, 2).select(
      (to_timestamp(lit("2026-01-01 00:00:00")) +
        col("id") * expr("INTERVAL 1 HOUR")).as("ts"), ($"id" * 7).as("b"))
      .createOrReplaceTempView("rspj_dm_r")
    spark.sql(s"CREATE TABLE $cat.dl (ts TIMESTAMP, a BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.dl SELECT * FROM rspj_dm_l")
    spark.sql(s"CREATE TABLE $cat.dr (ts TIMESTAMP, b BIGINT) USING parquet " +
      "PARTITIONED BY (months(ts))")
    spark.sql(s"INSERT INTO $cat.dr SELECT * FROM rspj_dm_r")
    val expected = spark.table("rspj_dm_l").join(spark.table("rspj_dm_r"), "ts")
      .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
    withConfs((spjConfs :+
      ("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true")): _*) {
      val joined = spark.table(s"$cat.dl").join(spark.table(s"$cat.dr"), "ts")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"day ⋈ month must reduce to the coarser grid, zero Exchange:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
        == expected)
    }
  }

  test("the FunctionCatalog serves every transform; unknowns refuse loudly") {
    val (cat, _) = mkCat()
    import org.apache.spark.sql.connector.catalog.{FunctionCatalog, Identifier}
    val fc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[FunctionCatalog]
    val names = fc.listFunctions(Array.empty).map(_.name()).toSet
    assert(names == Set("bucket", "days", "months", "years", "hours", "truncate"),
      s"got $names")
    // every listed name loads; width-in-the-name truncate parses
    names.foreach(n => fc.loadFunction(Identifier.of(Array.empty, n)))
    val t4 = fc.loadFunction(Identifier.of(Array.empty, "truncate_4"))
    assert(t4.name() == "truncate_4")
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException](
      fc.loadFunction(Identifier.of(Array.empty, "nope")))
    intercept[org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException](
      fc.loadFunction(Identifier.of(Array.empty, "truncate_0")))
    // bound temporal functions mirror the writer's UTC epoch math
    import org.apache.spark.sql.types._
    val days = fc.loadFunction(Identifier.of(Array.empty, "days"))
      .bind(StructType(Seq(StructField("ts", TimestampType))))
      .asInstanceOf[org.apache.spark.sql.connector.catalog.functions.ScalarFunction[Integer]]
    // 2026-03-02T01:00:00Z in epoch micros -> epoch day of 2026-03-02
    val micros = java.time.Instant.parse("2026-03-02T01:00:00Z")
      .getEpochSecond * 1000000L
    val expectDay = java.time.LocalDate.parse("2026-03-02").toEpochDay.toInt
    assert(days.produceResult(
      org.apache.spark.sql.catalyst.InternalRow(micros)) == expectDay)
  }

  test("MOR DELETE on a day grid: reader-side subtraction, SPJ survives") {
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.range(0, 20000).select(
      tsCol(col("id").cast("long")).as("ts"), $"id".as("v"))
      .createOrReplaceTempView("rspj_d_src")
    spark.sql(s"CREATE TABLE $cat.d (ts TIMESTAMP, v BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM rspj_d_src")
    spark.sql(s"CREATE TABLE $cat.e (ts TIMESTAMP, w BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts))")
    spark.sql(s"INSERT INTO $cat.e SELECT ts, v * 5 FROM rspj_d_src")
    TableProps.update(s"$root/d")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.d WHERE v % 9 = 4")
    assert(Dv.exists(Sinks.resolve(s"$root/d")), "DELETE must route MOR")
    val expected = spark.table("rspj_d_src").filter($"v" % 9 =!= 4)
      .join(spark.table("rspj_d_src").select($"ts", ($"v" * 5).as("w")), "ts")
      .agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.d").join(spark.table(s"$cat.e"), "ts")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"day-grid SPJ must survive the deletion vector:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum($"v" + $"w").as("s")).head
        == expected)
    }
    assert(spark.table(s"$cat.d").count() ==
      (0L until 20000L).count(_ % 9 != 4))
  }
}
