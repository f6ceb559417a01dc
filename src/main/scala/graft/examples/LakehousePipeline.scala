package graft.examples

import graft.io.Tables
import graft.ops.{Expect, Layout, Merge, Mview, Sinks, Stats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-7 table-format tier composed into one runnable job — the
  * shape of a production ingest-and-serve loop over a stored corpus:
  *
  *   1. quality gate     (Expect.split: clean rows in, violations
  *                        quarantined with triage labels)
  *   2. clustered publish (normalized Z-order on (custkey, day) +
  *                        per-file footer stats, one atomic commit)
  *   3. materialized view (count + cents sum by status × priority)
  *   4. CDC merge         (delta applied in one key join; the merge
  *                        persists its OWN change feed with the commit)
  *   5. O(delta) refresh  (the MV catches up from the feed — no
  *                        snapshot re-diff)
  *   6. skipped read      (a custkey range opens a fraction of files)
  *   7. history           (every step above is a pinned, time-travelable
  *                        version)
  *
  * `sbt "runMain graft.examples.LakehousePipeline [sfDir]"`.
  */
object LakehousePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rootDir = java.nio.file.Files.createTempDirectory("graft_lake")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val (root, mvRoot) = (s"$rootDir/orders", s"$rootDir/orders_mv")

    // 1. gate the incoming snapshot
    val incoming = Tables.orders(spark, sfDir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderpriority"),
      datediff(to_date(col("o_orderdate")), lit("1995-01-01")).as("o_day"),
      round(col("o_totalprice") * 100, 0).cast("long").as("o_cents"))
    val rules = Seq(
      Expect.rule("key_present", col("o_orderkey").isNotNull),
      Expect.rule("cents_positive", col("o_cents") > 0))
    val (clean, quarantined) = Expect.split(incoming, rules)
    println(s"gate: ${clean.count()} clean, ${quarantined.count()} quarantined")

    // 2. clustered + stats-annotated publish (one atomic commit)
    val ext = clean.agg(min("o_custkey"), max("o_custkey"),
      min("o_day"), max("o_day")).head()
    val z = Layout.zorder2(
      Layout.normalize(col("o_custkey"), lit(ext.getLong(0)), lit(ext.getLong(1)), 12),
      Layout.normalize(col("o_day"), lit(ext.getInt(2)), lit(ext.getInt(3)), 12))
    val v0 = Sinks.publishVersioned(
      clean.withColumn("_z", z).repartitionByRange(8, col("_z"))
        .sortWithinPartitions("_z").drop("_z"),
      root, None, statsCols = Seq("o_custkey", "o_day"))
    println(s"v$v0 published, stats on (o_custkey, o_day)")

    // 3. materialize the serving aggregate
    val dims = Seq("o_orderstatus", "o_orderpriority")
    Mview.create(spark, root, mvRoot, dims, Seq("o_cents"))

    // 4. a CDC day: repricing + cancellations, feed persisted
    val delta = clean.filter(col("o_orderkey") % 9 === 0)
      .withColumn("o_cents", expr("o_cents * 11 DIV 10"))
      .withColumn("op", lit("upsert"))
      .unionByName(clean.filter(col("o_orderkey") % 13 === 0)
        .withColumn("op", lit("delete")))
    val v1 = Merge.applyTo(spark, root, Merge.latestPerKey(
        delta, Seq("o_orderkey"), Seq("op")), Seq("o_orderkey"),
      "op", emitChanges = true, statsCols = Seq("o_custkey", "o_day"))
    val feedRows = Sinks.changeFeed(spark, root, v0, v1).map(_.count())
    println(s"v$v1 merged; write-side feed rows: ${feedRows.getOrElse(-1L)}")

    // 5. the MV catches up from the feed, not a snapshot diff
    Mview.refresh(spark, root, mvRoot, Seq("o_orderkey"), dims, Seq("o_cents"))
    val mv = Mview.readCurrent(spark, mvRoot)
    println(s"mv refreshed: ${mv.count()} groups, " +
      s"total cents ${mv.agg(sum("sum_o_cents")).head().getLong(0)}")

    // 6. a selective read opens a fraction of the files
    val live = Sinks.resolve(root)
    val total = graft.io.Fs.listDir(java.nio.file.Paths.get(live))
      .count(_.toString.endsWith(".parquet"))
    val kept = Stats.prunedFiles(spark, live, "o_custkey", 10L, 40L).size
    val n = Stats.readCurrentWhere(spark, root, "o_custkey", 10L, 40L).count()
    println(s"skipped read: $kept of $total files opened, $n rows")

    // 7. every step is a version
    Sinks.history(spark, root).show(truncate = false)
    spark.stop()
  }
}
