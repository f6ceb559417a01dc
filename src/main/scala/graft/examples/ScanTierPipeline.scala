package graft.examples

import graft.io.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-14 scan tier composed into one runnable job — the plan
  * decisions a 100 TB star schema lives or dies by, all made by the
  * engine's own metadata:
  *
  *   1. defaults + native  (CREATE TABLE with DEFAULT columns and a
  *      CHECK constraint    native CONSTRAINT … CHECK — B190/B191 —
  *      DDL)                gate the ingest without writer cooperation)
  *   2. co-bucketed layout (facts PARTITIONED BY (bucket(16, key)):
  *                          the high-cardinality co-location)
  *   3. shuffle-free join  (the fact⋈fact join runs with ZERO
  *                          Exchange — storage-partitioned join, B189)
  *   4. exact plan stats   (the dimension broadcast is decided by
  *                          sidecar-exact rows×width, not compressed-
  *                          byte guesses — B185)
  *   5. runtime pruning    (a filtered dim prunes the identity-
  *                          partitioned fact's directories at RUNTIME —
  *                          DPP through the v2 scan, B188)
  *   6. metadata tables    (history / partitions / files read as SQL
  *                          relations for the closing dashboard — B187)
  *
  * `sbt "runMain graft.examples.ScanTierPipeline [sfDir]"`.
  */
object ScanTierPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rootDir = java.nio.file.Files.createTempDirectory("graft_scantier")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    spark.conf.set("spark.sql.catalog.star", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.star.root", s"$rootDir/wh")

    // 1. DDL: co-bucketed facts, a defaulted + constrained dimension
    spark.sql("CREATE TABLE star.orders (o_orderkey BIGINT, o_custkey BIGINT) " +
      "USING parquet PARTITIONED BY (bucket(16, o_orderkey))")
    spark.sql("CREATE TABLE star.lineitem (l_orderkey BIGINT, l_linenumber INT) " +
      "USING parquet PARTITIONED BY (bucket(16, l_orderkey))")
    spark.sql("CREATE TABLE star.cust (c_custkey BIGINT, " +
      "tier STRING DEFAULT 'standard', c_nationkey INT, " +
      "CONSTRAINT key_pos CHECK (c_custkey >= 0)) " +
      "USING parquet PARTITIONED BY (c_nationkey) " +
      "TBLPROPERTIES ('graft.stats.columns' = 'c_custkey')")

    // 2. ingest (the dim INSERT omits `tier` — the default fills it)
    Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_custkey"))
      .createOrReplaceTempView("src_orders")
    Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_linenumber"))
      .createOrReplaceTempView("src_lineitem")
    Tables.customer(spark, sfDir).select(col("c_custkey"), col("c_nationkey"))
      .createOrReplaceTempView("src_cust")
    spark.sql("INSERT INTO star.orders SELECT * FROM src_orders")
    spark.sql("INSERT INTO star.lineitem SELECT * FROM src_lineitem")
    spark.sql("INSERT INTO star.cust (c_custkey, c_nationkey) SELECT * FROM src_cust")

    // 3. the fact⋈fact join: Exchange-free by layout. Broadcast is
    // disabled HERE only — at fixture scale the (exact!) statistics
    // would rightly pick a broadcast; at 100 TB neither fact side fits
    // one, and SPJ is the plan that survives
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val factJoin = spark.table("star.orders")
      .join(spark.table("star.lineitem"), col("o_orderkey") === col("l_orderkey"))
    val pairs = factJoin.count()
    val factPlan = factJoin.queryExecution.executedPlan.toString
    require(!factPlan.contains("Exchange"),
      "the co-bucketed join must not shuffle")
    println(s"[scan-tier] fact join: $pairs pairs, ZERO Exchange")
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    // 4+5. the star probe: dim filtered -> broadcast (exact stats) ->
    // runtime partition pruning into the identity-partitioned dim scan
    val probe = spark.table("star.cust")
      .join(spark.table("star.orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("c_nationkey") < 3)
      .groupBy("c_nationkey").agg(count(lit(1)).as("orders"))
    val probeRows = probe.collect()
    println(s"[scan-tier] star probe: ${probeRows.length} nation rows, " +
      s"defaults live: " + spark.sql(
        "SELECT count(*) FROM star.cust WHERE tier = 'standard'").head.getLong(0))

    // 6. the operational dashboard is plain SQL over metadata tables
    println("[scan-tier] history:")
    spark.sql("SELECT version, operation, is_current FROM star.cust.history " +
      "ORDER BY version").show(truncate = false)
    println("[scan-tier] partitions (top 5 by rows):")
    spark.sql("SELECT * FROM star.cust.`partitions` ORDER BY n_rows DESC LIMIT 5")
      .show(truncate = false)
    println("[scan-tier] files footprint: " + spark.sql(
      "SELECT count(*) AS files, sum(size_bytes) AS bytes FROM star.cust.files")
      .collect().mkString)
    spark.stop()
  }
}
