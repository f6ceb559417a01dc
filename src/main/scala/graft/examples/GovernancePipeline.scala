package graft.examples

import graft.io.Tables
import graft.ops.TableProps
import org.apache.spark.sql.SparkSession

/** The round-14 governance loop composed into one runnable job — the
  * pieces a data-platform team reaches for the day legal and analytics
  * both show up:
  *
  *   1. declared NDV       ('graft.ndv.columns': every commit records
  *                          per-file HLL sketches, so cardinality
  *                          dashboards never open a data file)
  *   2. views as access    (CREATE VIEW is the cheapest row-level-
  *      layer                security / column-masking primitive: a
  *                          stored predicate + projection the optimizer
  *                          inlines — pruning pushes through)
  *   3. nested views       (a curated metrics view over the masked
  *                          view; both expand into ONE plan)
  *   4. CALL system.ndv    (metadata-served distinct counts, exactly
  *                          the full scan's hll_sketch_agg number)
  *   5. CALL system.purge  (right-to-erasure: matching rows physically
  *                          gone from live AND history, raw-scan
  *                          verified, with the audit row to file)
  *   6. views survive      (the purge rewrote the base table; the view
  *                          layer re-inlines against the new state with
  *                          no re-grant, no re-creation)
  *
  * `sbt "runMain graft.examples.GovernancePipeline [sfDir]"`.
  */
object GovernancePipeline {
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

    val rootDir = java.nio.file.Files.createTempDirectory("graft_gov")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val wh = s"$rootDir/wh"
    spark.conf.set("spark.sql.catalog.gov", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gov.root", wh)

    // 1. the customer table declares its cardinality columns up front
    TableProps.update(s"$wh/customers")(_ +
      (TableProps.NdvKey -> "c_custkey,c_mktsegment") +
      (TableProps.StatsKey -> "c_custkey"))
    graft.ops.Sinks.publishVersioned(
      Tables.customer(spark, sfDir).repartition(4), s"$wh/customers", None)

    // 2. the access layer: analysts see masked contact data and only
    //    the AUTOMOBILE segment — a stored predicate + projection, not
    //    a copy; filter pushdown goes THROUGH the view into the scan
    spark.sql(
      """CREATE VIEW gov.customers_masked AS
        |SELECT c_custkey,
        |       concat(substring(c_name, 1, 9), '***') AS name_masked,
        |       c_mktsegment, c_acctbal
        |FROM gov.customers
        |WHERE c_mktsegment = 'AUTOMOBILE'""".stripMargin)

    // 3. the metrics view nests over the masked view — both inline
    spark.sql(
      """CREATE VIEW gov.segment_metrics AS
        |SELECT count(*) AS customers, round(avg(c_acctbal), 2) AS avg_balance
        |FROM gov.customers_masked""".stripMargin)
    spark.sql("SHOW VIEWS IN gov").show(truncate = false)
    spark.sql("SELECT * FROM gov.segment_metrics").show()

    // 4. the cardinality dashboard: zero data files opened
    spark.sql("CALL gov.system.ndv('customers')").show(truncate = false)

    // 5. a deletion request arrives for one customer: physically erase
    //    them from the live version AND all history, verified
    val victim = spark.sql(
      "SELECT c_custkey FROM gov.customers LIMIT 1").collect().head.getLong(0)
    spark.sql(
      s"CALL gov.system.purge('customers', where => 'c_custkey = $victim')")
      .show(truncate = false)

    // 6. the view layer needed no re-grant — it re-inlines over the
    //    purged table
    spark.sql("SELECT * FROM gov.segment_metrics").show()
    println(s"purged customer $victim present anywhere: " +
      (spark.sql(s"SELECT count(*) FROM gov.customers WHERE c_custkey = $victim")
        .collect().head.getLong(0) > 0))
    spark.stop()
  }
}
