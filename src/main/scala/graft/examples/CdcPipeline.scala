package graft.examples

import graft.io.Tables
import graft.ops.{Merge, Sinks}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end CDC maintenance pipeline over a stored corpus table —
  * the daily "apply the change feed, keep the table healthy" job,
  * assembled from the library's operators and runnable as
  * `sbt "runMain graft.examples.CdcPipeline [sfDir]"`.
  *
  * Stages (at 100 TB this runs unchanged; every write lands through the
  * atomic versioned publish, so readers never observe a partial table):
  *   1. bootstrap publish   (customer snapshot → versioned table v0)
  *   2. CDC collapse        (latestPerKey: one newest op per key)
  *   3. MERGE apply         (one full-outer key join → publish v1)
  *   4. retry apply         (same delta again → v2, data unchanged)
  *   5. compaction          (footprint-sized rewrite → v3, pointer flip)
  */
object CdcPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rootDir = java.nio.file.Files.createTempDirectory("graft_cdc")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val root = rootDir.toString + "/customers"

    // 1. bootstrap the stored table
    val base = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
    val v0 = Sinks.publishVersioned(base, root)
    println(s"v$v0 bootstrap: ${Sinks.readCurrent(spark, root).count()} rows")

    // 2. a CDC feed derived from orders (several ops per key), collapsed
    //    to the newest op per key before applying
    val cdc = Tables.orders(spark, sfDir).select(
      col("o_custkey").as("c_custkey"),
      concat(lit("Customer#Upd"), col("o_custkey").cast("string")).as("c_name"),
      round(col("o_totalprice"), 2).as("c_acctbal"),
      lit("CDC").as("c_mktsegment"),
      when(col("o_orderstatus") === "F", lit("delete")).otherwise(lit("upsert")).as("op"),
      col("o_orderdate").as("seq"), col("o_orderkey").as("seq2"))
    val delta = Merge.latestPerKey(cdc, Seq("c_custkey"), Seq("seq", "seq2"))
      .drop("seq", "seq2")

    // 3. apply — one full-outer key join, atomic publish
    val v1 = Merge.applyTo(spark, root, delta, Seq("c_custkey"))
    val n1 = Sinks.readCurrent(spark, root).count()
    println(s"v$v1 after merge: $n1 rows")

    // 4. a retried batch is a data no-op (idempotent maintenance)
    val v2 = Merge.applyTo(spark, root, delta, Seq("c_custkey"))
    val n2 = Sinks.readCurrent(spark, root).count()
    require(n2 == n1, s"retry changed the table: $n1 -> $n2")
    println(s"v$v2 after retry: $n2 rows (unchanged)")

    // 5. compact the current version in place of the nightly maintenance
    val v3 = Sinks.compactVersioned(spark, root)
    require(Sinks.readCurrent(spark, root).count() == n2)
    println(s"v$v3 after compaction: $n2 rows intact")

    spark.stop()
  }
}
