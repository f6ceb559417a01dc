package graft.examples

import graft.io.Tables
import graft.ops.{EqDel, Sinks, TableProps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The round-14 operational loop composed into one runnable job — a
  * CDC-fed, partitioned silver table over a year of operations:
  *
  *   1. declared props     (stats + bloom + clustering + retention as
  *                          TBLPROPERTIES: every commit annotates by
  *                          declaration, no call-site cooperation)
  *   2. avro COPY INTO     (an avro landing zone ingested exactly once
  *                          through avro-core — no connector needed)
  *   3. blind upserts      (equality deletes: each CDC batch commits
  *                          O(batch) with NO table read — the tombstone
  *                          anti-join reconciles at scan time)
  *   4. metadata probes    (count/sum/avg/grouped — answered from the
  *                          stats sidecar + directory arithmetic, zero
  *                          or boundary-only file opens)
  *   5. scoped compaction  (compact ONLY the hot partition: matching
  *                          files rewrite + re-cluster, everything else
  *                          carries by hardlink)
  *   6. eq_checkpoint      (O(metadata) fold: dead tombstones swept;
  *                          after the full rewrite the table exits
  *                          eq-delete maintenance entirely)
  *
  * `sbt "runMain graft.examples.UpsertMaintenancePipeline [sfDir]"`.
  */
object UpsertMaintenancePipeline {
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
    import spark.implicits._

    val rootDir = java.nio.file.Files.createTempDirectory("graft_upmaint")
    graft.streaming.StreamOps.cleanOnExit(rootDir)
    val wh = s"$rootDir/wh"
    val root = s"$wh/orders_silver"
    spark.conf.set("spark.sql.catalog.upm", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.upm.root", wh)

    // 1. the table declares its own maintenance policy
    TableProps.update(root)(_ +
      (TableProps.PartitionKey -> "o_orderstatus STRING") +
      (TableProps.StatsKey -> "o_orderkey,o_totalprice") +
      (TableProps.ClusterKey -> "o_orderkey") +
      (TableProps.RetainVersionsKey -> "3"))

    // 2. an avro landing zone (written here for the demo) ingests
    //    exactly once — the second CALL is a receipt-deduped no-op
    val landing = s"$rootDir/landing"
    graft.sources.AvroIO.write(
      Tables.orders(spark, sfDir).repartition(2), landing)
    val (v0, n0) = Sinks.copyInto(spark, root, landing, format = "avro")
    val (v1, n1) = Sinks.copyInto(spark, root, landing, format = "avro")
    println(s"COPY INTO: v$v0 ingested ${n0.size} avro files; " +
      s"re-run ingested ${n1.size} (v$v1)")

    // 3. three blind CDC batches: zero table reads at commit time
    (1 to 3).foreach { gen =>
      val batch = Tables.orders(spark, sfDir)
        .filter(col("o_orderkey") % 1000 === gen)
        .withColumn("o_orderpriority", lit(s"UPSERTED-$gen"))
      EqDel.upsertBatch(spark, batch, root, Seq("o_orderkey"))
    }
    println(s"pending tombstones: " +
      EqDel.pending(spark, Sinks.resolve(root)).count())

    // 4. the dashboards never open a data file
    spark.sql(
      """SELECT o_orderstatus, count(*) AS n, sum(o_orderkey) AS sum_key
        |FROM upm.orders_silver GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin).show(truncate = false)

    // 5. compact ONLY the hot partition; 6. then shed the tombstone debt
    spark.sql(
      "CALL upm.system.compact(table => 'orders_silver', where => \"o_orderstatus = 'O'\")")
      .show(truncate = false)
    spark.sql("CALL upm.system.eq_checkpoint(table => 'orders_silver')")
      .show(truncate = false)

    // full rewrite of the rest, then the checkpoint EXITS maintenance
    spark.sql(
      "CALL upm.system.compact(table => 'orders_silver', " +
        "where => \"o_orderstatus IN ('F', 'P')\")").collect()
    spark.sql("CALL upm.system.eq_checkpoint(table => 'orders_silver')")
      .show(truncate = false)
    println(s"eq-delete maintenance active: " +
      EqDel.maintained(Sinks.resolve(root)))
    spark.stop()
  }
}
