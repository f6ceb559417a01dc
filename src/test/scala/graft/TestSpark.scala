package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites. Deliberately does NOT set
  * `nanosAsLong` — reading `events` through Tables must succeed via its
  * explicit-schema read, which every events-touching spec exercises.
  */
object TestSpark {
  lazy val spark: SparkSession = {
    // keep metastore/warehouse artifacts out of the repo tree
    System.setProperty("derby.system.home", "/tmp/graft-derby")
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // annotated int64 timestamps (INT96 has no usable footer stats)
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir", "/tmp/graft-warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  val sf001 = "/root/testdata/sf0.001"
  val sf01 = "/root/testdata/sf0.01"
}
