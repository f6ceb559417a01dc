package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints the formatted physical plan of the named
  * queries (default: the bench headline set) against a fixture dir —
  * the iterate-on-the-plan loop the builder brief mandates
  * (`.explain("formatted")` until the plan is the one you'd want at
  * 100 TB). Usage: `runMain graft.Explain <sfDir> [query ...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.benchQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (Spark's legacy default) carries NO footer statistics or
      // logical annotation — timestamp columns would be unprunable and
      // unskippable; MICROS is the modern annotated int64 (Delta pins the
      // same). See ops/Stats.scala timestamp-domain notes.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // in-process chmod for the local-FS commit path (no libhadoop in
      // this environment, so the stock FS forks a subprocess per
      // staged-write _temporary dir — see graft.io.FastLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
