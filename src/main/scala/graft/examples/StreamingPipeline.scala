package graft.examples

import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming analytics pipeline over the events fixture — the reference's
  * long-running-topology idiom end-to-end on Structured Streaming:
  * file-stream spout → watermark → tumbling aggregation → foreachBatch
  * sink, with AvailableNow so the example terminates when the backlog is
  * drained. Run: `sbt "runMain graft.examples.StreamingPipeline [sfDir]"`.
  */
object StreamingPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val outDir = java.nio.file.Files.createTempDirectory("stream-out").toString
    val agg = StreamOps.tumblingAgg(
      StreamOps.withLatenessPolicy(StreamOps.eventsStream(spark, sfDir), "10 minutes"))

    val q = agg.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/hourly")
        println(s"STREAMBATCH id=$id rows=${batch.count()}")
      }
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val written = spark.read.parquet(s"$outDir/hourly")
    println(s"STREAMING_PIPELINE windows=${written.count()} " +
      s"events=${written.agg(sum(col("n"))).head().getLong(0)}")
    spark.stop()
  }
}
