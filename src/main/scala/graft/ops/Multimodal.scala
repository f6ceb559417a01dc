package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY §2B B64 + north-star mandate):
  * media as opaque `binary` payloads with typed metadata structs, plus
  * decode / feature-extract / frame-sample operators.
  *
  * The container has no image/audio codecs, so the DECODE STEP IS A
  * CLEARLY-MARKED DETERMINISTIC STUB — what is real (and tested) is the
  * Spark-side shape that matters at 100 TB: binary payloads survive the
  * parquet round-trip, metadata travels as a nested struct next to the
  * payload, frame sampling explodes bounded slices without materializing
  * whole payloads per row more than once, and feature extraction runs
  * batched per partition (mapPartitions), which is exactly the batch
  * shape a Pandas-UDF / model-inference stage needs.
  */
object Multimodal {

  /** Pack text fixtures into (payload binary, meta struct) rows — the
    * fixture stand-in for image/audio bytes.
    */
  def packBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).as("n_bytes"),
        col("lang").as("lang"),
        col("source").as("source")).as("meta"))

  /** STUB decode: derives fake media dimensions deterministically from the
    * payload hash. A real pipeline replaces ONLY the width/height/channels
    * expressions with a codec call; schema and plumbing stay identical.
    */
  def decodeStub(media: DataFrame): DataFrame =
    media.withColumn("decoded", struct(
      (pmod(xxhash64(col("payload")), lit(1280)) + 1).cast("int").as("width"),
      (pmod(xxhash64(col("payload"), lit(1)), lit(720)) + 1).cast("int").as("height"),
      lit(3).as("channels")))

  /** Frame/chunk sampling: explode every stride-th slice of the payload,
    * up to maxFrames bounded slices per row (bounded output per input row
    * — no payload amplification beyond maxFrames × frameBytes).
    *
    * The last frame index is floor((n_bytes-1)/stride) = the highest
    * stride multiple that still lands INSIDE the payload; floor(n/stride)
    * would emit a zero-length trailing frame whenever stride divides
    * n_bytes exactly. Empty/null payloads yield no frames (the
    * when() leaves the frame array null, which posexplode drops).
    */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int, maxFrames: Int): DataFrame =
    media.select(col("doc_id"), col("meta"),
      posexplode(when(col("meta.n_bytes") > 0, transform(
        sequence(lit(0),
          least(floor((col("meta.n_bytes") - 1) / stride).cast("int"),
            lit(maxFrames - 1))),
        i => col("payload").substr(i * stride + 1, lit(frameBytes))))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Batched feature extraction over partitions — the mapPartitions shape
    * a model-inference stage uses (amortized per-batch setup). The
    * "features" here are a STUB: bytewise histogram moments.
    */
  def extractFeatures(media: DataFrame, dim: Int): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("features", ArrayType(DoubleType))))
    val rdd = media.select("doc_id", "payload").rdd.mapPartitions { rows =>
      // per-partition setup happens ONCE here (model load in real life)
      rows.map { r =>
        val id = r.getLong(0)
        // null payloads (e.g. packBinary over a null text) feature as
        // all-zeros rather than NPE-failing the task
        val bytes = Option(r.getAs[Array[Byte]](1)).getOrElse(Array.emptyByteArray)
        val feats = Array.tabulate(dim) { i =>
          if (bytes.isEmpty) 0.0
          else bytes.iterator.zipWithIndex
            .filter(_._2 % dim == i).map(b => (b._1 & 0xff).toDouble).sum /
            math.max(1, (bytes.length + dim - 1 - i) / dim) / 255.0
        }
        Row(id, feats)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
