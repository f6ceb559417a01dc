package graft.examples

import graft.io.Tables
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end training-data curation pipeline — the north-star use case
  * assembled from the library's operators, runnable as
  * `sbt "runMain graft.examples.CurationPipeline [sfDir]"`.
  *
  * Stages (each a single declarative plan — at 100 TB this runs
  * unchanged, partitioned by the shuffle keys noted inline):
  *   1. quality gate        (per-row, no shuffle)
  *   2. exact dedup         (one shuffle on md5 digest)
  *   3. near-dup candidates (MinHash+LSH band-bucket join)
  *   4. near-dup filter     (drop higher doc_id of any candidate pair)
  *   5. embedding join      (shuffle on doc_id/vec_id)
  *   6. multimodal pack     (per-row struct+binary assembly)
  */
object CurationPipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. quality gate
    val scored = TextAnalysis.qualityScore(docs)
      .select("doc_id", "quality")
    val kept = docs.join(scored.filter(col("quality") >= 0.3), Seq("doc_id"))
    val n1 = kept.count()

    // 2. exact dedup (survivor = lowest doc_id)
    val exact = Dedup.dropExactDups(kept)
    val n2 = exact.count()

    // 3+4. near-dup candidates via LSH; drop the higher id of each pair
    val candidates = Dedup.minhashCandidates(exact, n = 2, bands = 8, rowsPerBand = 4)
    val losers = candidates.select(col("doc_b").as("doc_id")).distinct()
    val nearDeduped = exact.join(losers, Seq("doc_id"), "left_anti")
    val n3 = nearDeduped.count()

    // 5. attach embeddings and run a sample similarity search
    val emb = Tables.embeddings(spark, sfDir)
    val joined = nearDeduped.join(emb, col("doc_id") === col("vec_id"))
    val queries = emb.limit(1).select(lit(0L).as("query_id"), col("embedding").as("qvec"))
    val topk = Similarity.bruteForceTopK(
      joined.select(col("doc_id").as("vec_id"), col("embedding")), queries, 5)

    // 6. multimodal packaging
    val packed = Multimodal.packBinary(nearDeduped)

    println(s"CURATION input=$n0 quality_kept=$n1 exact_deduped=$n2 " +
      s"near_deduped=$n3 packed=${packed.count()} topk=${topk.count()}")
    spark.stop()
  }
}
