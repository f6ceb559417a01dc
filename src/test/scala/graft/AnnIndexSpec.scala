package graft

import graft.io.Tables
import graft.ops.{AnnIndex, Similarity, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B125 persisted IVF index: bucket-partitioned layout, dynamic
  * partition pruning at probe time, search ≡ the in-session IVF path
  * (which q_ann_ivf_fixed oracles), and the loud-failure crash contract
  * for a missing quantizer sidecar.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/idx"

  private def queries5 = Tables.embeddings(spark, sf001)
    .filter(col("vec_id") < 5)
    .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))

  test("buildFixed lays buckets out as partition dirs and search matches the in-session IVF") {
    val root = tmp("annidx")
    val emb = Tables.embeddings(spark, sf001)
    val v = AnnIndex.buildFixed(spark, emb, root)
    assert(v == 0L)
    // partition-dir layout: one bucket=N dir per fixture label
    val live = java.nio.file.Paths.get(Sinks.resolve(root))
    val bucketDirs = graft.io.Fs.listDir(live)
      .filter(p => java.nio.file.Files.isDirectory(p) &&
        p.getFileName.toString.startsWith("bucket="))
    val nLabels = emb.select("label").distinct().count()
    assert(bucketDirs.size == nLabels, s"${bucketDirs.size} bucket dirs for $nLabels labels")
    // search ≡ the oracled in-session path, value for value
    val got = AnnIndex.search(spark, root, queries5, nprobe = 2, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    val want = Similarity.ivfTopK(emb, Similarity.ivfCentroids(emb), queries5,
        nprobe = 2, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(got == want)
    assert(got.size == 50)
  }

  test("search probes with dynamic partition pruning — unprobed bucket dirs are skipped") {
    val root = tmp("annidxdpp")
    AnnIndex.buildFixed(spark, Tables.embeddings(spark, sf001), root)
    val plan = AnnIndex.search(spark, root, queries5, nprobe = 2, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"probe scan lost dynamic partition pruning:\n$plan")
  }

  test("missing _centroids sidecar fails loudly with a rebuild hint, not wrong probes") {
    val root = tmp("annidxcrash")
    AnnIndex.buildFixed(spark, Tables.embeddings(spark, sf001), root)
    graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(
      Sinks.resolve(root), AnnIndex.CentroidsSidecar))
    val err = intercept[IllegalArgumentException] {
      AnnIndex.search(spark, root, queries5, nprobe = 2, k = 10)
    }
    assert(err.getMessage.contains("rebuild"))
  }

  test("append grows the index at O(delta): quantizer rides, new vectors are findable") {
    val root = tmp("annidxgrow")
    val emb = Tables.embeddings(spark, sf001)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.buildFixed(spark, half, root)
    val v0Files = graft.io.Fs.walkParquet(
      java.nio.file.Paths.get(Sinks.versionPath(root, 0L))).map(_.getFileName.toString).toSet
    val v1 = AnnIndex.append(spark, rest, root)
    assert(v1 == 1L)
    // the quantizer carried into the appended version (search must work)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      Sinks.versionPath(root, 1L), AnnIndex.CentroidsSidecar)),
      "append dropped the quantizer sidecar")
    // v0's files carried by name — the append staged only the delta
    val v1Files = graft.io.Fs.walkParquet(
      java.nio.file.Paths.get(Sinks.versionPath(root, 1L))).map(_.getFileName.toString).toSet
    assert(v0Files.subsetOf(v1Files), "append rewrote carried index files")
    assert(Sinks.readCurrent(spark, root).count() == emb.count())
    // an APPENDED vector probes to itself as its own nearest neighbor
    val probe = rest.limit(1)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top1 = AnnIndex.search(spark, root, probe, nprobe = 2, k = 1).head()
    assert(top1.getAs[Long]("query_id") == top1.getAs[Long]("vec_id"),
      s"appended vector is not its own top hit: $top1")
  }

  test("streaming ingestion: micro-batches land exactly-once, streamed vectors probe to themselves") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp("annidxstream")
    val emb = Tables.embeddings(spark, sf001)
    AnnIndex.buildFixed(spark, emb.filter(col("vec_id") % 2 === 0), root)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().toSeq
    val ckpt = java.nio.file.Files.createTempDirectory("annck").toString
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Array[Float])]
    val q = AnnIndex.streamTo(input.toDF().toDF("vec_id", "embedding"), root, ckpt)
    try {
      input.addData(rest.take(rest.size / 2): _*)
      q.processAllAvailable()
      input.addData(rest.drop(rest.size / 2): _*)
      q.processAllAvailable()
    } finally q.stop()
    // every streamed row landed exactly once
    assert(Sinks.readCurrent(spark, root).count() == emb.count())
    assert(Sinks.readCurrent(spark, root).select("vec_id").distinct().count() == emb.count())
    assert(Sinks.listVersions(root).size >= 3) // build + >=2 batch commits
    // the quantizer still rides the streamed versions; a streamed vector
    // probes to itself as its own nearest neighbor
    val vid = rest.last._1
    val probe = emb.filter(col("vec_id") === vid)
      .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
    val top1 = AnnIndex.search(spark, root, probe, nprobe = 2, k = 1).head()
    assert(top1.getAs[Long]("vec_id") == vid, s"streamed vector lost: $top1")
    // streaming into a root with no index fails at START, not first batch
    // (no published version at all → IllegalState from resolve; a table
    // missing only the quantizer → IllegalArgument with a rebuild hint)
    intercept[Exception] {
      AnnIndex.streamTo(input.toDF().toDF("vec_id", "embedding"),
        tmp("annidxnone"), java.nio.file.Files.createTempDirectory("annck2").toString)
    }
  }

  test("restore carries the quantizer sidecar — a rewound index still serves probes") {
    val root = tmp("annidxrest")
    val emb = Tables.embeddings(spark, sf001)
    AnnIndex.buildFixed(spark, emb, root)                 // v0: fixed index
    AnnIndex.buildLearned(spark, emb, root, k = 4, iters = 1) // v1: learned
    val v2 = Sinks.restoreVersion(spark, root, 0L)        // rewind to fixed
    assert(v2 == 2L)
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(
      Sinks.versionPath(root, v2), AnnIndex.CentroidsSidecar)),
      "restore dropped the quantizer sidecar")
    // the restored index answers EXACTLY like the original fixed build
    val got = AnnIndex.search(spark, root, queries5, nprobe = 2, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    val want = Similarity.ivfTopK(emb, Similarity.ivfCentroids(emb), queries5,
        nprobe = 2, k = 10)
      .orderBy("query_id", "rnk").collect().toSeq
    assert(got == want)
  }

  test("rebuild publishes a new version; the previous index stays time-travelable") {
    val root = tmp("annidxver")
    val emb = Tables.embeddings(spark, sf001)
    AnnIndex.buildFixed(spark, emb, root)
    val v1 = AnnIndex.buildLearned(spark, emb, root, k = 8, iters = 2)
    assert(v1 == 1L)
    assert(Sinks.listVersions(root) == Seq(0L, 1L))
    // live search uses the learned index: every bucket it serves is a
    // learned-centroid label, and results still rank by true cosine
    val cents = AnnIndex.centroids(spark, root)
    val labels = cents.select("label").collect().map(_.getLong(0)).toSet
    val served = Sinks.readCurrent(spark, root)
      .select("bucket").distinct().collect().map(_.getLong(0)).toSet
    assert(served.subsetOf(labels))
    // v0 (fixed index) remains readable for time travel
    val v0buckets = Sinks.readVersion(spark, root, 0L)
      .select("bucket").distinct().count()
    assert(v0buckets == emb.select("label").distinct().count())
    val got = AnnIndex.search(spark, root, queries5, nprobe = 3, k = 5)
    assert(got.count() == 25)
  }
}
