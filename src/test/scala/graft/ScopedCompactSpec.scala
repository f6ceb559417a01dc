package graft

import java.nio.file.{Files, Paths}

import graft.ops.{EqDel, Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B175 predicate-scoped compaction
  * ([[graft.ops.Sinks.compactVersionedWhere]]): rewrite only the
  * partitions a predicate selects, carry everything else by hardlink —
  * the only compaction shape that is affordable at 100 TB. Every leg
  * checks BOTH halves: the selected partition's files merged, the
  * unselected partitions' files carried inode-identical, and the table's
  * rows byte-identical before and after.
  */
class ScopedCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def inodesOf(dir: String, pred: String => Boolean): Set[Object] =
    graft.io.Fs.walkParquet(Paths.get(dir))
      .filter(p => pred(Paths.get(dir).relativize(p).toString))
      .map(p => Files.readAttributes(p,
        classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey())
      .toSet

  private def filesIn(dir: String, prefix: String): Seq[String] =
    graft.io.Fs.walkParquet(Paths.get(dir))
      .map(p => Paths.get(dir).relativize(p).toString)
      .filter(_.startsWith(prefix)).sorted

  private def freshRoot(name: String): String =
    Files.createTempDirectory(s"graft_scoped_$name").toString + "/t"

  private def partitionedFixture(root: String, perPart: Int = 4): Unit = {
    TableProps.update(root)(_ + (TableProps.PartitionKey -> "cat STRING"))
    // several small files per partition: each publish task writes a
    // sliver into every partition dir
    val df = (0 until 300).map(i =>
        (i.toLong, Seq("a", "b", "c")(i % 3), s"p$i"))
      .toDF("k", "cat", "payload").repartition(perPart)
    Sinks.publishVersioned(df, root, None, statsCols = Seq("k"))
  }

  test("scoped rewrite merges only the matching partition; others carry by inode; data identical") {
    val root = freshRoot("basic")
    partitionedFixture(root)
    val before = Sinks.readCurrent(spark, root).collect().toSet
    val v0 = Sinks.resolve(root)
    assert(filesIn(v0, "cat=a").size > 1, "fixture needs small files to merge")
    val bInodes = inodesOf(v0, _.startsWith("cat=b"))
    val cInodes = inodesOf(v0, _.startsWith("cat=c"))
    val v = Sinks.compactVersionedWhere(spark, root, "cat = 'a'")
    assert(v == 1L)
    val v1 = Sinks.resolve(root)
    assert(filesIn(v1, "cat=a").size == 1,
      s"matching partition must merge, got ${filesIn(v1, "cat=a")}")
    assert(inodesOf(v1, _.startsWith("cat=b")) == bInodes &&
      inodesOf(v1, _.startsWith("cat=c")) == cInodes,
      "unselected partitions must carry by hardlink, not rewrite")
    assert(Sinks.readCurrent(spark, root).collect().toSet == before)
    // stats follow the rewrite: the sidecar covers the new file, so the
    // pruned read stays exact (and opens only what the range needs)
    val pruned = graft.ops.Stats.readCurrentWhere(spark, root, "k", 0L, 50L)
    assert(pruned.collect().toSet ==
      Sinks.readCurrent(spark, root).filter(col("k").between(0, 50))
        .collect().toSet)
  }

  test("predicates: IN selects several partitions; no-match is a commit-free no-op; refusals are loud") {
    val root = freshRoot("preds")
    partitionedFixture(root)
    val before = Sinks.readCurrent(spark, root).collect().toSet
    val v = Sinks.compactVersionedWhere(spark, root, "cat IN ('a', 'c')")
    val v1 = Sinks.resolve(root)
    assert(filesIn(v1, "cat=a").size == 1 && filesIn(v1, "cat=c").size == 1)
    assert(filesIn(v1, "cat=b").size > 1, "unselected partition untouched")
    assert(Sinks.readCurrent(spark, root).collect().toSet == before)
    // no partition matches: no new version is committed
    val unmatched = Sinks.compactVersionedWhere(spark, root, "cat = 'zz'")
    assert(unmatched == v && Sinks.currentVersion(root).contains(v))
    // a non-partition column refuses before staging anything
    val e = intercept[IllegalArgumentException] {
      Sinks.compactVersionedWhere(spark, root, "k < 100")
    }
    assert(e.getMessage.contains("identity partition columns"))
    // an unpartitioned table refuses with the whole-table hint
    val flat = freshRoot("flat")
    Sinks.publishVersioned((0 until 10).map(i => (i, s"v$i")).toDF("k", "v"),
      flat, None)
    val e2 = intercept[IllegalArgumentException] {
      Sinks.compactVersionedWhere(spark, flat, "k = 1")
    }
    assert(e2.getMessage.contains("unpartitioned"))
  }

  test("deletion vectors materialize into the rewritten partition; carried files keep subtracting") {
    val root = freshRoot("dv")
    partitionedFixture(root)
    spark.conf.set("spark.sql.catalog.gsc", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gsc.root",
      Paths.get(root).getParent.toString)
    TableProps.update(root)(_ + (TableProps.DmlModeKey -> "mor"))
    spark.sql("DELETE FROM gsc.t WHERE k = 0 OR k = 1") // k=0 in a, k=1 in b
    val before = Sinks.readCurrent(spark, root).collect().toSet
    assert(graft.ops.Dv.exists(Sinks.resolve(root)))
    Sinks.compactVersionedWhere(spark, root, "cat = 'a'")
    val after = Sinks.resolve(root)
    assert(Sinks.readCurrent(spark, root).collect().toSet == before)
    // the rewritten partition's files no longer HOLD the deleted row —
    // a raw read of just those files is already reconciled
    val rawA = spark.read.option("basePath", after)
      .parquet(filesIn(after, "cat=a").map(f => s"$after/$f"): _*)
    assert(!rawA.collect().exists(_.getLong(0) == 0L),
      "the DV-hidden row must be materialized away by the rewrite")
    // the carried partition still subtracts through the vector
    assert(!Sinks.readCurrent(spark, root).collect().exists(_.getLong(0) == 1L))
  }

  test("pending equality deletes: rewritten rows are reconciled and seq-stamped above every tombstone") {
    val root = freshRoot("eqdel")
    partitionedFixture(root)
    // blind upserts tombstone keys in BOTH a (k=0) and b (k=1)
    EqDel.upsertBatch(spark,
      Seq((0L, "a", "upd0"), (1L, "b", "upd1")).toDF("k", "cat", "payload"),
      root, Seq("k"))
    val before = Sinks.readCurrent(spark, root).collect().toSet
    assert(before.exists(r => r.getLong(0) == 0L && r.getAs[String]("payload") == "upd0"))
    Sinks.compactVersionedWhere(spark, root, "cat = 'a'")
    val live = Sinks.resolve(root)
    // tombstones stay pending (partition b's files still need them) …
    assert(EqDel.exists(live), "scoped compaction must carry the tombstones")
    // … but the rewritten partition reads reconciled, and its fresh
    // seq stamp protects the upserted row from its own tombstone
    val now = Sinks.readCurrent(spark, root).collect().toSet
    assert(now == before)
    assert(now.count(_.getLong(0) == 0L) == 1)
    assert(now.exists(r => r.getLong(0) == 0L && r.getAs[String]("payload") == "upd0"))
  }

  test("CALL system.compact(where => …) drives the scoped rewrite; retention args refuse in scoped mode") {
    val wh = Files.createTempDirectory("graft_scoped_call").toString
    val root = s"$wh/t"
    partitionedFixture(root)
    spark.conf.set("spark.sql.catalog.gscall", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gscall.root", wh)
    val before = spark.sql("SELECT * FROM gscall.t").collect().toSet
    val r = spark.sql(
      "CALL gscall.system.compact(table => 't', where => \"cat = 'b'\")")
      .collect().head
    assert(r.getLong(1) == 1L)
    val v1 = Sinks.resolve(root)
    assert(filesIn(v1, "cat=b").size == 1)
    assert(filesIn(v1, "cat=a").size > 1)
    assert(spark.sql("SELECT * FROM gscall.t").collect().toSet == before)
    val e = intercept[Exception] {
      spark.sql("CALL gscall.system.compact(table => 't', " +
        "where => \"cat = 'a'\", retain_versions => 3)").collect()
    }
    assert(e.getMessage.contains("no retention"), e.getMessage)
  }
}
