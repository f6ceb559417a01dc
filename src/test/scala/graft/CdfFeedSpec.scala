package graft

import graft.ops.{Merge, Mview, Sinks}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-side change feed: the MERGE writer persists its own row-level
  * classification with the commit, and readers (change feed, MV refresh,
  * replica sync) consume O(changed rows) instead of re-diffing snapshots.
  * The feed must agree with the snapshot diff, chain across versions,
  * skip crash-orphaned versions, and fall back when a step lacks it.
  */
class CdfFeedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("cdffeed").toString

  private def base(n: Int): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (i.toLong, s"g${i % 3}", (i * 10).toLong)).toDF("id", "grp", "v")
  }

  private def same(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("upsertChanges matches the snapshot diff classification exactly") {
    import spark.implicits._
    val root = tmp() + "/t"
    Sinks.publishVersioned(base(50), root, None)
    // insert (id 100), update (id 1), delete (id 2), unchanged upsert
    // (id 3), delete of an absent key (id 999)
    val delta = Seq(
      (100L, "gX", 1L, "upsert"),
      (1L, "g1", 99L, "upsert"),
      (2L, null.asInstanceOf[String], 0L, "delete"),
      (3L, "g0", 30L, "upsert"),
      (999L, null.asInstanceOf[String], 0L, "delete")
    ).toDF("id", "grp", "v", "op")
    Merge.applyTo(spark, root, delta, Seq("id"), "op", emitChanges = true)
    val sidecar = spark.read.parquet(
      Sinks.versionPath(root, 1L) + "/" + Sinks.ChangesSidecar)
    val snapshotDiff = Sinks.changesBetween(spark, root, 0L, 1L, Seq("id"))
    assert(same(sidecar, snapshotDiff),
      "write-side feed diverged from the snapshot diff")
    // and the feed is small: 1 insert + 1 delete + 2 update rows
    assert(sidecar.count() == 4)
  }

  test("changeFeed chains across versions and reports the commit version") {
    import spark.implicits._
    val root = tmp() + "/t"
    Sinks.publishVersioned(base(20), root, None)
    Merge.applyTo(spark, root,
      Seq((100L, "gX", 5L, "upsert")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    Merge.applyTo(spark, root,
      Seq((100L, "gX", 6L, "upsert"), (1L, "", 0L, "delete")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    val feed = Sinks.changeFeed(spark, root, 0L, 2L).get
    val byV = feed.groupBy("_commit_version").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV == Map(1L -> 1L, 2L -> 3L)) // insert; then update pre+post and delete
    // a window whose first step lacks a feed (v0 was a plain publish)
    assert(Sinks.changeFeed(spark, root, -1L, 2L).isEmpty)
  }

  test("a crash-orphaned version's feed is never chained in") {
    import spark.implicits._
    val root = tmp() + "/t"
    Sinks.publishVersioned(base(20), root, None)
    Merge.applyTo(spark, root,
      Seq((100L, "gX", 5L, "upsert")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    // simulate the crash: a COMPLETE version dir (with feed, base=1) that
    // never became current — copy v1 to v2 and rewrite its base marker
    val live = java.nio.file.Paths.get(Sinks.versionPath(root, 1L))
    val orphan = java.nio.file.Paths.get(Sinks.versionPath(root, 2L))
    val s = java.nio.file.Files.walk(live)
    try s.forEach { p =>
      val t = orphan.resolve(live.relativize(p))
      if (java.nio.file.Files.isDirectory(p)) java.nio.file.Files.createDirectories(t)
      else java.nio.file.Files.copy(p, t)
    } finally s.close()
    java.nio.file.Files.write(
      orphan.resolve(Sinks.ChangesSidecar).resolve("_BASE"), "1".getBytes("UTF-8"))
    // the next real commit bases on v1 (the live pointer) and allocates v3
    val v = Merge.applyTo(spark, root,
      Seq((200L, "gY", 7L, "upsert")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    assert(v == 3L)
    val feed = Sinks.changeFeed(spark, root, 0L, 3L).get
    val versions = feed.select("_commit_version").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(versions == Set(1L, 3L), s"orphan v2 leaked into the chain: $versions")
    // key 100 (the row the orphan's copied feed duplicates) appears
    // exactly once — the phantom insert was not replayed
    assert(feed.filter(col("id") === 100L).count() == 1)
  }

  test("Mview refresh lands on the same answer through the fast path and the fallback") {
    import spark.implicits._
    val root = tmp()
    val (srcA, mvA) = (s"$root/srcA", s"$root/mvA") // feeds present
    val (srcB, mvB) = (s"$root/srcB", s"$root/mvB") // no feeds
    val delta1 = Seq((100L, "gX", 5L, "upsert"), (1L, "", 0L, "delete"))
      .toDF("id", "grp", "v", "op")
    val delta2 = Seq((100L, "gX", 9L, "upsert"), (2L, "", 0L, "delete"))
      .toDF("id", "grp", "v", "op")
    for ((src, mv, emit) <- Seq((srcA, mvA, true), (srcB, mvB, false))) {
      Sinks.publishVersioned(base(30), src, None)
      Mview.create(spark, src, mv, Seq("grp"), Seq("v"))
      Merge.applyTo(spark, src, delta1, Seq("id"), "op", emitChanges = emit)
      Merge.applyTo(spark, src, delta2, Seq("id"), "op", emitChanges = emit)
      Mview.refresh(spark, src, mv, Seq("id"), Seq("grp"), Seq("v"))
    }
    // both tables now hold the same data; both MVs must agree with the
    // ground truth and with each other
    val want = Mview.full(Sinks.readCurrent(spark, srcA), Seq("grp"), Seq("v"))
    assert(same(Mview.readCurrent(spark, mvA), want))
    assert(same(Mview.readCurrent(spark, mvB), want))
  }

  test("syncReplica catches up through the per-version feeds (last write wins)") {
    import spark.implicits._
    val root = tmp()
    val (src, rep) = (s"$root/src", s"$root/rep")
    Sinks.publishVersioned(base(30), src, None)
    Sinks.syncReplica(spark, src, rep, Seq("id")) // bootstrap at v0
    // three feed-bearing versions: insert → update → delete of the same
    // key, plus an unrelated update — last write must win per key
    Merge.applyTo(spark, src,
      Seq((100L, "gX", 1L, "upsert")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    Merge.applyTo(spark, src,
      Seq((100L, "gX", 2L, "upsert"), (5L, "g2", 555L, "upsert"))
        .toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    Merge.applyTo(spark, src,
      Seq((100L, "", 0L, "delete")).toDF("id", "grp", "v", "op"),
      Seq("id"), "op", emitChanges = true)
    Sinks.syncReplica(spark, src, rep, Seq("id"))
    assert(same(Sinks.readCurrent(spark, rep), Sinks.readCurrent(spark, src)),
      "feed-driven sync diverged from the source")
    assert(Sinks.readCurrent(spark, rep).filter(col("id") === 100L).count() == 0)
  }

  test("vacuuming a version INSIDE a feed window makes the whole feed unavailable, never truncated") {
    // The retention contract: the feed is only valid if every commit in
    // (fromV, toV] still carries its sidecar chain. After compaction
    // vacuums an intermediate version, a caller asking for the window
    // that crosses it must get 'unavailable' (None → fall back to a
    // snapshot diff or a bootstrap), NEVER a silently shorter feed that
    // drops the vacuumed commit's changes.
    import spark.implicits._
    val root = tmp() + "/t"
    Sinks.publishVersioned(base(20), root, None)
    (1 to 3).foreach { i =>
      Merge.applyTo(spark, root,
        Seq((100L + i, "gV", i.toLong, "upsert")).toDF("id", "grp", "v", "op"),
        Seq("id"), "op", emitChanges = true)
    }
    // whole window readable pre-vacuum: commits 1,2,3 each one insert
    val pre = Sinks.changeFeed(spark, root, 0L, 3L).get
    assert(pre.count() == 3)
    // compact with retainVersions=0: only the new live version (4) and
    // the compaction base (3) survive; 0..2 are vacuumed
    Sinks.compactVersioned(spark, root, retainVersions = 0)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(Sinks.versionPath(root, 1L))), "vacuum kept v1")
    // any window crossing a vacuumed version: unavailable, not partial
    assert(Sinks.changeFeed(spark, root, 0L, 3L).isEmpty,
      "feed across vacuumed versions must be unavailable")
    assert(Sinks.changeFeed(spark, root, 1L, 3L).isEmpty,
      "feed crossing the vacuumed v2 sidecar must be unavailable")
    // but a window needing ONLY surviving sidecars stays readable: the
    // (2,3] feed is exactly v3's sidecar, and v3 (the compaction base)
    // survived — vacuum must not over-invalidate either
    assert(Sinks.changeFeed(spark, root, 2L, 3L).get.count() == 1,
      "feed over surviving sidecars must remain readable")
    // the surviving tail is still consistent: the compaction commit (4)
    // carries no feed (it's a rewrite, not a logical change), so even
    // the 3→4 window reports unavailable rather than inventing changes
    assert(Sinks.changeFeed(spark, root, 3L, 4L).isEmpty)
  }
}
