package graft

import graft.ops.{Merge, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MERGE-shaped keyed upsert semantics + the stored versioned-table path. */
class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  // update k=1, delete k=2, insert k=4, delete absent k=9 (no-op)
  private def delta = Seq(
    (1L, "a2", 11.0, "upsert"), (2L, "b", 20.0, "delete"),
    (4L, "d", 40.0, "upsert"), (9L, "x", 0.0, "delete")
  ).toDF("k", "name", "v", "op")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq

  test("upsert applies insert/update/delete; absent-key delete is a no-op") {
    val out = rows(Merge.upsert(base, delta, Seq("k")))
    assert(out == Seq((1L, "a2", 11.0), (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("upsert is idempotent: re-applying the same delta changes nothing") {
    val once = Merge.upsert(base, delta, Seq("k"))
    val twice = Merge.upsert(once, delta, Seq("k"))
    assert(rows(twice) == rows(once))
  }

  test("upsert rejects a delta missing payload or op columns") {
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(base, delta.drop("v"), Seq("k"))
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("upsert aborts on a malformed op value instead of silently upserting") {
    // typos, wrong case, and null op must all fail the merge loudly — a
    // malformed CDC feed corrupting the table is worse than a failed batch
    for (badOp <- Seq("DELETE", "update", null)) {
      val bad = Seq((1L, "a2", 11.0, badOp)).toDF("k", "name", "v", "op")
      val e = intercept[Exception] { Merge.upsert(base, bad, Seq("k")).collect() }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
      assert(msgs(e).exists(_.contains("invalid op value")),
        s"op='$badOp' did not raise the domain error: $e")
    }
  }

  test("schema evolution: a delta-only column is added nullable, base rows back-filled null") {
    val evolved = Seq(
      (1L, "a2", 11.0, "gold", "upsert"),   // update, carries new col
      (4L, "d", 40.0, null.asInstanceOf[String], "upsert") // insert, new col null
    ).toDF("k", "name", "v", "tag", "op")
    val out = Merge.upsert(base, evolved, Seq("k"))
    assert(out.columns.toSeq == Seq("k", "name", "v", "tag"))
    val got = out.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), Option(r.getString(3)))).toSeq
    assert(got == Seq(
      (1L, "a2", 11.0, Some("gold")),
      (2L, "b", 20.0, None),   // untouched base rows: new col back-filled null
      (3L, "c", 30.0, None),
      (4L, "d", 40.0, None)))
    // idempotent on the EVOLVED schema: re-applying the same delta (now a
    // no-new-column merge) changes nothing
    val again = Merge.upsert(out, evolved, Seq("k"))
    assert(again.orderBy("k").collect().toSeq == out.orderBy("k").collect().toSeq)
    // and a dropped base column is still a hard error, not "evolution"
    val e = intercept[IllegalArgumentException] {
      Merge.upsert(out, evolved.drop("name"), Seq("k"))
    }
    assert(e.getMessage.contains("missing columns"))
  }

  test("schema evolution through the stored versioned table (applyTo)") {
    import org.apache.spark.sql.types.StringType
    val root = java.nio.file.Files.createTempDirectory("graft_evo").toString + "/t"
    Sinks.publishVersioned(base, root)
    val evolved = Seq((1L, "a2", 11.0, "gold", "upsert")).toDF("k", "name", "v", "tag", "op")
    Merge.applyTo(spark, root, evolved, Seq("k"))
    val cur = Sinks.readCurrent(spark, root)
    assert(cur.schema("tag").dataType == StringType && cur.schema("tag").nullable)
    assert(cur.count() == 3)
    assert(cur.filter(col("tag").isNull).count() == 2)
    // the pre-evolution snapshot is still readable with the OLD schema
    assert(Sinks.readVersion(spark, root, 0L).columns.toSeq == Seq("k", "name", "v"))
  }

  test("latestPerKey collapses a CDC stream to one newest row per key") {
    val cdc = Seq(
      (1L, 100L, "old", 1.0, "upsert"), (1L, 200L, "new", 2.0, "upsert"),
      (2L, 150L, "only", 3.0, "delete")
    ).toDF("k", "seq", "name", "v", "op")
    val out = Merge.latestPerKey(cdc, Seq("k"), Seq("seq"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((1L, 200L, "new"), (2L, 150L, "only")))
  }

  test("sequential deltas compose: apply d1 then d2 == apply key-wise-last-wins combine") {
    val d1 = Seq((1L, "a2", 11.0, "upsert"), (2L, "b", 20.0, "delete"),
      (4L, "d", 40.0, "upsert")).toDF("k", "name", "v", "op")
    val d2 = Seq((1L, "a3", 12.0, "upsert"), (4L, "d", 40.0, "delete"),
      (5L, "e", 50.0, "upsert")).toDF("k", "name", "v", "op")
    val sequential = Merge.upsert(Merge.upsert(base, d1, Seq("k")), d2, Seq("k"))
    val combined = Merge.latestPerKey(
      d1.withColumn("seq", lit(1)).unionByName(d2.withColumn("seq", lit(2))),
      Seq("k"), Seq("seq"))
    val atOnce = Merge.upsert(base, combined.drop("seq"), Seq("k"))
    assert(rows(sequential) == rows(atOnce))
  }

  test("streaming CDC apply: foreachBatch + applyTo lands the batch-merge result") {
    // Bounded stream of CDC files -> foreachBatch applies each batch to
    // the stored versioned table -> final table equals the one-shot batch
    // merge. Keys are disjoint across files so multi-batch apply order
    // cannot matter.
    val root = java.nio.file.Files.createTempDirectory("graft_smerge").toString + "/t"
    Sinks.publishVersioned(base, root)
    val src = java.nio.file.Files.createTempDirectory("graft_smerge_src").toString
    delta.filter(col("k") <= 2).write.parquet(s"$src/f1")
    delta.filter(col("k") > 2).write.parquet(s"$src/f2")
    val stream = spark.readStream.schema(delta.schema).parquet(s"$src/*")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_smerge_ck").toString
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) Merge.applyTo(spark, root, batch, Seq("k"))
        ()
      }
      .start()
    q.awaitTermination()
    assert(rows(Sinks.readCurrent(spark, root)) ==
      rows(Merge.upsert(base, delta, Seq("k"))))
  }

  test("publishVersioned detects a concurrent writer instead of clobbering it") {
    val root = java.nio.file.Files.createTempDirectory("graft_occ").toString + "/t"
    Sinks.publishVersioned(base, root) // v0
    val expected = Sinks.currentVersion(root)
    assert(Sinks.publishVersioned(base, root, expected) == 1L) // winner
    // a second writer based on the same v0 must fail, not silently win
    intercept[java.util.ConcurrentModificationException] {
      Sinks.publishVersioned(base, root, expected)
    }
    assert(Sinks.currentVersion(root).contains(1L))
    assert(rows(Sinks.readCurrent(spark, root)) == rows(base))
    // the loser's orphaned version dir was cleaned up
    val vdirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v")).map(_.getName).toSet
    assert(vdirs == Set("v0", "v1"), s"orphan left behind: $vdirs")
  }

  test("a crash between version write and pointer flip leaves readers on the old version") {
    // Simulate the writer dying after materializing v1 but BEFORE the
    // pointer rename: readers resolving through _CURRENT must still see
    // v0 complete — the whole point of the pointer-flip publish.
    val root = java.nio.file.Files.createTempDirectory("graft_crash").toString + "/t"
    Sinks.publishVersioned(base, root)
    // orphaned next version, no pointer flip (the crash window)
    Merge.upsert(base, delta, Seq("k")).write.parquet(s"$root/v1")
    assert(Sinks.currentVersion(root).contains(0L))
    assert(rows(Sinks.readCurrent(spark, root)) == rows(base))
    // the next successful publish skips past the orphaned reservation
    // (atomic createDirectory allocation) and supersedes it
    val v = Sinks.publishVersioned(Merge.upsert(base, delta, Seq("k")), root)
    assert(v == 2L)
    assert(rows(Sinks.readCurrent(spark, root)) == rows(Merge.upsert(base, delta, Seq("k"))))
  }

  test("applyTo merges into the stored versioned table; retry is a data no-op") {
    val root = java.nio.file.Files.createTempDirectory("graft_merge").toString + "/t"
    Sinks.publishVersioned(base, root)
    val v1 = Merge.applyTo(spark, root, delta, Seq("k"))
    assert(v1 == 1L)
    val expected = rows(Merge.upsert(base, delta, Seq("k")))
    assert(rows(Sinks.readCurrent(spark, root)) == expected)
    // a retried batch publishes a new version with identical data
    val v2 = Merge.applyTo(spark, root, delta, Seq("k"))
    assert(v2 == 2L)
    assert(rows(Sinks.readCurrent(spark, root)) == expected)
  }
}
