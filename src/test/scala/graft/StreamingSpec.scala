package graft

import java.sql.Timestamp

import graft.io.Tables
import graft.streaming.{StreamOps, UserCounter, UserEvent}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2B B47–B55: streaming semantics that DuckDB cannot oracle —
  * batch≡streaming equivalence, watermark late-data drops, keyed state,
  * streaming dedup, stream–stream joins, output modes, triggers.
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def assertSameRows(got: DataFrame, expected: DataFrame): Unit = {
    assert(got.count() == expected.count(),
      s"row count ${got.count()} != ${expected.count()}")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      "symmetric difference non-empty")
  }

  test("B47/B53/B54 tumbling window: streaming complete-mode equals batch twin") {
    val stream = StreamOps.eventsStream(spark, sf001)
    val q = StreamOps.tumblingAgg(stream).writeStream
      .format("memory").queryName("tumb_stream")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("tumb_stream")
    val expected = StreamOps.tumblingAgg(Tables.events(spark, sf001))
    assertSameRows(got, expected)
  }

  test("B48 sliding window: streaming complete-mode equals batch twin") {
    val stream = StreamOps.eventsStream(spark, sf001)
    val q = StreamOps.slidingAgg(stream).writeStream
      .format("memory").queryName("slide_stream")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    assertSameRows(spark.table("slide_stream"),
      StreamOps.slidingAgg(Tables.events(spark, sf001)))
  }

  test("B49 session window: append-mode streaming equals batch on flushed sessions") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val sessioned = StreamOps.sessionAgg(
      input.toDF().withWatermark("ts", "10 minutes"))
    val q = sessioned.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    val real = Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0),   // same session
      UserEvent(3, ts("2024-01-01 10:30:00"), 1, "click", 1.0),  // new session (gap 25m)
      UserEvent(4, ts("2024-01-01 10:02:00"), 2, "click", 1.0))
    input.addData(real)
    q.processAllAvailable()
    // sentinels push the watermark far past every real session end
    input.addData(Seq(UserEvent(98, ts("2024-01-01 13:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(99, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_stream").filter($"user_id" =!= 99)
    val expected = StreamOps.sessionAgg(real.toDF())
    assertSameRows(got, expected)
  }

  test("B50 watermark drops late data in append mode") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val agg = StreamOps.tumblingAgg(
      StreamOps.withLatenessPolicy(input.toDF(), "10 minutes"))
    val q = agg.writeStream.format("memory").queryName("late_stream")
      .outputMode("append").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 12:00:00"), 1, "click", 1.0)))
    q.processAllAvailable() // watermark -> 11:50; hour 10 finalized next batch
    input.addData(Seq(
      UserEvent(3, ts("2024-01-01 10:10:00"), 1, "click", 1.0), // LATE: dropped
      UserEvent(4, ts("2024-01-01 12:10:00"), 1, "click", 1.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(9, ts("2024-01-01 14:00:00"), 9, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val hour10 = spark.table("late_stream")
      .filter($"ws" === ts("2024-01-01 10:00:00")).select("n").as[Long].collect()
    assert(hour10.toSeq == Seq(1L), s"late row leaked into hour-10 window: ${hour10.toSeq}")
  }

  test("B52 mapGroupsWithState running counters accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = StreamOps.runningCounters(input.toDS()).writeStream
      .format("memory").queryName("counter_stream")
      .outputMode("update").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0),
      UserEvent(3, ts("2024-01-01 10:02:00"), 2, "view", 5.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(4, ts("2024-01-01 10:03:00"), 1, "buy", 3.0)))
    q.processAllAvailable()
    q.stop()
    // latest update per user = the accumulated state
    val finalPerUser = spark.table("counter_stream").as[UserCounter]
      .collect().groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    assert(finalPerUser(1L) == UserCounter(1L, 3L, 6.0))
    assert(finalPerUser(2L) == UserCounter(2L, 1L, 5.0))
  }

  test("B52 flatMapGroupsWithState emits exactly one alert at threshold crossing") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = StreamOps.thresholdAlerts(input.toDS(), 10.0).writeStream
      .format("memory").queryName("alert_stream")
      .outputMode("append").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "buy", 6.0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 2, "buy", 1.0)))
    q.processAllAvailable() // nobody crossed
    input.addData(Seq(
      UserEvent(3, ts("2024-01-01 10:02:00"), 1, "buy", 5.0),   // user1 crosses (11)
      UserEvent(4, ts("2024-01-01 10:03:00"), 2, "buy", 2.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(5, ts("2024-01-01 10:04:00"), 1, "buy", 9.0)))
    q.processAllAvailable() // user1 already alerted: no second alert
    q.stop()
    val alerts = spark.table("alert_stream").as[UserCounter].collect()
    assert(alerts.length == 1 && alerts.head.user_id == 1L && alerts.head.total_value == 11.0,
      s"unexpected alerts: ${alerts.toSeq}")
  }

  test("B51 streaming dedup keeps first occurrence per event_id across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = StreamOps.dedupStream(input.toDF(), "1 hour").writeStream
      .format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "click", 1.0)))
    q.processAllAvailable()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0), // dup
      UserEvent(3, ts("2024-01-01 10:05:00"), 2, "view", 1.0)))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("B25 stream-stream interval join matches its batch-mode evaluation") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val clicks = MemoryStream[UserEvent]
    val purchases = MemoryStream[UserEvent]
    val joined = StreamOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
    val q = joined.writeStream.format("memory").queryName("join_stream")
      .outputMode("append").start()
    val cData = Seq(
      UserEvent(10, ts("2024-01-01 10:00:00"), 1, "click", 0),
      UserEvent(11, ts("2024-01-01 09:00:00"), 2, "click", 0))
    val pData = Seq(
      UserEvent(20, ts("2024-01-01 10:30:00"), 1, "purchase", 0), // within 1h of click 10
      UserEvent(21, ts("2024-01-01 11:30:00"), 1, "purchase", 0), // > 1h after click 10
      UserEvent(22, ts("2024-01-01 10:30:00"), 3, "purchase", 0)) // no click
    clicks.addData(cData); purchases.addData(pData)
    q.processAllAvailable(); q.stop()
    val got = spark.table("join_stream").select("click_id", "purchase_id")
      .as[(Long, Long)].collect().toSet
    // same function on bounded frames = batch semantics (watermark no-op)
    val batch = StreamOps.clickPurchaseJoin(cData.toDF(), pData.toDF())
      .select("click_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 20L)) && got == batch)
  }

  test("B52 transformWithState running counters match mapGroupsWithState semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // transformWithState needs per-state-variable column families =>
    // RocksDB provider (the scale-grade store; HDFS-backed can't do it)
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = StreamOps.runningCountersTws(input.toDS()).writeStream
      .format("memory").queryName("tws_stream")
      .outputMode("update").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0),
      UserEvent(3, ts("2024-01-01 10:02:00"), 2, "view", 5.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(4, ts("2024-01-01 10:03:00"), 1, "buy", 3.0)))
    q.processAllAvailable()
    q.stop()
    prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    val finalPerUser = spark.table("tws_stream").as[UserCounter]
      .collect().groupBy(_.user_id).map { case (u, rows) => u -> rows.maxBy(_.n_events) }
    assert(finalPerUser(1L) == UserCounter(1L, 3L, 6.0))
    assert(finalPerUser(2L) == UserCounter(2L, 1L, 5.0))
  }

  test("B52 custom sessionize (EventTimeTimeout) matches built-in session_window semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val sessions = StreamOps.sessionize(
      input.toDS().withWatermark("ts", "10 minutes").as[graft.streaming.UserEvent], 10)
    val q = sessions.writeStream.format("memory").queryName("sessz_stream")
      .outputMode("append").start()
    val real = Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0),   // session A
      UserEvent(3, ts("2024-01-01 10:30:00"), 1, "click", 1.0),  // session B (gap 25m)
      UserEvent(4, ts("2024-01-01 10:02:00"), 2, "click", 1.0))  // session C
    input.addData(real)
    q.processAllAvailable()
    // watermark push so open sessions time out
    input.addData(Seq(UserEvent(98, ts("2024-01-01 13:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(99, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessz_stream")
      .filter($"user_id" =!= 99)
      .select("user_id", "session_start", "session_end", "n_events")
    // must equal the built-in session_window batch aggregation exactly
    val expected = StreamOps.sessionAgg(real.toDF())
    assert(got.count() == 3)
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"sessionize != session_window:\ngot=${got.collect().mkString(",")}\nexp=${expected.collect().mkString(",")}")
  }

  test("B52 sessionize merges an out-of-order cross-batch event instead of splitting") {
    // The latent bug this pins: an earlier-timestamped event arriving in a
    // later batch used to overwrite lastMs BACKWARD (never extending
    // startMs), so the next in-gap event falsely closed the session.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val sessions = StreamOps.sessionize(
      input.toDS().withWatermark("ts", "10 minutes").as[graft.streaming.UserEvent], 10)
    val q = sessions.writeStream.format("memory").queryName("sessz_ooo")
      .outputMode("append").start()
    val b1 = Seq(UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
    val b2 = Seq(
      UserEvent(2, ts("2024-01-01 09:56:00"), 1, "view", 1.0),  // late, in-gap
      UserEvent(3, ts("2024-01-01 10:07:00"), 1, "click", 1.0))
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(Seq(UserEvent(98, ts("2024-01-01 13:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(99, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessz_ooo").filter($"user_id" === 1L)
      .select("user_id", "session_start", "session_end", "n_events")
    // must equal the built-in session_window over the SAME events: one
    // merged session [09:56, 10:17) with 3 events
    val expected = StreamOps.sessionAgg((b1 ++ b2).toDF()).filter($"user_id" === 1L)
    assert(got.count() == 1, s"split session: ${got.collect().mkString(",")}")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"ooo sessionize != session_window:\ngot=${got.collect().mkString(",")}\nexp=${expected.collect().mkString(",")}")
  }

  test("B52 sessionize boundary cases match session_window: exact-gap merge, straggler fold, backward absorb") {
    // Three behaviors this pins against the built-in session_window oracle:
    // user 1 — two events EXACTLY gapMs apart must MERGE whichever order
    //          they arrive in (session_window's boundary is inclusive; the
    //          forward rule used to be strict and split the in-order case);
    // user 2 — two stale stragglers within gap of each other must fold
    //          into ONE session (used to emit per-event singletons);
    // user 3 — a backward extension of the open session that comes within
    //          gap of a pending stale run must absorb it.
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val sessions = StreamOps.sessionize(
      input.toDS().withWatermark("ts", "70 minutes").as[graft.streaming.UserEvent], 10)
    val q = sessions.writeStream.format("memory").queryName("sessz_edge")
      .outputMode("append").start()
    val b1 = Seq(
      UserEvent(1, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 11:00:00"), 2, "click", 1.0),
      UserEvent(3, ts("2024-01-01 10:10:00"), 3, "click", 1.0))
    val b2 = Seq(
      UserEvent(4, ts("2024-01-01 10:00:00"), 1, "view", 1.0),  // exactly gap before → merge
      UserEvent(5, ts("2024-01-01 10:00:00"), 2, "view", 1.0),  // stale vs 11:00 …
      UserEvent(6, ts("2024-01-01 10:05:00"), 2, "view", 1.0),  // … folds with 10:00
      UserEvent(7, ts("2024-01-01 09:55:00"), 3, "view", 1.0),  // stale vs 10:10 …
      UserEvent(8, ts("2024-01-01 10:02:00"), 3, "view", 1.0))  // … extends open back, absorbs 09:55
    input.addData(b1); q.processAllAvailable()
    input.addData(b2); q.processAllAvailable()
    input.addData(Seq(UserEvent(98, ts("2024-01-01 13:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(99, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessz_edge").filter($"user_id" =!= 99L)
      .select("user_id", "session_start", "session_end", "n_events")
    val expected = StreamOps.sessionAgg((b1 ++ b2).toDF())
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"sessionize edge != session_window:\ngot=${got.collect().mkString(",")}\nexp=${expected.collect().mkString(",")}")
  }

  test("B52 sessionize: a still-legal late event BRIDGES two pending sessions (no eager emission)") {
    // The divergence this pins (caught in review): with watermark delay >
    // gap, an eager emitter closes a stale run at batch end; a later
    // still-legal event that would have merged it with the open session
    // then produces split/overlapping sessions. Emission must be
    // watermark-gated: gap=10m, delay=20m; events 12:00 / 11:45 / 11:52
    // across THREE batches are ONE session [11:45, 12:10).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val sessions = StreamOps.sessionize(
      input.toDS().withWatermark("ts", "20 minutes").as[graft.streaming.UserEvent], 10)
    val q = sessions.writeStream.format("memory").queryName("sessz_bridge")
      .outputMode("append").start()
    val all = Seq(
      UserEvent(1, ts("2024-01-01 12:00:00"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 11:45:00"), 1, "view", 1.0),
      UserEvent(3, ts("2024-01-01 11:52:00"), 1, "view", 1.0))
    all.foreach { e => input.addData(Seq(e)); q.processAllAvailable() }
    // watermark pushes so every session drains
    input.addData(Seq(UserEvent(98, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    input.addData(Seq(UserEvent(99, ts("2024-01-01 18:00:00"), 99, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessz_bridge").filter($"user_id" === 1L)
      .select("user_id", "session_start", "session_end", "n_events")
    val expected = StreamOps.sessionAgg(all.toDF()).filter($"user_id" === 1L)
    assert(got.count() == 1,
      s"late bridge split the session: ${got.collect().mkString(",")}")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
      s"bridge != session_window:\ngot=${got.collect().mkString(",")}\nexp=${expected.collect().mkString(",")}")
  }

  test("streaming MERGE crash recovery: kill after an applied-but-uncommitted batch, restart resumes exactly-once") {
    // The exactly-once-EFFECT proof for the CDC path: the query is killed
    // AFTER batch 1's merge has been applied to the versioned table but
    // BEFORE the checkpoint commit for batch 1 lands (the worst crash
    // window — side effect done, progress not recorded). The restarted
    // incarnation replays batch 1; Merge.applyTo is idempotent on the
    // data, so the final table must equal an uninterrupted run's.
    import spark.implicits._
    import graft.ops.{Merge, Sinks}
    val scratch = java.nio.file.Files.createTempDirectory("graft_crash")
    StreamOps.cleanOnExit(scratch)
    val srcDir = java.nio.file.Files.createDirectory(scratch.resolve("cdc"))

    // one CDC file per micro-batch (maxFilesPerTrigger=1), mtimes spaced
    // so the file source delivers them oldest-first in a fixed order
    def writeCdcFile(name: String, rows: Seq[(Long, String, Double, String, Long)], mtime: Long): Unit = {
      val tmp = scratch.resolve(s"tmp_$name")
      rows.toDF("k", "name", "v", "op", "seq").coalesce(1).write.parquet(tmp.toString)
      val part = graft.io.Fs.listDir(tmp).find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = srcDir.resolve(s"$name.parquet")
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(mtime))
      graft.io.Fs.deleteRecursively(tmp)
    }
    val t0 = 1700000000000L
    writeCdcFile("f0", Seq((1L, "a2", 10.0, "upsert", 1L), (6L, "f", 60.0, "upsert", 2L)), t0)
    writeCdcFile("f1", Seq((2L, "b", 0.0, "delete", 3L), (1L, "a3", 11.0, "upsert", 4L)), t0 + 10000)
    writeCdcFile("f2", Seq((7L, "g", 70.0, "upsert", 5L), (3L, "c", 0.0, "delete", 6L)), t0 + 20000)

    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, "d", 4.0), (5L, "e", 5.0))
      .toDF("k", "name", "v")

    def runPipeline(root: String, ckpt: String, crashAtBatch: Option[Long]): Unit = {
      var crashed = true
      while (crashed) {
        crashed = false
        val q = spark.readStream
          .schema("k BIGINT, name STRING, v DOUBLE, op STRING, seq BIGINT")
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir.toString)
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch { (batch: DataFrame, batchId: Long) =>
            if (!batch.isEmpty) {
              val delta = Merge.latestPerKey(batch, Seq("k"), Seq("seq")).drop("seq")
              Merge.applyTo(spark, root, delta, Seq("k"))
            }
            // crash AFTER the side effect, BEFORE the checkpoint commit
            if (crashAtBatch.contains(batchId))
              throw new RuntimeException("injected crash")
            ()
          }
          .start()
        try q.awaitTermination()
        catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException
              if e.getMessage.contains("injected crash") =>
            crashed = crashAtBatch.isDefined
        }
        // second incarnation must not crash again
        if (crashed) return runPipeline(root, ckpt, None)
      }
    }

    val rootA = scratch.resolve("tA").toString // crash + restart
    val rootB = scratch.resolve("tB").toString // uninterrupted twin
    Sinks.publishVersioned(base, rootA)
    Sinks.publishVersioned(base, rootB)
    runPipeline(rootA, scratch.resolve("ckA").toString, crashAtBatch = Some(1L))
    runPipeline(rootB, scratch.resolve("ckB").toString, crashAtBatch = None)

    val got = Sinks.readCurrent(spark, rootA)
    val expected = Sinks.readCurrent(spark, rootB)
    assertSameRows(got, expected)
    // and the recovered state is the correct merge outcome
    val rows = got.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(rows == Seq((1L, "a3", 11.0), (4L, "d", 4.0), (5L, "e", 5.0),
      (6L, "f", 60.0), (7L, "g", 70.0)), s"wrong recovered state: $rows")
  }

  test("B52 ListState recent-events keeps a bounded, ordered last-N across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = StreamOps.recentEvents(input.toDS(), maxN = 3).writeStream
      .format("memory").queryName("recent_stream")
      .outputMode("update").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "a", 0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "b", 0)))
    q.processAllAvailable()
    input.addData(Seq(
      UserEvent(3, ts("2024-01-01 10:02:00"), 1, "c", 0),
      UserEvent(4, ts("2024-01-01 10:03:00"), 1, "d", 0)))
    q.processAllAvailable()
    q.stop()
    prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    val last = spark.table("recent_stream")
      .as[graft.streaming.RecentEvents].collect()
      .filter(_.user_id == 1L).maxBy(_.event_ids.max)
    assert(last.event_ids == Seq(2L, 3L, 4L), s"got ${last.event_ids}")
  }

  test("B52 MapState per-type counts accumulate independently per key") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val q = StreamOps.typeCounts(input.toDS()).writeStream
      .format("memory").queryName("typecount_stream")
      .outputMode("update").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "view", 0)))
    q.processAllAvailable()
    input.addData(Seq(
      UserEvent(3, ts("2024-01-01 10:02:00"), 1, "click", 0),
      UserEvent(4, ts("2024-01-01 10:03:00"), 2, "click", 0)))
    q.processAllAvailable()
    q.stop()
    prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    val latest = spark.table("typecount_stream")
      .as[graft.streaming.TypeCount].collect()
      .groupBy(t => (t.user_id, t.event_type))
      .map { case (k, rows) => k -> rows.map(_.n).max }
    assert(latest((1L, "click")) == 2L)
    assert(latest((1L, "view")) == 1L)
    assert(latest((2L, "click")) == 1L)
  }

  test("B52 event-time timers: idle alert fires once the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[UserEvent]
    val alerts = StreamOps.idleAlerts(
      input.toDS().withWatermark("ts", "0 seconds").as[graft.streaming.UserEvent],
      idleMs = 10 * 60000L)
    val q = alerts.writeStream.format("memory").queryName("idle_stream")
      .outputMode("append").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 0),
      UserEvent(2, ts("2024-01-01 10:02:00"), 1, "click", 0)))
    q.processAllAvailable() // watermark 10:02, timer armed for 10:12
    input.addData(Seq(UserEvent(3, ts("2024-01-01 10:05:00"), 2, "view", 0)))
    q.processAllAvailable() // watermark 10:05: user1 timer not yet due
    val early = spark.table("idle_stream").count()
    input.addData(Seq(UserEvent(4, ts("2024-01-01 11:00:00"), 3, "view", 0)))
    q.processAllAvailable() // watermark 11:00: both user1+user2 idle
    q.stop()
    prevProv.fold(spark.conf.unset(provKey))(spark.conf.set(provKey, _))
    assert(early == 0, s"alert fired before idle gap elapsed ($early rows)")
    val got = spark.table("idle_stream").as[graft.streaming.IdleAlert]
      .collect().map(a => a.user_id -> ((a.last_seen.toString, a.n_events))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L) == (("2024-01-01 10:02:00.0", 2L)))
    assert(got(2L) == (("2024-01-01 10:05:00.0", 1L)))
  }

  test("observe() metrics surface row counts without a second pass") {
    val obs = new org.apache.spark.sql.Observation("verify_metrics")
    val df = graft.io.Tables.orders(spark, TestSpark.sf001)
      .observe(obs, count(lit(1)).as("rows"),
        sum(col("o_totalprice")).as("total"))
    val n = df.count()
    val row = obs.get
    assert(row("rows") == n)
    assert(row("total").asInstanceOf[Double] > 0)
  }

  test("B7 foreachBatch sink writes every micro-batch exactly once") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val outDir = java.nio.file.Files.createTempDirectory("feb").toString
    val input = MemoryStream[UserEvent]
    val q = input.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.write.mode("append").parquet(s"$outDir/data")
      }
      .outputMode("append").start()
    input.addData(Seq(UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0)))
    q.processAllAvailable()
    input.addData(Seq(
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "view", 2.0),
      UserEvent(3, ts("2024-01-01 10:02:00"), 2, "view", 3.0)))
    q.processAllAvailable()
    q.stop()
    val written = spark.read.parquet(s"$outDir/data")
    assert(written.count() == 3)
    assert(written.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("B51 dropDuplicatesWithinWatermark variant also dedups in-window duplicates") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[UserEvent]
    val q = StreamOps.dedupWithinWatermark(input.toDF(), "1 hour").writeStream
      .format("memory").queryName("dedup_wm_stream")
      .outputMode("append").start()
    input.addData(Seq(
      UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      UserEvent(1, ts("2024-01-01 10:00:30"), 1, "click", 1.0),
      UserEvent(2, ts("2024-01-01 10:01:00"), 1, "view", 1.0)))
    q.processAllAvailable(); q.stop()
    val ids = spark.table("dedup_wm_stream").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L))
  }

  test("continuousSync keeps a replica converged on a processing-time tick (A12 analog)") {
    import graft.ops.Sinks
    import graft.streaming.StreamOps
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_csync").toString
    val src = s"$base/src"
    val rep = s"$base/rep"
    Sinks.publishVersioned(Seq(1L -> "a", 2L -> "b").toDF("k", "s"), src, None)
    val q = StreamOps.continuousSync(spark, src, rep, Seq("k"), every = "250 milliseconds")
    try {
      def converged(expect: Set[(Long, String)]): Boolean = {
        val deadline = System.currentTimeMillis() + 30000
        var ok = false
        while (!ok && System.currentTimeMillis() < deadline) {
          ok = Sinks.currentVersion(rep).exists { _ =>
            Sinks.readCurrent(spark, rep).as[(Long, String)].collect().toSet == expect
          }
          if (!ok) Thread.sleep(200)
        }
        ok
      }
      assert(converged(Set(1L -> "a", 2L -> "b")), "bootstrap sync never landed")
      // source moves on while the query ticks: update + delete + insert
      Sinks.publishVersioned(Seq(1L -> "a2", 3L -> "c").toDF("k", "s"), src, Some(0L))
      assert(converged(Set(1L -> "a2", 3L -> "c")), "incremental sync never landed")
    } finally q.stop()
  }

  test("continuousSync survives failing ticks (source not yet published) and converges later") {
    import graft.ops.Sinks
    import graft.streaming.StreamOps
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_csync2").toString
    val src = s"$base/src"
    val rep = s"$base/rep"
    // start syncing BEFORE the source exists: every early tick throws
    // inside syncReplica and must be swallowed, not kill the query
    val q = StreamOps.continuousSync(spark, src, rep, Seq("k"), every = "200 milliseconds")
    try {
      Thread.sleep(1500) // let several failing ticks elapse
      assert(q.isActive, "query died on a failing tick")
      Sinks.publishVersioned(Seq(1L -> "a").toDF("k", "s"), src, None)
      val deadline = System.currentTimeMillis() + 30000
      var ok = false
      while (!ok && System.currentTimeMillis() < deadline) {
        ok = Sinks.currentVersion(rep).exists(_ =>
          Sinks.readCurrent(spark, rep).as[(Long, String)].collect().toSet == Set(1L -> "a"))
        if (!ok) Thread.sleep(200)
      }
      assert(ok, "sync never recovered after the source appeared")
    } finally q.stop()
  }

  test("B52 sessionize on the RocksDB state store: identical output, state survives restart") {
    // The 100×-state path: the default (HDFS-backed) provider keeps all
    // keyed state on the JVM heap; RocksDB spills to native memory +
    // local disk, which is what survives wide key spaces on a real
    // cluster. Same pipeline, same semantics — this pins (a) the output
    // is bit-identical to the batch twin, (b) the provider really is
    // RocksDB (its custom metrics appear in progress), and (c) a
    // checkpoint stop/restart carries RocksDB state across incarnations
    // (an event after the restart MERGES into a pre-restart session).
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocks_ck")
    StreamOps.cleanOnExit(ckpt)
    try {
      val input = MemoryStream[UserEvent]
      val sessions = StreamOps.sessionize(
        input.toDS().withWatermark("ts", "10 minutes").as[graft.streaming.UserEvent], 10)
      // memory sink refuses checkpoint recovery; a foreachBatch collector
      // supports it (tiny test output — the collect is test-only)
      val emitted = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]()
      def start() = sessions.toDF().writeStream
        .option("checkpointLocation", ckpt.toString).outputMode("append")
        .foreachBatch { (batch: DataFrame, _: Long) =>
          emitted.synchronized { emitted ++= batch.collect() }; ()
        }.start()

      // incarnation 1: open sessions only (nothing emitted yet)
      val q1 = start()
      val batch1 = Seq(
        UserEvent(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        UserEvent(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        UserEvent(3, ts("2024-01-01 10:02:00"), 2, "click", 1.0))
      input.addData(batch1)
      q1.processAllAvailable()
      val metrics = Option(q1.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"RocksDB provider not in use; state metrics: $metrics")
      q1.stop()

      // incarnation 2, same checkpoint: 10:07 must MERGE into user 1's
      // pre-restart session (state carried), then watermark pushes flush
      val q2 = start()
      val batch2 = Seq(UserEvent(4, ts("2024-01-01 10:07:00"), 1, "click", 1.0))
      input.addData(batch2)
      q2.processAllAvailable()
      input.addData(Seq(UserEvent(98, ts("2024-01-01 13:00:00"), 99, "click", 0.0)))
      q2.processAllAvailable()
      input.addData(Seq(UserEvent(99, ts("2024-01-01 15:00:00"), 99, "click", 0.0)))
      q2.processAllAvailable()
      q2.stop()

      val got = spark.createDataFrame(
          spark.sparkContext.parallelize(emitted.synchronized(emitted.toList)),
          sessions.schema)
        .filter($"user_id" =!= 99)
        .select("user_id", "session_start", "session_end", "n_events")
      val expected = StreamOps.sessionAgg((batch1 ++ batch2).toDF())
      assert(got.count() == 2, s"expected 2 sessions, got ${got.collect().mkString(",")}")
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        s"RocksDB run != batch twin:\ngot=${got.collect().mkString(",")}\n" +
          s"exp=${expected.collect().mkString(",")}")
      // the merged session proves cross-restart state: 3 events, 10:00–10:07
      val s1 = got.filter($"user_id" === 1).head()
      assert(s1.getAs[Long]("n_events") == 3L, s"restart split the session: $s1")
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
