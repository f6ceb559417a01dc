package graft

import java.util.ConcurrentModificationException

import graft.ops.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-writer auto-rebase (round-12 verdict item 1): a linked
  * commit that loses an OCC race re-stages against the moved table and
  * commits, iff the interleaved commits provably commute with it —
  * blind appends over anything contract-preserving, merge-on-read DV
  * commits over disjoint files. Everything else keeps the honest CME.
  *
  * The stale-base writer is driven DETERMINISTICALLY by handing
  * `appendVersioned`/`morPublish` an explicit `expected` the table has
  * already moved past — exactly the state a real race leaves — plus one
  * genuinely concurrent leg with racing threads.
  */
class RebaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_rebase_$tag").toString + "/t"

  private def rows(ids: Long*): org.apache.spark.sql.DataFrame =
    ids.toDF("id").withColumn("v", col("id") * 10)

  test("two interleaved blind appenders both commit; final state = serial equivalent") {
    val root = tmp("appapp")
    Sinks.publishVersioned(rows(1L), root, None)
    // writer A and writer B both base on v0; B commits first
    val vb = Sinks.appendVersioned(rows(2L), root, Some(0L))
    assert(vb == 1L)
    // A's base is stale — pre-round-12 this threw CME; now it rebases
    val va = Sinks.appendVersioned(rows(3L), root, Some(0L))
    assert(va == 2L, "the rebased append must commit as the NEXT version")
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L), s"serial-equivalent state expected, got $got")
    // both commits are real history: base chain v0 -> v1 -> v2
    assert(Sinks.listVersions(root) == Seq(0L, 1L, 2L))
  }

  test("a blind appender racing a MOR DELETE rebases; final state = serial equivalent") {
    val root = tmp("appdel")
    Sinks.publishVersioned(rows(1L, 2L, 3L), root, None)
    assert(Sinks.deleteVector(spark, root, col("id") === 2L) == 1L)
    // appender staged against v0 — the delete commuted (it touches only
    // v0's files, the append only adds new ones)
    val va = Sinks.appendVersioned(rows(4L), root, Some(0L))
    assert(va == 2L)
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L), s"delete + append must both apply, got $got")
  }

  test("a MOR DELETE racing a blind append rebases when its files are untouched") {
    val root = tmp("delapp")
    Sinks.publishVersioned(rows(1L, 2L, 3L), root, None)
    // stage the delete's frames against v0, then let an append win the race
    val dir0 = Sinks.versionPath(root, 0L)
    val live0 = Sinks.liveWithPositions(spark, root, dir0)
    val matched = live0.filter(col("id") === 2L)
    val delta = matched.select(col("_dv_key").as("file"), col("_dv_pos").as("row_index"))
    val feed = matched.select(col("id"), col("v"))
      .withColumn("_change_type", lit("delete"))
    val newRows = live0.limit(0).select(col("id"), col("v"))
    assert(Sinks.appendVersioned(rows(4L), root, Some(0L)) == 1L)
    // the delete's vector references v0 files, which v1 carried by
    // hardlink untouched — provably disjoint, so it rebases
    val vd = Sinks.morPublish(spark, root, 0L, newRows, delta, feed,
      skipDataWrite = true)
    assert(vd == 2L)
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L), s"append + delete must both apply, got $got")
  }

  test("two MOR DELETEs on DISJOINT files both commit; on the SAME file the loser keeps the CME") {
    val root = tmp("deldel")
    // two files: ids 1-2 in one, ids 3-4 in the other (two one-partition writes)
    Sinks.publishVersioned(rows(1L, 2L).repartition(1), root, None)
    Sinks.appendVersioned(rows(3L, 4L).repartition(1), root, Some(0L))
    val dir1 = Sinks.versionPath(root, 1L)
    def staleDelete(id: Long): Long = {
      val live = Sinks.liveWithPositions(spark, root, dir1)
      val matched = live.filter(col("id") === id)
      Sinks.morPublish(spark, root, 1L,
        live.limit(0).select(col("id"), col("v")),
        matched.select(col("_dv_key").as("file"), col("_dv_pos").as("row_index")),
        matched.select(col("id"), col("v")).withColumn("_change_type", lit("delete")),
        skipDataWrite = true)
    }
    // delete id=1 (file A) commits at v2; a stale delete of id=3 (file B)
    // based on v1 rebases — disjoint files
    assert(Sinks.deleteVector(spark, root, col("id") === 1L) == 2L)
    assert(staleDelete(3L) == 3L)
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L), s"both deletes must apply, got $got")
    // same-file conflict: id=2 lives in file A alongside the already-
    // deleted id=1; a stale delete based on v1 must REFUSE (a DV part
    // added since touches its file)
    val dir3 = Sinks.versionPath(root, 3L)
    val liveNow = Sinks.liveWithPositions(spark, root, dir1)
    val m2 = liveNow.filter(col("id") === 2L)
    val e = intercept[ConcurrentModificationException] {
      Sinks.morPublish(spark, root, 1L,
        liveNow.limit(0).select(col("id"), col("v")),
        m2.select(col("_dv_key").as("file"), col("_dv_pos").as("row_index")),
        m2.select(col("id"), col("v")).withColumn("_change_type", lit("delete")),
        skipDataWrite = true)
    }
    assert(e.getMessage.contains("recompute"), s"honest CME expected: ${e.getMessage}")
    assert(java.nio.file.Files.isDirectory(java.nio.file.Paths.get(dir3)))
  }

  /** Drive a copy-on-write delete against an EXPLICIT base version —
    * the snapshot-pinned shape GraftDml builds: touched = files holding
    * matching rows, rewritten = their surviving rows, everything else
    * carried. A stale base exercises CowRebase.
    */
  private def staleCowDelete(root: String, baseV: Long,
      pred: org.apache.spark.sql.Column): Long = {
    val dir = Sinks.versionPath(root, baseV)
    val all = graft.io.Fs.walkParquet(java.nio.file.Paths.get(dir))
      .map(_.toString)
    val withFile = spark.read.parquet(all: _*)
      .withColumn("_f", input_file_name())
    val touchedAbs = withFile.filter(pred).select("_f").distinct()
      .collect().map(r =>
        java.nio.file.Paths.get(new java.net.URI(r.getString(0))).toString).toSeq
    val touchedRel = touchedAbs
      .map(_.stripPrefix(dir.stripSuffix("/") + "/")).toSet
    val kept = spark.read.parquet(touchedAbs: _*)
      .filter(!coalesce(pred, lit(false)))
      .select(col("id"), col("v"))
    Sinks.cowPublish(spark, root, baseV, touchedRel, kept)
  }

  test("a COW DELETE racing a blind append rebases (disjoint files); state = serial") {
    val root = tmp("cowapp")
    Sinks.publishVersioned(rows(1L, 2L, 3L, 4L).repartition(1), root, None)
    // the append wins the race; the COW staged against v0 rebases on top
    assert(Sinks.appendVersioned(rows(5L).repartition(1), root, Some(0L)) == 1L)
    assert(staleCowDelete(root, 0L, col("id") === 2L) == 2L)
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 4L, 5L), s"append + COW delete must both apply, got $got")
    assert(Sinks.listVersions(root) == Seq(0L, 1L, 2L))
  }

  test("two COW DELETEs on DISJOINT files both commit; overlapping COW keeps the CME") {
    val root = tmp("cowcow")
    // file A: ids 1-2; file B: ids 3-4
    Sinks.publishVersioned(rows(1L, 2L).repartition(1), root, None)
    Sinks.appendVersioned(rows(3L, 4L).repartition(1), root, Some(0L))
    // COW on file A commits at v2; a stale COW on file B (based v1) rebases
    assert(staleCowDelete(root, 1L, col("id") === 1L) == 2L)
    assert(staleCowDelete(root, 1L, col("id") === 3L) == 3L)
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == Set(2L, 4L), s"both disjoint COWs must apply, got $got")
    // OVERLAP: a stale COW touching file A — already rewritten at v2, its
    // key no longer live — must keep the honest CME
    val e = intercept[ConcurrentModificationException](
      staleCowDelete(root, 1L, col("id") === 2L))
    assert(e.getMessage.contains("recompute"), e.getMessage)
    // and a COW racing a MOR DELETE on the SAME file refuses too (the
    // DV part added since references its touched file)
    val root2 = tmp("cowmor")
    Sinks.publishVersioned(rows(1L, 2L).repartition(1), root2, None)
    assert(Sinks.deleteVector(spark, root2, col("id") === 1L) == 1L)
    intercept[ConcurrentModificationException](
      staleCowDelete(root2, 0L, col("id") === 2L))
  }

  test("rebase refuses when the write contract moved: partition evolution, retyped column") {
    // a concurrent partition evolution: the stale delta was laid out
    // under the old spec — the version-local _PSPEC comparison refuses
    // (the CHECK-constraint/props drift gate follows the same refusal
    // path but only arises from a REAL interleaving: props are captured
    // at staging time, so it cannot be driven deterministically here)
    val root = tmp("refuse")
    Sinks.publishVersioned(rows(1L), root, None)
    Sinks.repartitionTable(spark, root, Seq("id")) // v1, now partitioned
    intercept[ConcurrentModificationException] {
      Sinks.appendVersioned(rows(3L), root, Some(0L))
    }
    // a concurrent full publish that RETYPED a column: stale delta files
    // carry the old type — refuse
    val root2 = tmp("refuse2")
    Sinks.publishVersioned(rows(1L), root2, None)
    Sinks.publishVersioned(
      rows(1L).withColumn("v", col("v").cast("double")), root2, Some(0L))
    intercept[ConcurrentModificationException] {
      Sinks.appendVersioned(rows(2L), root2, Some(0L))
    }
  }

  test("rebase refuses when a scheme sidecar (ANN quantizer) swapped underneath") {
    val root = tmp("refusescheme")
    val emb = graft.io.Tables.embeddings(spark, TestSpark.sf001)
    graft.ops.AnnIndex.buildFixed(spark, emb, root)
    // a rebuild between base and commit re-files every row under a NEW
    // quantizer; a stale append assigned under the old one must refuse
    graft.ops.AnnIndex.buildLearned(spark, emb.select("vec_id", "embedding"),
      root, k = 3, iters = 2)
    val stale = Sinks.readVersion(spark, root, 0L).limit(5)
      .withColumn("vec_id", col("vec_id") + 100000L)
    intercept[ConcurrentModificationException] {
      Sinks.appendVersioned(stale, root, Some(0L))
    }
  }

  test("N genuinely concurrent appenders all succeed without caller retries") {
    val root = tmp("threads")
    Sinks.publishVersioned(rows(0L), root, None)
    val n = 8
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to n).map { i =>
      new Thread(() => {
        try Sinks.appendVersioned(rows(i.toLong), root, Sinks.currentVersion(root))
        catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"concurrent appenders failed: ${errors.peek()}")
    val got = Sinks.readCurrent(spark, root).select("id").as[Long].collect().toSet
    assert(got == (0 to n).map(_.toLong).toSet, s"lost an append: $got")
    assert(Sinks.currentVersion(root).contains(n.toLong))
  }
}
