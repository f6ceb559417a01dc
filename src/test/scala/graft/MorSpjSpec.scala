package graft

import java.nio.file.Files

import graft.ops.{Dv, EqDel, Sinks, TableProps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15: storage-partitioned joins survive merge-on-read sidecars.
  * A MOR DELETE (deletion vector) or blind upsert (equality delete) on
  * a co-bucketed / co-partitioned fact table used to swap the relation
  * to the v1 funnel — re-introducing the full shuffle on every
  * subsequent co-located join until a compaction. The subtraction is
  * per-file, so the reader-side path (MorSpj) keeps the v2 scan, keeps
  * KeyGroupedPartitioning, and filters inside the readers.
  */
class MorSpjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): (String, String) = {
    seq += 1
    val cat = s"gmspj$seq"
    val root = Files.createTempDirectory("graft_morspj").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def spjConfs = Seq(
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("co-bucketed join stays zero-Exchange and value-exact after a MOR DELETE") {
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 20000L).map(i => (i % 4000L, i)).toDF("k", "a")
      .createOrReplaceTempView("mspj_l_src")
    (0L until 4000L).map(i => (i, i * 7)).toDF("k", "b")
      .createOrReplaceTempView("mspj_r_src")
    spark.sql(s"CREATE TABLE $cat.l (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.l SELECT * FROM mspj_l_src")
    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM mspj_r_src")
    // merge-on-read DELETE on the LEFT fact: every k % 10 == 3 row dies
    TableProps.update(s"$root/l")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.l WHERE k % 10 = 3")
    assert(Dv.exists(Sinks.resolve(s"$root/l")), "DELETE must route MOR")
    val expected = spark.table("mspj_l_src").filter($"k" % 10 =!= 3)
      .join(spark.table("mspj_r_src"), "k")
      .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.l").join(spark.table(s"$cat.r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"co-located join must stay zero-Exchange after a MOR DELETE:\n$plan")
      val got = joined.agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
      assert(got == expected, s"got $got, expected $expected")
    }
    // and the plain read of the vectored side is exact too
    assert(spark.table(s"$cat.l").count() ==
      20000L - (0L until 20000L).count(i => (i % 4000L) % 10L == 3L))
  }

  test("identity-partitioned SPJ survives a MOR DELETE; point lookup exact") {
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 9000L).map(i => (i, i % 30L)).toDF("x", "g")
      .createOrReplaceTempView("mspj_i_src")
    spark.sql(s"CREATE TABLE $cat.f (x BIGINT, g BIGINT) USING parquet " +
      "PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $cat.f SELECT * FROM mspj_i_src")
    spark.sql(s"CREATE TABLE $cat.d (w BIGINT, g BIGINT) USING parquet " +
      "PARTITIONED BY (g)")
    (0L until 30L).map(i => (i * 100, i)).toDF("w", "g")
      .createOrReplaceTempView("mspj_d_src")
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM mspj_d_src")
    TableProps.update(s"$root/f")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.f WHERE x % 7 = 0")
    assert(Dv.exists(Sinks.resolve(s"$root/f")))
    val expected = spark.table("mspj_i_src").filter($"x" % 7 =!= 0)
      .join(spark.table("mspj_d_src"), "g")
      .agg(count(lit(1)).as("n"), sum($"x" + $"w").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.f").join(spark.table(s"$cat.d"), "g")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"identity SPJ must survive the deletion vector:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum($"x" + $"w").as("s")).head
        == expected)
    }
    // partition-pruned point read subtracts exactly
    val one = spark.table(s"$cat.f").filter($"g" === 11L)
    assert(one.count() ==
      (0L until 9000L).count(i => i % 30L == 11L && i % 7L != 0L))
  }

  test("equality deletes ride the reader-side path on a bucket table") {
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.s (k BIGINT, v STRING) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 3000L).map(i => (i, s"v0_$i")).toDF("k", "v")
      .createOrReplaceTempView("mspj_eq_src")
    spark.sql(s"INSERT INTO $cat.s SELECT * FROM mspj_eq_src")
    // two blind upsert batches: updates + inserts, then a re-update
    EqDel.upsertBatch(spark,
      Seq((10L, "v1_10"), (20L, "v1_20"), (5000L, "v1_5000")).toDF("k", "v"),
      s"$root/s", Seq("k"))
    EqDel.upsertBatch(spark,
      Seq((10L, "v2_10"), (999L, "v2_999")).toDF("k", "v"),
      s"$root/s", Seq("k"))
    val live = Sinks.resolve(s"$root/s")
    assert(EqDel.exists(live), "blind upserts must leave pending tombstones")
    val got = spark.table(s"$cat.s").orderBy("k").as[(Long, String)].collect()
    assert(got.length == 3001) // 3000 base + inserted k=5000 (999 updates)
    val byK = got.toMap
    assert(byK(10L) == "v2_10" && byK(20L) == "v1_20" &&
      byK(999L) == "v2_999" && byK(5000L) == "v1_5000" && byK(0L) == "v0_0")
    // the read stayed on the v2 scan (no funnel swap)
    val plan = spark.table(s"$cat.s").queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"),
      s"eq-delete bucket read must stay on the v2 path:\n$plan")
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.s")
        .join(spark.table(s"$cat.s").select($"k", $"v".as("v2")), "k")
      val p2 = joined.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange"),
        s"self-join under pending eq-deletes must stay zero-Exchange:\n$p2")
      assert(joined.count() == 3001)
    }
  }

  test("sidecar memo misses an in-place rewrite with the same part count and millisecond (stamp folds names+sizes)") {
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, v STRING) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 100L).map(i => (i, s"v$i")).toDF("k", "v")
      .createOrReplaceTempView("mspj_rw_src")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM mspj_rw_src")
    EqDel.upsertBatch(spark,
      Seq((10L, "UP10")).toDF("k", "v"), s"$root/r", Seq("k"))
    // warm the reader-side sidecar memo
    assert(spark.table(s"$cat.r").count() == 100)
    // rewrite the _eqdel sidecar IN PLACE — a repair/retrofit: same
    // part count, every part's mtime pinned to the old max, different
    // content (one extra tombstone hiding k=0). The old count+max-mtime
    // stamp served the STALE memo here; the names+sizes fold must miss.
    val live = Sinks.resolve(s"$root/r")
    val scDir = java.nio.file.Paths.get(live, EqDel.Sidecar)
    val parts0 = graft.io.Fs.listDir(scDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    val oldMtime = parts0.map(p => Files.getLastModifiedTime(p)).max
    val old = spark.read.parquet(scDir.toString)
    val cols = old.columns.toSeq
    val extra = Seq((0L, Long.MaxValue)).toDF("k", "__gf_seq")
      .select(cols.map(col): _*)
    val rewritten = old.unionByName(extra).coalesce(1).collect()
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_morspj_rw")
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(rewritten: _*)), old.schema)
      .coalesce(parts0.size).write.mode("overwrite").parquet(tmpDir.toString)
    graft.io.Fs.deleteRecursively(scDir)
    java.nio.file.Files.move(tmpDir, scDir,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val partsNew = graft.io.Fs.listDir(scDir)
      .filter(_.getFileName.toString.endsWith(".parquet"))
    assert(partsNew.size == parts0.size,
      s"rewrite must keep the part count (${partsNew.size} vs ${parts0.size})")
    partsNew.foreach(p => Files.setLastModifiedTime(p, oldMtime))
    // the fresh tombstone must be honored: k=0 is hidden
    val after = spark.table(s"$cat.r").as[(Long, String)].collect().toMap
    assert(!after.contains(0L),
      "stale sidecar memo served: the rewritten tombstone was ignored")
    assert(after(10L) == "UP10" && after.size == 99)
  }

  test("DV + eq-deletes together; unpartitioned tables keep the funnel") {
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.m (k BIGINT, v STRING) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 2000L).map(i => (i, s"a$i")).toDF("k", "v")
      .createOrReplaceTempView("mspj_m_src")
    spark.sql(s"INSERT INTO $cat.m SELECT * FROM mspj_m_src")
    EqDel.upsertBatch(spark,
      Seq((7L, "UP7"), (8L, "UP8")).toDF("k", "v"), s"$root/m", Seq("k"))
    spark.sql(s"DELETE FROM $cat.m WHERE k = 8 OR k = 100")
    val live = Sinks.resolve(s"$root/m")
    assert(Dv.exists(live) || EqDel.exists(live))
    val rows = spark.table(s"$cat.m").as[(Long, String)].collect().toMap
    assert(!rows.contains(100L), "DV delete must hide k=100")
    assert(!rows.contains(8L), "delete must hide the upserted k=8")
    assert(rows(7L) == "UP7" && rows(0L) == "a0" && rows.size == 1998)
    // an UNPARTITIONED vectored table still funnels (no SPJ to win):
    // the plan shows no BatchScan relation for it
    val flat = s"$root/flat"
    Sinks.publishVersioned((0L until 500L).map(i => (i, i)).toDF("k", "x"),
      flat, None)
    Sinks.deleteVector(spark, flat, col("k") < 10)
    assert(!graft.catalog.MorSpj.readerSide(flat, Sinks.resolve(flat)),
      "unpartitioned vectored tables must keep the funnel")
    assert(spark.read.format("graft").load(flat).count() == 490)
  }

  test("reader-side subtraction stays COLUMNAR: batches filtered in place, structs exact") {
    // round-16: the wrapper keeps the delegate's ColumnarBatch and
    // filters via a selection mapping (MorFilterVector) — a DV'd table
    // must not pay a table-wide columnar→row downgrade. The struct
    // column exercises the wrapper's recursive getChild path.
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 8000L).map(i => (i, s"n$i", i * 2, s"c$i")).toDF("k", "nm", "a", "b")
      .selectExpr("k", "nm", "named_struct('a', a, 'b', b) AS payload")
      .createOrReplaceTempView("mspj_col_src")
    spark.sql(s"CREATE TABLE $cat.c2 (k BIGINT, nm STRING, " +
      "payload STRUCT<a: BIGINT, b: STRING>) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.c2 SELECT * FROM mspj_col_src")
    TableProps.update(s"$root/c2")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.c2 WHERE k % 3 = 1")
    val live = Sinks.resolve(s"$root/c2")
    assert(Dv.exists(live))
    assert(graft.catalog.MorSpj.readerSide(s"$root/c2", live))
    val df = spark.table(s"$cat.c2")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"reader-side MOR scan must stay columnar:\n$plan")
    val got = df.selectExpr("k", "nm", "payload.a", "payload.b").orderBy("k")
      .as[(Long, String, Long, String)].collect()
    val expected = (0L until 8000L).filter(_ % 3 != 1)
      .map(i => (i, s"n$i", i * 2, s"c$i"))
    assert(got.toSeq == expected, s"first diffs: ${
      got.toSeq.zip(expected).filter(p => p._1 != p._2).take(3)}")
    // eq-deletes compose on the columnar path too
    EqDel.upsertBatch(spark,
      Seq((0L, "UP0", 999L, "z")).toDF("k", "nm", "a", "b")
        .selectExpr("k", "nm", "named_struct('a', a, 'b', b) AS payload"),
      s"$root/c2", Seq("k"))
    val rows = spark.table(s"$cat.c2").selectExpr("k", "nm").orderBy("k")
      .as[(Long, String)].collect()
    assert(rows.length == expected.length)
    assert(rows.head == (0L, "UP0"), s"got ${rows.head}")
  }

  test("eq-delete keys on a partition column stay reader-side: directory values source the lookup") {
    // round-16 upgrade (was: route to the funnel): an equality delete
    // keyed on an identity PARTITION column has its key values in
    // directory names, not data files — augment injects the column into
    // the PARTITION read schema, so the file reader appends the
    // per-file directory value to every row and the tombstone lookup
    // sees it even when the query does not project the column
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.p (x BIGINT, g BIGINT) USING parquet " +
      "PARTITIONED BY (g)")
    (0L until 600L).map(i => (i, i % 6L)).toDF("x", "g")
      .createOrReplaceTempView("mspj_p_src")
    spark.sql(s"INSERT INTO $cat.p SELECT * FROM mspj_p_src")
    EqDel.upsertBatch(spark,
      Seq((10000L, 2L), (10001L, 5L)).toDF("x", "g"), s"$root/p", Seq("g"))
    val live = Sinks.resolve(s"$root/p")
    assert(EqDel.exists(live))
    assert(graft.catalog.MorSpj.readerSide(s"$root/p", live),
      "partition-column eq-delete keys ride the reader-side path (round-16)")
    // a query NOT projecting the partition column answers exactly:
    // groups 2 and 5 are fully tombstoned then re-inserted with one row
    val got = spark.table(s"$cat.p").agg(
      count(lit(1)).as("n"), sum($"x").as("s")).head
    val expected = spark.table("mspj_p_src").filter($"g" =!= 2L && $"g" =!= 5L)
      .union(Seq((10000L, 2L), (10001L, 5L)).toDF("x", "g"))
      .agg(count(lit(1)).as("n"), sum($"x").as("s")).head
    assert(got == expected, s"got $got, expected $expected")
    // a PROJECTING point read stays exact and partition pruning fires
    // on the v2 scan the reader-side path keeps
    val g2 = spark.table(s"$cat.p").filter($"g" === 2L)
    assert(g2.count() == 1L && g2.head.getLong(0) == 10000L, g2.collect().toSeq)
    val plan = g2.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"), plan.take(2000))
  }

  test("reader-side subtraction is exact on the parquet-mr (non-vectorized) path too") {
    // the row-index generator has TWO homes — the vectorized reader and
    // ParquetRowIndexUtil's record-reader wrapper; this pins the second
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.nv (k BIGINT, v BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 3000L).map(i => (i, i * 2)).toDF("k", "v")
      .createOrReplaceTempView("mspj_nv_src")
    spark.sql(s"INSERT INTO $cat.nv SELECT * FROM mspj_nv_src")
    TableProps.update(s"$root/nv")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.nv WHERE k % 11 = 3")
    assert(Dv.exists(Sinks.resolve(s"$root/nv")))
    val expectN = (0L until 3000L).count(_ % 11 != 3)
    withConfs("spark.sql.parquet.enableVectorizedReader" -> "false") {
      assert(spark.table(s"$cat.nv").count() == expectN)
      assert(spark.table(s"$cat.nv").agg(sum($"v")).head.getLong(0) ==
        (0L until 3000L).filter(_ % 11 != 3).map(_ * 2).sum)
    }
    // and the vectorized path agrees
    assert(spark.table(s"$cat.nv").count() == expectN)
  }

  test("dynamic partition pruning composes with reader-side subtraction") {
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 12000L).map(i => (i, i % 40L)).toDF("x", "g")
      .createOrReplaceTempView("mspj_dpp_f")
    spark.sql(s"CREATE TABLE $cat.fact (x BIGINT, g BIGINT) USING parquet " +
      "PARTITIONED BY (g)")
    spark.sql(s"INSERT INTO $cat.fact SELECT * FROM mspj_dpp_f")
    spark.sql(s"CREATE TABLE $cat.dim (w BIGINT, g BIGINT) USING parquet " +
      "PARTITIONED BY (g)")
    (0L until 40L).map(i => (i * 5, i)).toDF("w", "g")
      .createOrReplaceTempView("mspj_dpp_d")
    spark.sql(s"INSERT INTO $cat.dim SELECT * FROM mspj_dpp_d")
    TableProps.update(s"$root/fact")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.fact WHERE x % 6 = 1")
    assert(Dv.exists(Sinks.resolve(s"$root/fact")))
    // a filtered dim feeds runtime partition filters into the fact's
    // scan (the DPP path swaps `current`); the subtraction must follow
    // the narrowed selection exactly
    val joined = spark.table(s"$cat.fact")
      .join(spark.table(s"$cat.dim").filter($"w" % 25 === 0), "g")
    val expected = spark.table("mspj_dpp_f").filter($"x" % 6 =!= 1)
      .join(spark.table("mspj_dpp_d").filter($"w" % 25 === 0), "g")
      .agg(count(lit(1)).as("n"), sum($"x" + $"w").as("s")).head
    assert(joined.agg(count(lit(1)).as("n"), sum($"x" + $"w").as("s")).head
      == expected)
  }

  test("aggregates and metadata counts stay exact in reader-side mode") {
    val (cat, root) = mkCat()
    import spark.implicits._
    spark.sql(s"CREATE TABLE $cat.c (k BIGINT, x BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    (0L until 5000L).map(i => (i, i * 3)).toDF("k", "x")
      .createOrReplaceTempView("mspj_c_src")
    spark.sql(s"INSERT INTO $cat.c SELECT * FROM mspj_c_src")
    TableProps.update(s"$root/c")(_ + ("graft.dml.mode" -> "mor"))
    spark.sql(s"DELETE FROM $cat.c WHERE k >= 4500")
    assert(graft.catalog.MorSpj.readerSide(s"$root/c", Sinks.resolve(s"$root/c")))
    // count(*): whether served by MetaCountRewrite or the scan, exact
    assert(spark.sql(s"SELECT count(*) AS n FROM $cat.c").head.getLong(0) == 4500L)
    // a grouped aggregate over the scan (aggregate pushdown refused in
    // MOR mode — raw rows reach the subtraction)
    val agg = spark.table(s"$cat.c").agg(sum($"x").as("s"), max($"k").as("m")).head
    assert(agg.getLong(0) == (0L until 4500L).map(_ * 3).sum &&
      agg.getLong(1) == 4499L)
    // filter pushdown composes with the subtraction
    assert(spark.table(s"$cat.c").filter($"k" between(4400, 4600)).count() == 100)
  }

  test("eq-deletes compose with COLUMN MAPPING reader-side: rename the key, upsert, join zero-Exchange") {
    // round-16: the tombstone sidecar stores PHYSICAL key names (the
    // write funnel translates like the data), so a rename/drop mapping
    // no longer drops an eq-deleted version to the funnel — and upserts
    // BEFORE and AFTER a key rename land under ONE sidecar column name.
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 12000L).map(i => (i % 3000L, i)).toDF("k", "a")
      .createOrReplaceTempView("mspj_cm_l_src")
    (0L until 3000L).map(i => (i, i * 5)).toDF("k", "b")
      .createOrReplaceTempView("mspj_cm_r_src")
    spark.sql(s"CREATE TABLE $cat.el (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.el SELECT * FROM mspj_cm_l_src")
    spark.sql(s"CREATE TABLE $cat.er (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.er SELECT * FROM mspj_cm_r_src")
    // upsert BEFORE the rename (sidecar written under physical 'k')
    EqDel.upsertBatch(spark,
      (0L until 100L).map(i => (i, -1L)).toDF("k", "b"), s"$root/er", Seq("k"))
    spark.sql(s"ALTER TABLE $cat.er RENAME COLUMN b TO amount")
    spark.sql(s"ALTER TABLE $cat.er RENAME COLUMN k TO kk")
    // upsert AFTER the rename (caller speaks logical names; the funnel
    // translates the batch AND the tombstone keys back to physical)
    EqDel.upsertBatch(spark,
      (100L until 200L).map(i => (i, -2L)).toDF("kk", "amount"),
      s"$root/er", Seq("kk"))
    val live = Sinks.resolve(s"$root/er")
    assert(EqDel.exists(live) && graft.ops.ColMap.exists(live))
    assert(graft.catalog.MorSpj.readerSide(s"$root/er", live),
      "eq-deletes + rename mapping must ride reader-side")
    val expected = spark.table("mspj_cm_l_src")
      .join(spark.table("mspj_cm_r_src").filter($"k" >= 200L)
        .union((0L until 100L).map(i => (i, -1L)).toDF("k", "b"))
        .union((100L until 200L).map(i => (i, -2L)).toDF("k", "b")), "k")
      .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
    withConfs(spjConfs: _*) {
      val joined = spark.table(s"$cat.el")
        .join(spark.table(s"$cat.er"), col("k") === col("kk"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"eqdel+rename must keep the co-bucketed join shuffle-free:\n$plan")
      val got = joined
        .agg(count(lit(1)).as("n"), sum(col("a") + col("amount")).as("s")).head
      assert(got == expected, s"eqdel+rename SPJ drifted: $got vs $expected")
    }
    // the funnel door agrees (format read of the same version)
    val viaFunnel = spark.read.format("graft").load(s"$root/er")
    assert(viaFunnel.columns.toSeq == Seq("kk", "amount"))
    assert(viaFunnel.filter(col("kk") < 200L)
      .agg(sum(col("amount"))).head.getLong(0) == (-1L * 100) + (-2L * 100))
  }

  test("pending tombstones compose with bucket-count REDUCTION: bucket(8)+eqdel ⋈ bucket(4), zero Exchange") {
    // round-16 verdict item: B192's reader-side subtraction and
    // round-15's ReducibleFunction bucket reducers must compose — a
    // finer-bucketed side carrying live equality-delete tombstones is
    // reduced into the coarser grid WITH its rows already subtracted
    // (the subtraction is per-file, inside the reader, so reduction
    // never sees a dead row).
    val (cat, root) = mkCat()
    import spark.implicits._
    (0L until 16000L).map(i => (i % 4000L, i)).toDF("k", "a")
      .createOrReplaceTempView("mspj_rc8_src")
    (0L until 4000L).map(i => (i, i * 11)).toDF("k", "b")
      .createOrReplaceTempView("mspj_rc4_src")
    spark.sql(s"CREATE TABLE $cat.c8 (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.c8 SELECT * FROM mspj_rc8_src")
    spark.sql(s"CREATE TABLE $cat.c4 (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.c4 SELECT * FROM mspj_rc4_src")
    // blind upserts on the FINER side: keys 0..199 re-keyed to a=-1,
    // the tombstones stay pending (no fold) through the join
    EqDel.upsertBatch(spark,
      (0L until 200L).map(i => (i, -1L)).toDF("k", "a"), s"$root/c8", Seq("k"))
    val live = Sinks.resolve(s"$root/c8")
    assert(EqDel.exists(live), "tombstones must be pending, not folded")
    assert(graft.catalog.MorSpj.readerSide(s"$root/c8", live),
      "eq-deletes over a bucket layout must ride reader-side")
    val expected = spark.table("mspj_rc8_src").filter($"k" >= 200L)
      .union((0L until 200L).map(i => (i, -1L)).toDF("k", "a"))
      .join(spark.table("mspj_rc4_src"), "k")
      .agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
    withConfs((spjConfs :+
      ("spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true")): _*) {
      val joined = spark.table(s"$cat.c8").join(spark.table(s"$cat.c4"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"tombstone-carrying bucket(8) reduced into bucket(4) must not shuffle:\n$plan")
      val got = joined.agg(count(lit(1)).as("n"), sum($"a" + $"b").as("s")).head
      assert(got == expected, s"reduced eq-delete join drifted: $got vs $expected")
    }
  }
}
