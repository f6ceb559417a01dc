package graft

import graft.io.Tables
import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-machinery semantics: salting must be result-invariant, bucketed
  * joins must eliminate the shuffle, AQE must be on in harness sessions.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  test("salted aggregation equals direct aggregation (hot-key invariance)") {
    import spark.implicits._
    // skew: replicate one key 10k times
    val hot = Seq.fill(10000)(("hotkey", 1.0)) ++
      (1 to 500).map(i => (s"k$i", i.toDouble))
    val df = hot.toDF("k", "v").repartition(8)
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 4).as("s"))
    val salted = Skew.saltedAggregate(df, Seq("k"), buckets = 16,
      phase1 = Seq(count(lit(1)).as("n"), sum(col("v")).as("s")),
      phase2 = Seq(sum(col("n")).as("n"), round(sum(col("s")), 4).as("s")))
    assert(salted.count() == direct.count())
    assert(salted.exceptAll(direct).isEmpty && direct.exceptAll(salted).isEmpty)
  }

  test("B157 zorderN is injective on its grid and its top octant interleaves every dimension") {
    import spark.implicits._
    val grid = for { a <- 0 to 3; b <- 0 to 3; c <- 0 to 3 }
      yield (a.toLong, b.toLong, c.toLong)
    val out = grid.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        graft.ops.Layout.zorderN(Seq(col("a"), col("b"), col("c")), bits = 2).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._4).distinct.length == 64, "z must be injective on the 4x4x4 grid")
    // top octant (z >> 3) must combine the TOP bit of all three dims —
    // the property a raw (un-normalized) interleave loses
    out.foreach { case (a, b, c, z) =>
      val expect = ((a >> 1) & 1) | (((b >> 1) & 1) << 1) | (((c >> 1) & 1) << 2)
      assert((z >> 3) == expect, s"octant of ($a,$b,$c) was ${z >> 3}, want $expect")
    }
    // refusals: <2 dims, z overflow past 63 bits
    intercept[IllegalArgumentException](
      graft.ops.Layout.zorderN(Seq(col("a")), bits = 2))
    intercept[IllegalArgumentException](
      graft.ops.Layout.zorderN(Seq(col("a"), col("b"), col("c")), bits = 22))
  }

  test("B153 binned range join equals the naive theta-join, handles boundaries, and plans equi") {
    import spark.implicits._
    // intervals of mixed width, incl. negative values, bin-boundary
    // endpoints, an interval narrower than the bin, and an empty one
    val ivals = Seq(
      (1, -50.0, 25.0), (2, 0.0, 10.0), (3, 10.0, 10.0) /* empty */,
      (4, 9.5, 10.5), (5, 100.0, 1000.0), (6, 999.0, 1001.0)
    ).toDF("ival_id", "lo", "hi")
    val pts = Seq(
      (10, -50.0) /* = lo: in */, (11, 25.0) /* = hi: out */,
      (12, 9.5), (13, 10.0), (14, 999.5), (15, 0.0), (16, 2000.0)
    ).toDF("pt_id", "x")
    val binned = graft.ops.RangeJoin.binnedPointJoin(
        pts, "x", ivals, "lo", "hi", binWidth = 10.0)
      .select("pt_id", "ival_id")
    val naive = pts.join(ivals, col("x") >= col("lo") && col("x") < col("hi"))
      .select("pt_id", "ival_id")
    assert(binned.collect().toSet == naive.collect().toSet)
    assert(binned.collect().length == binned.distinct().collect().length,
      "no pair may be produced twice (each pair meets in the point's one bin)")
    val plan = binned.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"binned range join must plan as an equi join, got:\n$plan")
    // the open-ended-sentinel trap fails loudly instead of exploding
    // span/binWidth bin rows (the q_join_range hi=1e9 idiom must not
    // be carried into the binned spelling blindly)
    val sentinel = Seq((9, 0.0, 1.0e9)).toDF("ival_id", "lo", "hi")
    val e = intercept[Exception](
      graft.ops.RangeJoin.binnedPointJoin(pts, "x", sentinel, "lo", "hi",
        binWidth = 10.0).count())
    assert(e.getMessage.contains("binnedPointJoin") ||
      Option(e.getCause).exists(_.getMessage.contains("binnedPointJoin")),
      s"expected the bin-count guard, got: $e")
  }

  test("salted join equals plain join under a hot key") {
    import spark.implicits._
    val big = (Seq.fill(5000)(1L) ++ (2L to 100L)).map(k => (k, k * 2)).toDF("key", "payload")
    val small = (1L to 100L).map(k => (k, s"dim$k")).toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "payload", "name")
    val salted = Skew.saltedJoin(big, small, "key", buckets = 8)
      .select("key", "payload", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bloom semiFilter keeps every matching row and actually prunes") {
    val li = Tables.lineitem(spark, sf001)
    val hot = Tables.orders(spark, sf001).filter(col("o_totalprice") > 450000)
    val pre = graft.ops.BloomJoin.semiFilter(li, "l_orderkey", hot, "o_orderkey", 100000L)
    // no false negatives: the exact semi join result is fully contained
    val trueMatches = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
    assert(trueMatches.exceptAll(pre).isEmpty,
      "bloom prefilter dropped a matching row (false negative)")
    // and the filter is load-bearing: most non-matching rows are gone
    val (total, kept) = (li.count(), pre.count())
    assert(kept < total / 2, s"bloom filter pruned almost nothing: $kept of $total")
    // shape: the bloom is a literal filter on the fact scan — no shuffle
    // exchange or join node is introduced by the prefilter itself
    val plan = pre.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom filter missing from plan")
    assert(!plan.contains("Exchange"), "bloom prefilter introduced a shuffle")
    // identifier escaping: a build-side key that needs backticks parses
    val odd = hot.withColumnRenamed("o_orderkey", "order key")
    val pre2 = graft.ops.BloomJoin.semiFilter(li, "l_orderkey", odd, "order key", 100000L)
    assert(pre2.count() == kept)
  }

  test("bucketed tables co-locate the join (no shuffle exchange in plan)") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // the metastore may be fresh while the warehouse dir persists across
    // JVMs — clear locations directly or saveAsTable refuses
    import scala.reflect.io.Directory
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("b_orders", "b_lineitem").foreach(t =>
      new Directory(new java.io.File(s"$wh/$t")).deleteRecursively())
    Tables.orders(spark, sf001)
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(spark, sf001)
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still shuffles the fact side:\n$plan")
    assert(joined.count() == 3)
  }

  test("writeBucketed: one file per bucket, and the harness join plan has no exchange") {
    val (ot, lt) = graft.queries.ScanOps.bucketedTables(spark, sf001)
    // layout: the pre-shuffle aligns with the bucket spec → 1 file/bucket
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:").stripPrefix("//")
    Seq(ot, lt).foreach { t =>
      val files = graft.io.Fs.listDir(java.nio.file.Paths.get(s"$wh/${t.toLowerCase}"))
        .count(_.toString.endsWith(".parquet"))
      assert(files == 8, s"$t: expected 8 bucket files, got $files")
    }
    val joined = SparkEntry.queries("q_bucketed_join")(spark, sf001)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
      !plan.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join still shuffles a join side:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected the co-located SMJ path:\n$plan")
  }

  test("partitioned layout prunes partitions at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("part").toString
    Tables.orders(spark, sf001)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val pruned = spark.read.parquet(dir).filter(col("order_year") === 1997)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"),
      s"no partition filter in scan:\n$plan")
    // pruned scan must read strictly fewer files than the full scan
    val expected = Tables.orders(spark, sf001)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() == expected && expected > 0)
  }

  test("dynamic partition pruning: dim filter prunes the partitioned fact scan at runtime") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    Tables.orders(spark, sf001)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("order_year").parquet(dir)
    val fact = spark.read.parquet(dir)
    // dim must be a FILE source: a literal LocalRelation constant-folds at
    // plan time, leaving no runtime-selective predicate for DPP to use
    val dimDir = java.nio.file.Files.createTempDirectory("dppdim").toString
    (1995 to 2001).map(y => (y, if (y == 1997) "pick" else "skip"))
      .toDF("yr", "tag").write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // at fixture sizes the cost heuristic sees no benefit — use the
    // stats-free fallback ratio so the rewrite fires like it would on a
    // real partitioned fact table
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "10.0")
    val joined = fact.join(dim, fact("order_year") === dim("yr"))
      .filter(col("tag") === "pick")
      .agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    assert(plan.contains("dynamicpruning") || plan.contains("DynamicPruning"),
      s"no dynamic partition pruning in plan:\n$plan")
    val expected = Tables.orders(spark, sf001)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(joined.head().getLong(0) == expected)
  }

  test("streaming checkpoint: restart resumes exactly-once (no reprocessing)") {
    import spark.implicits._
    val ckpt = java.nio.file.Files.createTempDirectory("ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("ckout").toString
    implicit val sqlCtx = spark.sqlContext
    val in1 = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    def start(src: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]) =
      src.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", s"$outDir/data")
        .outputMode("append").start()
    val q1 = start(in1)
    in1.addData(Seq((1L, 1.0), (2L, 2.0)))
    q1.processAllAvailable(); q1.stop()
    // second incarnation, same checkpoint: only new data lands
    val q2 = start(in1)
    in1.addData(Seq((3L, 3.0)))
    q2.processAllAvailable(); q2.stop()
    val ids = spark.read.parquet(s"$outDir/data").select("id").as[Long].collect().sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"checkpoint replayed or lost rows: ${ids.toSeq}")
  }

  test("dynamic partition overwrite backfills one partition without truncating others") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dyn").toString
    val base = Tables.orders(spark, sf001)
      .withColumn("order_year", year(col("o_orderdate")))
    graft.ops.Sinks.overwritePartitions(base, dir, Seq("order_year"))
    val before = spark.read.parquet(dir).count()
    // backfill ONLY 1996 with a modified slice (half the rows)
    val backfill = base.filter($"order_year" === 1996)
      .filter($"o_orderkey" % 2 === 0)
    graft.ops.Sinks.overwritePartitions(backfill, dir, Seq("order_year"))
    // fresh reads each time: a reused DataFrame pins the old file listing
    val y1996 = spark.read.parquet(dir).filter($"order_year" === 1996).count()
    val others = spark.read.parquet(dir).filter($"order_year" =!= 1996).count()
    assert(y1996 == backfill.count(), "1996 partition not replaced")
    assert(others == before - base.filter($"order_year" === 1996).count(),
      "untouched partitions were truncated")
    // rerun is idempotent
    val afterCount = spark.read.parquet(dir).count()
    graft.ops.Sinks.overwritePartitions(backfill, dir, Seq("order_year"))
    assert(spark.read.parquet(dir).count() == afterCount)
  }

  test("AQE is enabled in harness-equivalent sessions (Spark 4 default)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("schema drift detects added/removed/retyped columns and gates pipelines") {
    import graft.ops.Quality
    import org.apache.spark.sql.types._
    val v1 = StructType(Seq(
      StructField("id", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val v2 = StructType(Seq(
      StructField("id", LongType), StructField("v", StringType), // retyped
      StructField("extra", IntegerType)))                        // added; tag removed
    val drifts = Quality.schemaDrift(v1, v2).map(d => (d.kind, d.col_name)).toSet
    assert(drifts == Set(("added", "extra"), ("removed", "tag"), ("retyped", "v")))
    intercept[IllegalArgumentException] {
      Quality.requireCompatible(v1, v2)
    }
    // identical schemas pass the gate
    Quality.requireCompatible(v1, v1)
    // real fixture read matches its own schema
    val orders = Tables.orders(spark, sf001)
    assert(Quality.schemaDrift(orders.schema, orders.schema).isEmpty)
    // NESTED nullability loosening (what a parquet round-trip does to
    // array/struct columns) is soft drift, not a retype — the gate passes
    val n1 = StructType(Seq(
      StructField("emb", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("meta", StructType(Seq(StructField("w", IntegerType, nullable = false))))))
    val n2 = StructType(Seq(
      StructField("emb", ArrayType(FloatType, containsNull = true), nullable = true),
      StructField("meta", StructType(Seq(StructField("w", IntegerType, nullable = true))))))
    assert(Quality.schemaDrift(n1, n2).map(_.kind).toSet == Set("renullabled"),
      s"nested nullability must be soft drift: ${Quality.schemaDrift(n1, n2)}")
    Quality.requireCompatible(n1, n2)
    // a genuine nested retype still trips the gate
    val n3 = StructType(Seq(
      StructField("emb", ArrayType(DoubleType, containsNull = true)),
      StructField("meta", StructType(Seq(StructField("w", IntegerType))))))
    assert(Quality.schemaDrift(n1, n3).exists(_.kind == "retyped"))
    intercept[IllegalArgumentException] { Quality.requireCompatible(n1, n3) }
  }

  test("B33 percentile_approx within 2% relative of exact percentile") {
    import spark.implicits._
    val li = Tables.lineitem(spark, TestSpark.sf01)
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)")).as[Double].head()
    val approx = li.select(expr("percentile_approx(l_extendedprice, 0.5, 10000)")).as[Double].head()
    assert(math.abs(approx - exact) / exact < 0.02, s"approx $approx vs exact $exact")
  }

  test("near-dup pair queries have no nested-loop/cartesian join (scale-safe plans)") {
    // VERDICT r1 flagged the old pair generators as quadratic; both now
    // source candidates from LSH bucket equi-joins. Lock that in at the
    // physical-plan level.
    Seq("q_embed_neardup", "q_ngram_jaccard").foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"$q plans a nested-loop join")
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("zorder2 is injective and quadrant-monotonic (data-skipping layout key)") {
    import spark.implicits._
    val pairs = (0L until 64L).flatMap(a => (0L until 64L).map(b => (a, b)))
      .toDF("a", "b")
    val z = pairs.withColumn("z", graft.ops.Layout.zorder2(col("a"), col("b")))
    // bijective over the domain: no two (a,b) share a z
    assert(z.select("z").distinct().count() == 64 * 64)
    // quadrant property: z < 2^(2k) exactly when both dims < 2^k — the
    // reason min/max file stats prune on either dimension
    Seq(1, 2, 4, 8, 16, 32).foreach { q =>
      val inQuad = z.filter(col("a") < q && col("b") < q)
      assert(inQuad.filter(col("z") >= q.toLong * q).count() == 0,
        s"z escapes the $q-quadrant")
      assert(z.filter((col("a") >= q || col("b") >= q) &&
        col("z") < q.toLong * q).count() == 0,
        s"out-of-quadrant point maps under ${q.toLong * q}")
    }
  }

  test("pagerank conserves probability mass each iteration") {
    import spark.implicits._
    // symmetric edge set => every node has outdeg >= 1, so total rank
    // stays exactly 1 (teleport + damped redistribution, no leakage)
    val cands = graft.ops.Dedup.minhashCandidatesMd5(
      Tables.documents(spark, sf001), 3, 4, 4)
    val edges = cands.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(cands.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val ranks = graft.ops.Graph.pagerank(edges, iters = 3)
    val total = ranks.agg(sum("rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-9, s"rank mass $total drifted from 1")
    // note: regular components (the fixture's LSH pairs) have UNIFORM
    // rank as their true fixed point, so differentiation is asserted on
    // an asymmetric synthetic graph instead: a star's hub must outrank
    // its leaves
    val star = Seq((1L, 2L), (2L, 1L), (3L, 1L), (1L, 3L), (4L, 1L), (1L, 4L))
      .toDF("src", "dst")
    val sr = graft.ops.Graph.pagerank(star, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sr(1L) > sr(2L) && sr(1L) > sr(3L) && sr(1L) > sr(4L),
      s"hub does not outrank leaves: $sr")
    assert(math.abs(sr.values.sum - 1.0) < 1e-9)
    // plain DIRECTED edge list (the canonical crawl-graph input): sink
    // node 3 has no outlinks and never appears as src — it must still be
    // ranked, and its dangling mass redistributed, not leaked
    val directed = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val dr = graft.ops.Graph.pagerank(directed, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dr.keySet == Set(1L, 2L, 3L), s"sink-only node dropped: ${dr.keySet}")
    assert(math.abs(dr.values.sum - 1.0) < 1e-9,
      s"directed-graph rank mass ${dr.values.sum} leaked (dangling nodes)")
    assert(dr(3L) > dr(2L) && dr(2L) > dr(1L),
      s"link structure not reflected: $dr")
  }

  test("compaction rewrites many small files into few, data-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    val li = Tables.lineitem(spark, sf001)
    li.repartition(64).write.parquet(dir)
    def nFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nFiles >= 64, s"precondition: expected many small files, got $nFiles")
    graft.ops.Sinks.compact(spark, dir, targetBytes = 1024L * 1024 * 1024)
    assert(nFiles <= 2, s"compaction left $nFiles files")
    val after = spark.read.parquet(dir)
    assert(after.count() == li.count())
    assert(after.exceptAll(li).isEmpty && li.exceptAll(after).isEmpty)
  }

  test("session path mining bounds row size on a million-event session") {
    // A single user emitting 1M events 1s apart is ONE session under the
    // 10-minute gap rule; without the per-session cap the path row would
    // be a ~6 MB string built in one task (and grow linearly with the
    // session). With the cap the query completes and every path holds at
    // most maxPathEvents segments.
    val ev = spark.range(1000000).select(
      lit(1L).as("user_id"),
      expr("timestamp_micros(1500000000000000 + id * 1000000)").as("ts"),
      col("id").as("event_id"),
      concat(lit("t"), (col("id") % 5).cast("string")).as("event_type"))
    val paths = graft.queries.EventOps.sessionPaths(ev, maxPathEvents = 50)
      .collect()
    assert(paths.nonEmpty)
    val maxSegs = paths.map(_.getString(0).split(">").length).max
    assert(maxSegs <= 50, s"uncapped session path: $maxSegs segments")
  }

  test("compact() rejects partitioned (nested-directory) datasets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_part")
      .toString + "/t"
    Tables.orders(spark, sf001).limit(100)
      .withColumn("y", year(to_date(col("o_orderdate"))))
      .write.partitionBy("y").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Sinks.compact(spark, dir)
    }
    assert(e.getMessage.contains("flat parquet directory"))
    // the dataset must be untouched by the failed call
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("versioned publish: readers never see a missing table across compactions") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vtab").toString + "/t"
    val li = Tables.lineitem(spark, sf001).limit(2000)
    val expected = li.count()
    Sinks.publishVersioned(li.repartition(32), root)
    assert(Sinks.readCurrent(spark, root).count() == expected)
    // hammer reads on another thread while compaction republishes; any
    // window where the table is absent/partial surfaces as an exception
    // or a wrong count.
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      try while (!stop) {
        val n = Sinks.readCurrent(spark, root).count()
        if (n != expected) failure = Some(new AssertionError(s"read $n != $expected"))
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try (1 to 3).foreach { _ =>
      Sinks.compactVersioned(spark, root, targetBytes = 1024L * 1024 * 1024)
    } finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, s"concurrent reader failed: $failure")
    assert(Sinks.readCurrent(spark, root).count() == expected)
    // vacuum keeps at most current + previous version dirs
    val vdirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v"))
    assert(vdirs.length <= 2, s"vacuum left ${vdirs.map(_.getName).toSeq}")
  }

  test("time travel: a pinned version reads byte-identical while later versions publish") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vtt").toString + "/t"
    val v0data = Tables.region(spark, sf001)
    Sinks.publishVersioned(v0data, root) // v0
    val pinned = Sinks.readVersion(spark, root, 0L)
    val before = pinned.orderBy("r_regionkey").collect().toSeq
    // concurrent reader hammers the pinned version while new versions land
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      try while (!stop) {
        val again = Sinks.readVersion(spark, root, 0L).orderBy("r_regionkey").collect().toSeq
        if (again != before) failure = Some(new AssertionError("pinned version drifted"))
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try {
      Sinks.publishVersioned(v0data.limit(3), root, Some(0L)) // v1: different data
      Sinks.publishVersioned(v0data.limit(1), root, Some(1L)) // v2
    } finally { stop = true; reader.join(30000) }
    assert(failure.isEmpty, s"pinned reader failed: $failure")
    // the pre-publish Dataset handle is also still valid and unchanged
    assert(pinned.orderBy("r_regionkey").collect().toSeq == before)
    assert(Sinks.readCurrent(spark, root).count() == 1)   // follows the pointer
    assert(Sinks.listVersions(root) == Seq(0L, 1L, 2L))
    val e = intercept[IllegalStateException] { Sinks.readVersion(spark, root, 99L) }
    assert(e.getMessage.contains("may have been vacuumed"))
  }

  test("versioned vacuum deletes only versions strictly below the compaction base") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vvac").toString + "/t"
    val df = Tables.region(spark, sf001)
    Sinks.publishVersioned(df, root)                 // v0
    Sinks.publishVersioned(df, root, Some(0L))       // v1
    Sinks.publishVersioned(df, root, Some(1L))       // v2 (live)
    val v = Sinks.compactVersioned(spark, root)      // → v3; base liveV=2
    assert(v == 3L)
    val dirs = new java.io.File(root).listFiles().map(_.getName).toSet
    // strictly-below-base rule: v0/v1 vacuumed, the base v2 (still being
    // read by anyone who resolved pre-flip) and the new v3 both kept
    assert(!dirs.contains("v0") && !dirs.contains("v1"), s"left $dirs")
    assert(dirs.contains("v2") && dirs.contains("v3"), s"left $dirs")
  }

  test("changesBetween classifies keyed CDF rows; unchanged keys drop; self-diff is empty") {
    import graft.ops.Sinks
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_spec").toString + "/t"
    val v0 = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
      .toDF("k", "s", "v")
    val v1 = Seq((1L, "a", 10), (2L, "B", 20), (4L, "d", 40))
      .toDF("k", "s", "v")
    Sinks.publishVersioned(v0, root, None)
    Sinks.publishVersioned(v1, root, Some(0L))
    val ch = Sinks.changesBetween(spark, root, 0L, 1L, Seq("k"))
      .orderBy("_change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(ch.toSeq == Seq(
      (3L, "c", 30, "delete"),
      (4L, "d", 40, "insert"),
      (2L, "B", 20, "update_postimage"),
      (2L, "b", 20, "update_preimage")))
    // unkeyed bag mode: same rows, classified insert/delete only
    val bag = Sinks.changesBetween(spark, root, 0L, 1L)
      .orderBy("_change_type", "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    assert(bag.toSeq == Seq(
      (2L, "b", 20, "delete"), (3L, "c", 30, "delete"),
      (2L, "B", 20, "insert"), (4L, "d", 40, "insert")))
    // self-diff is empty in both modes
    assert(Sinks.changesBetween(spark, root, 1L, 1L, Seq("k")).count() == 0)
    assert(Sinks.changesBetween(spark, root, 1L, 1L).count() == 0)
    // round trip: CDF read half ∘ MERGE write half = replica sync —
    // applying the feed to v0 reproduces v1 exactly
    val replayed = graft.ops.Merge.upsert(
      Sinks.readVersion(spark, root, 0L),
      Sinks.changesAsDelta(Sinks.changesBetween(spark, root, 0L, 1L, Seq("k"))),
      Seq("k"))
    assert(replayed.exceptAll(Sinks.readVersion(spark, root, 1L)).count() == 0)
    assert(Sinks.readVersion(spark, root, 1L).exceptAll(replayed).count() == 0)
    // additive schema evolution: v2 adds column w — every surviving key
    // classifies as an update (pre reads w as null), and replaying the
    // feed onto v1 reproduces v2 INCLUDING the new column
    Sinks.publishVersioned(
      v1.withColumn("w", col("k") * 2), root, Some(1L))
    val evolved = Sinks.changesBetween(spark, root, 1L, 2L, Seq("k"))
    assert(evolved.filter(col("_change_type").startsWith("update")).count() == 6,
      "3 keys x pre+post expected under additive evolution")
    assert(evolved.filter(col("_change_type") === "update_preimage")
      .filter(col("w").isNotNull).count() == 0, "preimages must read new column as null")
    val replayed2 = graft.ops.Merge.upsert(
      Sinks.readVersion(spark, root, 1L),
      Sinks.changesAsDelta(evolved), Seq("k"))
    assert(replayed2.exceptAll(Sinks.readVersion(spark, root, 2L)).count() == 0)
    assert(Sinks.readVersion(spark, root, 2L).exceptAll(replayed2).count() == 0)
    // a DROPPED column is not evolution — fail loudly
    val e = intercept[IllegalArgumentException](
      Sinks.changesBetween(spark, root, 2L, 1L, Seq("k")))
    assert(e.getMessage.contains("dropped"))
  }

  test("syncReplica: bootstrap, incremental catch-up over a version gap, vacuum fallback") {
    import graft.ops.Sinks
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_sync").toString
    val src = s"$base/src"
    val rep = s"$base/rep"
    def table(rows: Seq[(Long, String)]) = rows.toDF("k", "s")
    def assertInSync(): Unit = {
      val s = Sinks.readCurrent(spark, src)
      val r = Sinks.readCurrent(spark, rep)
      assert(s.exceptAll(r).count() == 0 && r.exceptAll(s).count() == 0,
        "replica diverged from source")
    }
    // bootstrap
    Sinks.publishVersioned(table(Seq(1L -> "a", 2L -> "b")), src, None)
    assert(Sinks.syncReplica(spark, src, rep, Seq("k")) == 0L)
    assertInSync()
    // two source versions elapse; ONE incremental sync catches up
    Sinks.publishVersioned(table(Seq(1L -> "a2", 2L -> "b", 3L -> "c")), src, Some(0L))
    Sinks.publishVersioned(table(Seq(1L -> "a2", 3L -> "c2")), src, Some(1L))
    val repVersionsBefore = Sinks.listVersions(rep).size
    assert(Sinks.syncReplica(spark, src, rep, Seq("k")) == 2L)
    assertInSync()
    assert(Sinks.listVersions(rep).size == repVersionsBefore + 1,
      "multi-version gap must apply as ONE replica publish")
    // re-sync with nothing new is a no-op (no new replica version)
    val repVersionsNow = Sinks.listVersions(rep).size
    assert(Sinks.syncReplica(spark, src, rep, Seq("k")) == 2L)
    assert(Sinks.listVersions(rep).size == repVersionsNow)
    // vacuum the replica's sync base out of source history -> bootstrap fallback
    Sinks.publishVersioned(table(Seq(3L -> "c3", 4L -> "d")), src, Some(2L))
    Sinks.compactVersioned(spark, src) // vacuums v0..v2 (retainVersions=0)
    assert(!Sinks.listVersions(src).contains(2L), "precondition: base vacuumed")
    Sinks.syncReplica(spark, src, rep, Seq("k"))
    assertInSync()
  }

  test("compaction retention window keeps the newest N pre-base snapshots for time travel") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vret").toString + "/t"
    val df = Tables.region(spark, sf001)
    (0 to 3).foreach(i => Sinks.publishVersioned(df, root,
      if (i == 0) None else Some(i - 1L)))       // v0..v3 (v3 live)
    Sinks.compactVersioned(spark, root, retainVersions = 2) // → v4, base=3
    // newest 2 below the base (v1, v2) retained; v0 vacuumed
    assert(Sinks.listVersions(root) == Seq(1L, 2L, 3L, 4L))
    // a pinned reader inside the window still works post-compaction
    assert(Sinks.readVersion(spark, root, 2L).count() == df.count())
  }

  test("versioned publish cleans its staging dir on failure; vacuum removes only dead-pid stages") {
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vstage").toString + "/t"
    val df = Tables.region(spark, sf001)
    Sinks.publishVersioned(df, root) // v0
    // a writer basing on "table absent" must lose, and must not leak its stage dir
    intercept[java.util.ConcurrentModificationException] {
      Sinks.publishVersioned(df, root, None)
    }
    def stages() = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith(".stage-")).toSeq
    assert(stages().isEmpty, s"leaked stage dirs: ${stages()}")
    // crash debris from a dead process is vacuumed; a LIVE writer's
    // in-flight stage dir is untouchable
    val deadPid = (100000 to 200000).find(p => ProcessHandle.of(p.toLong).isEmpty).get
    val dead = java.nio.file.Paths.get(root, s".stage-$deadPid-1")
    val live = java.nio.file.Paths.get(root, s".stage-${ProcessHandle.current().pid()}-1")
    java.nio.file.Files.createDirectories(dead)
    java.nio.file.Files.createDirectories(live)
    Sinks.compactVersioned(spark, root)
    assert(stages() == Seq(s".stage-${ProcessHandle.current().pid()}-1"),
      s"vacuum touched the wrong stages: ${stages()}")
  }

  test("versioned table survives concurrent publishes racing compaction (no lost committed version)") {
    // Pins the round-5 advice: the vacuum used to run outside the commit
    // lock and delete any version except {base, new}, so a writer that
    // committed between the pointer flip and the vacuum lost its version
    // dir. Now the vacuum is locked and strictly-below-base, so a
    // committed, pointer-referenced version can never be deleted.
    import graft.ops.Sinks
    val root = java.nio.file.Files.createTempDirectory("graft_vrace").toString + "/t"
    val df = Tables.region(spark, sf001)
    val expected = df.count()
    Sinks.publishVersioned(df, root)
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val writer = new Thread(() => {
      try while (!stop) {
        try Sinks.publishVersioned(df, root, Sinks.currentVersion(root))
        catch { case _: java.util.ConcurrentModificationException => () } // lost the race; retry
      } catch { case t: Throwable => failure = Some(t) }
    })
    writer.start()
    try (1 to 3).foreach { _ =>
      try Sinks.compactVersioned(spark, root)
      catch { case _: java.util.ConcurrentModificationException => () }
    } finally { stop = true; writer.join(60000) }
    assert(failure.isEmpty, s"concurrent writer failed: $failure")
    // the committed current version must exist and be fully readable
    assert(Sinks.readCurrent(spark, root).count() == expected)
  }

  test("join strategy hints are honored (merge, shuffle_hash, broadcast)") {
    val li = Tables.lineitem(spark, sf001)
    val ord = Tables.orders(spark, sf001)
    def planOf(hint: String): String =
      li.join(ord.hint(hint), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
    assert(planOf("merge").contains("SortMergeJoin"), "merge hint ignored")
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"), "shuffle_hash hint ignored")
    assert(planOf("broadcast").contains("BroadcastHashJoin"), "broadcast hint ignored")
  }

  test("z-order layout bounds BOTH dimensions per file; 1-col sort does not") {
    // A full sort on `a` minimizes box AREA too — z-order's actual claim
    // is bounded per-file EXTENT on every interleaved dimension, so
    // min/max stats prune scans filtered on either one. Dims must be
    // scaled to a common bit width first (production z-order writers
    // range-bucket each column before interleaving, for this reason).
    val raw = Tables.orders(spark, sf001)
      .select(col("o_custkey").cast("long").as("a"),
        datediff(to_date(col("o_orderdate")), lit("1995-01-01")).cast("long").as("b"))
    val r = raw.agg(min("a"), max("a"), min("b"), max("b")).head()
    val (minA, maxA, minB, maxB) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val dims = raw.select(
      ((col("a") - minA) * 1024 / (maxA - minA + 1)).cast("long").as("a"),
      ((col("b") - minB) * 1024 / (maxB - minB + 1)).cast("long").as("b"))
    val z = graft.ops.Layout.zorder2(col("a"), col("b"))
    def avgExtents(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val e = df.withColumn("f", spark_partition_id())
        .groupBy("f")
        .agg((max(col("a")) - min(col("a"))).cast("double").as("ea"),
          (max(col("b")) - min(col("b"))).cast("double").as("eb"))
        .agg(avg(col("ea")), avg(col("eb"))).head()
      (e.getDouble(0), e.getDouble(1))
    }
    val (zA, zB) = avgExtents(dims.repartitionByRange(8, z).sortWithinPartitions(z))
    val (sA, sB) = avgExtents(
      dims.repartitionByRange(8, col("a")).sortWithinPartitions(col("a")))
    // a-sort clusters a tightly but leaves b at ~full range
    assert(sB > 0.8 * 1024, s"fixture degenerate: a-sort b-extent $sB")
    // z-order: BOTH dims bounded well below their full range
    assert(zB < 0.6 * sB, s"z-order b-extent $zB not tighter than a-sort $sB")
    assert(zA < 0.9 * 1024, s"z-order a-extent $zA unbounded")
  }

  test("EVERY harness query plans scale-safe (global nested-loop/cartesian sweep)") {
    // The generalization of the check above: any future query that
    // accidentally plans a cartesian or nested-loop join fails here, not
    // in a 100 TB run. Whitelisted exceptions are the queries whose
    // non-equi/cross shape is the DECLARED semantics over a provably
    // tiny side:
    //   q_cross_join      — B23 cross join is the operator itself (5x3 dims)
    //   q_cosine_topk     — corpus x broadcast 1-row query set (B61 baseline)
    //   q_ann_ivf         — probe-pruned corpus x broadcast few-row query set
    //   q_edit_distance   — 64-name DISTINCT vocabulary, both sides tiny
    //   q_date_spine      — calendar sequence (1 row per day) range join
    //   q_part_pairs      — within-order pair mining, bounded fan-out
    // Streaming end-to-end queries execute on construction, so they are
    // exercised (not planned) elsewhere and skipped here. (Queries that
    // run eager jobs at construction but still return a lazy plan —
    // q_dup_clusters, q_pagerank, q_bloom_join — stay in the sweep: the
    // construction cost is paid once and their final plan is worth
    // checking.)
    // A second allowed shape: a 1-ROW broadcast anchor (global scalar —
    // corpus max ts, total doc count, global avg) cross-joined back into
    // the data. A nested-loop join whose build side is one row is a
    // linear pass — the standard way to attach a global scalar without
    // collapsing the data to one partition.
    val allowNonEqui = Set("q_cross_join", "q_cosine_topk", "q_ann_ivf",
      "q_ann_ivf_fixed", // same probe shape as q_ann_ivf: queries x broadcast centroid table
      "q_ann_index", // persisted-index serving of the same probe shape (B125)
      "q_ann_pq", // B130 SQ8 serving: same queries x broadcast-centroid probe shape
      "q_ann_pq_codebook", // B143 PQ serving: same queries x broadcast-centroid probe shape
      "q_ann_rewrite", // rule-expanded brute force = q_cosine_topk's corpus x broadcast-query scan
      "q_edit_distance", "q_date_spine", "q_part_pairs",
      "q_join_range", // B22: the non-equi band join IS the operator
      "q_time_decay", "q_tfidf", "q_idle_customers",
      "q_pagerank", "q_important_parts", "q_top_supplier",
      "q_lm_score", // 1-row anchors (lm_score: broadcast vocab-size scalar)
      "q_dsir_select", // 1-row anchor (broadcast gram-count totals scalar)
      "q_incr_ingest", // same DSIR 1-row totals anchor inside the composite
      "q_trainprep_pipeline", // 1-row anchors (vocab size + median NLL)
      "q_cluster_sample") // corpus x broadcast k-row centroid table (B163 — one linear pass against a constant k)
    val skip = Set("q_streaming_pipeline", "q_streaming_sessions",
      "q_streaming_join", "q_streaming_merge")
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(skip).filterNot(allowNonEqui)
      .flatMap { q =>
        val plan = graft.SparkEntry.queries(q)(spark, sf001)
          .queryExecution.executedPlan.toString
        if (plan.contains("BroadcastNestedLoopJoin") || plan.contains("CartesianProduct"))
          Some(q)
        else None
      }
    assert(offenders.isEmpty,
      s"queries planning nested-loop/cartesian joins: $offenders")
  }
}
