package graft

import graft.io.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic scale stress: replicate the sf0.1 fixtures `factor`× with
  * key-shifted copies (FK relationships preserved — each copy shifts
  * every key domain by the same stride), then run the headline bench
  * queries plus the skew/LSH/connected-components paths against the
  * enlarged dataset. This turns the "scale-safe by plan shape" claims
  * into measured wall-times at 10× the per-round bench volume (≈6M
  * lineitem rows, 1M events, 80k docs with genuine 10-clique duplicate
  * groups — the dup-heavy corpus a real crawl produces).
  *
  * Usage: runMain graft.Stress [srcDir] [factor] [outDir]
  * Prints one JSON line: {"metric":"stress_total", ..., "queries":{...}}
  */
object Stress {

  /** Copies ≥1 shift every key by copy*stride; copy 0 is the original, so
    * fixed-id lookups (query vectors, vec_id=0) keep working.
    */
  private val Stride = 1L << 33

  private def replicate(df: DataFrame, factor: Int, keyCols: Seq[String]): DataFrame =
    (0 until factor).map { i =>
      keyCols.foldLeft(df)((d, k) => d.withColumn(k, col(k) + lit(i * Stride)))
    }.reduce(_.unionAll(_))

  def buildReplicas(spark: SparkSession, src: String, factor: Int, out: String): Unit = {
    val marker = java.nio.file.Paths.get(out, "_REPLICAS_DONE")
    if (java.nio.file.Files.exists(marker)) return
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    // key domains shifted per copy; dims (region/nation/part/supplier)
    // pass through unreplicated — fact:dim ratio grows with the factor,
    // exactly how a real corpus scales against its reference data
    val shifted: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))
    Tables.names.foreach { name =>
      // a legacy ns-timestamp events fixture must replicate from the RAW
      // long-ns read so the written copy stays BIGINT and Tables.events'
      // schema override keeps working against the replica dir; a native
      // timestamp fixture round-trips as-is (and Tables.events detects
      // the replica's layout from its own footer)
      val base =
        if (name == "events" && !Tables.eventsHasNativeTs(spark, src))
          spark.read.schema(Tables.eventsRawSchema).parquet(Tables.path(src, name))
        else spark.read.parquet(Tables.path(src, name))
      val rep = name match {
        case "events" => replicate(base, factorOf(name, factor), Seq("event_id", "user_id"))
        case n if shifted.contains(n) => replicate(base, factorOf(name, factor), shifted(n))
        case _ => base
      }
      rep.write.mode("overwrite").parquet(Tables.path(out, name))
    }
    java.nio.file.Files.createFile(marker)
    ()
  }

  private def factorOf(name: String, factor: Int): Int = name match {
    case "region" | "nation" | "part" | "supplier" => 1
    case _ => factor
  }

  /** (result, seconds) of a counted action. */
  private def timed(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime(); val n = f; (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val out = args.lift(2).getOrElse(s"/tmp/graft_stress_${factor}x_" +
      src.replaceAll("[^A-Za-z0-9.]", "_"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // INT96 (Spark's legacy default) carries NO footer statistics or
      // logical annotation — timestamp columns would be unprunable and
      // unskippable; MICROS is the modern annotated int64 (Delta pins the
      // same). See ops/Stats.scala timestamp-domain notes.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // in-process chmod for the local-FS commit path (no libhadoop in
      // this environment, so the stock FS forks a subprocess per
      // staged-write _temporary dir — see graft.io.FastLocalFileSystem)
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildReplicas(spark, src, factor, out)
    val names = SparkEntry.benchQueries ++
      Seq("q_skew_join", "q_embed_neardup", "q_dup_clusters", "q_exact_dedup")
    spark.read.parquet(Tables.path(out, "lineitem")).count() // warmup
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      val samples = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = try fn(spark, out).count()
                catch { case e: Throwable =>
                  System.err.println(s"[stress] $name failed: $e"); -1L }
        (n, (System.nanoTime() - t0) / 1e9)
      }
      val best = samples.filter(_._1 >= 0).map(_._2)
      name -> (samples.last._1, if (best.nonEmpty) best.min else -1.0)
    }
    // CDF + replica-sync at scale: two factor×15k-row customer versions
    // with a 10%-update / 5%-delete mutation, then the row-level diff,
    // a bootstrap copy, and the INCREMENTAL catch-up — the table-format
    // ops measured at the sweep's volume. Rebuilt from scratch every run
    // (cheap at this size) so the timings always measure the same thing
    // and a previously killed run can't wedge the layout.
    val cdfTimes = try {
      val c = spark.read.parquet(Tables.path(out, "customer"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val root = s"$out/cdf_customer"
      val rep = s"$out/cdf_customer_replica"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(rep))
      graft.ops.Sinks.publishVersioned(c, root, None)
      val v1 = c.filter(pmod(col("c_custkey"), lit(20)) =!= 0)     // 5% deleted
        .withColumn("c_acctbal",
          when(pmod(col("c_custkey"), lit(10)) === 1,              // 10% updated
            col("c_acctbal") + 1).otherwise(col("c_acctbal")))
      graft.ops.Sinks.publishVersioned(v1, root, Some(0L))
      val (nChanges, tDiff) = timed(
        graft.ops.Sinks.changesBetween(spark, root, 0L, 1L, Seq("c_custkey")).count())
      // bootstrap lands the replica at v1, then a THIRD source version
      // makes the second sync exercise the incremental diff-apply path
      val (_, tBoot) = timed(
        graft.ops.Sinks.syncReplica(spark, root, rep, Seq("c_custkey")))
      graft.ops.Sinks.publishVersioned(
        v1.withColumn("c_acctbal", col("c_acctbal") + 1), root, Some(1L))
      val (_, tSync) = timed(
        graft.ops.Sinks.syncReplica(spark, root, rep, Seq("c_custkey")))
      System.err.println(
        s"[stress] cdf: $nChanges change rows, diff=$tDiff boot=$tBoot incr_sync=$tSync")
      Seq("cdf_diff" -> (nChanges, tDiff),
        "replica_bootstrap" -> (0L, tBoot), "replica_sync_incr" -> (0L, tSync))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] cdf leg failed: $e")
      Seq("cdf_diff" -> (-1L, -1.0))
    }
    // Incremental-MV leg: the refresh cost of a 10%-update / 5%-delete
    // delta against the factor×150k-row orders source, next to the full
    // recompute of the same view — the O(delta) vs O(table) gap the MV
    // exists to buy. (q_mview_incremental in the sweep above measures
    // only the refreshed READ; this measures the REFRESH.)
    val mvTimes = try {
      import graft.ops.{Merge, Mview, Sinks}
      val o = spark.read.parquet(Tables.path(out, "orders")).select(
        col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"),
        round(col("o_totalprice") * 100, 0).cast("long").as("o_cents"))
      val root = s"$out/mv_orders"
      val (src2, mv2) = (s"$root/src", s"$root/mv")
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      Sinks.publishVersioned(o, src2, None)
      val dims = Seq("o_orderstatus", "o_orderpriority")
      Mview.create(spark, src2, mv2, dims, Seq("o_cents"))
      // the mutation arrives as a MERGE that persists its change feed
      // (emitChanges) — the production write path; the refresh then rides
      // the O(delta) feed instead of re-diffing two snapshots
      val delta = o.filter(pmod(col("o_orderkey"), lit(20)) === 0)
        .withColumn("op", lit("delete"))
        .unionByName(o.filter(pmod(col("o_orderkey"), lit(10)) === 1)
          .withColumn("o_cents", col("o_cents") + 100)
          .withColumn("op", lit("upsert")))
      Merge.applyTo(spark, src2, delta, Seq("o_orderkey"), "op", emitChanges = true)
      val (_, tIncr) = timed(
        Mview.refresh(spark, src2, mv2, Seq("o_orderkey"), dims, Seq("o_cents")))
      val (nGroups, tFull) = timed(
        Mview.full(Sinks.readCurrent(spark, src2), dims, Seq("o_cents")).count())
      val viaFeed = Sinks.changeFeed(spark, src2, 0L, 1L).isDefined
      System.err.println(s"[stress] mview: $nGroups groups, feed_path=$viaFeed, " +
        s"refresh_incr=$tIncr full_recompute=$tFull")
      Seq("mv_refresh_incr" -> (nGroups, tIncr), "mv_full_recompute" -> (nGroups, tFull))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] mview leg failed: $e")
      Seq("mv_refresh_incr" -> (-1L, -1.0))
    }
    // Data-skipping leg: how many files the custkey range actually opens
    // on the Z-ordered stats table, and the pruned-read vs full-scan
    // wall — the metric data skipping exists to move.
    val skipTimes = try {
      import graft.ops.{Sinks, Stats}
      val tbl = graft.queries.ScanOps.statsTable(spark, out)
      val live = Sinks.resolve(tbl)
      val total = graft.io.Fs.listDir(java.nio.file.Paths.get(live))
        .count(_.toString.endsWith(".parquet")).toLong
      val kept = Stats.prunedFiles(spark, live, "o_custkey", 10L, 40L).size.toLong
      val (nRows, tPruned) = timed(
        Stats.readCurrentWhere(spark, tbl, "o_custkey", 10L, 40L).count())
      val (_, tFull) = timed(spark.read.parquet(live)
        .filter(col("o_custkey").between(10L, 40L)).count())
      System.err.println(
        s"[stress] skipping: $kept of $total files opened, $nRows rows, " +
          s"pruned=$tPruned full=$tFull")
      Seq("skip_files_opened" -> (kept, tPruned),
        "skip_files_total" -> (total, tFull))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] skipping leg failed: $e")
      Seq("skip_files_opened" -> (-1L, -1.0))
    }
    // Partitioned-table leg: publish the factor×100k-row events as a
    // Hive-partitioned versioned table (partition spec in _PROPS — the
    // same path every catalog writer takes), then the partition-pruned
    // aggregate vs the full-table aggregate — the directory-pruning gap
    // partitioning exists to buy at 100 TB.
    val partTimes = try {
      import graft.ops.{Sinks, TableProps}
      val root = s"$out/events_part"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      TableProps.store(root, Map(TableProps.PartitionKey -> "event_type STRING"))
      val ev = Tables.events(spark, out)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      val (_, tPub) = timed {
        Sinks.publishVersioned(ev, root, None); 0L
      }
      val (nPruned, tPruned) = timed(
        Sinks.readCurrent(spark, root).filter(col("event_type") === "click")
          .agg(count(lit(1)), sum("value")).count())
      val (_, tFull) = timed(
        Sinks.readCurrent(spark, root)
          .groupBy("event_type").agg(count(lit(1)), sum("value")).count())
      System.err.println(
        s"[stress] partitioned: publish=$tPub pruned_agg=$tPruned full_agg=$tFull")
      Seq("part_publish" -> (0L, tPub),
        "part_pruned_agg" -> (nPruned, tPruned), "part_full_agg" -> (0L, tFull))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] partitioned leg failed: $e")
      Seq("part_publish" -> (-1L, -1.0))
    }
    // Append leg: the O(delta) vs O(table) commit gap appendVersioned
    // exists to buy — a 0.1% delta committed by linked append (new files
    // + hardlink carry-over, stats inherited, insert feed emitted) next
    // to the snapshot rewrite of the same commit, on the full-width
    // factor×600k-row lineitem. The append's cost is a handful of
    // metadata-scale jobs and stays FLAT as the table grows; the
    // snapshot rewrite grows linearly with the table.
    val appendTimes = try {
      import graft.ops.Sinks
      val li = spark.read.parquet(Tables.path(out, "lineitem"))
      val root = s"$out/append_lineitem"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      Sinks.publishVersioned(li, root, None, statsCols = Seq("l_orderkey"))
      // pin the delta so both legs time COMMIT work, not the shared
      // 6M-row scan that produces the 0.1% delta
      val delta = li.filter(pmod(col("l_orderkey"), lit(1000)) === 7)
        .withColumn("l_orderkey", -col("l_orderkey")) // disjoint key range
        .localCheckpoint()
      val (_, tAppend) = timed {
        Sinks.appendVersioned(delta, root, Some(0L), emitFeed = true); 0L
      }
      val (_, tSnap) = timed {
        // the SAME logical commit as the append leg: base (v0) ∪ delta —
        // readCurrent would already contain the appended delta
        Sinks.publishVersioned(
          Sinks.readVersion(spark, root, 0L).unionByName(delta), root, Some(1L)); 0L
      }
      System.err.println(
        s"[stress] append: delta_commit=$tAppend snapshot_rewrite=$tSnap")
      Seq("append_delta_commit" -> (0L, tAppend),
        "append_snapshot_rewrite" -> (0L, tSnap))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] append leg failed: $e")
      Seq("append_delta_commit" -> (-1L, -1.0))
    }
    // Copy-on-write DML leg: a narrow SQL DELETE against the range-laid
    // factor×600k-row lineitem — the touched-file pass + rewrite of ONE
    // file — next to the full-table rewrite the same statement cost
    // before file-granular DML.
    val dmlTimes = try {
      import graft.ops.Sinks
      val wh = s"$out/dml_wh"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(wh))
      val li = spark.read.parquet(Tables.path(out, "lineitem"))
        .repartitionByRange(16, col("l_orderkey")).sortWithinPartitions("l_orderkey")
      Sinks.publishVersioned(li, s"$wh/li", None, statsCols = Seq("l_orderkey"))
      val cat = "graftstress_dml"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", wh)
      val (_, tCow) = timed {
        spark.sql(s"DELETE FROM $cat.li WHERE l_orderkey BETWEEN 1000 AND 2000"); 0L
      }
      val v = Sinks.currentVersion(s"$wh/li").get
      val carried = graft.io.Fs.walkParquet(
          java.nio.file.Paths.get(Sinks.versionPath(s"$wh/li", v)))
        .count(f => java.nio.file.Files.getAttribute(f, "unix:nlink")
          .asInstanceOf[Int] >= 2).toLong
      val (_, tFull) = timed {
        val cur = Sinks.readCurrent(spark, s"$wh/li")
        Sinks.publishVersioned(
          cur.filter(!col("l_orderkey").between(3000, 4000)), s"$wh/li", Some(v)); 0L
      }
      System.err.println(
        s"[stress] dml_cow: carried=$carried files, cow_delete=$tCow full_rewrite=$tFull")
      Seq("dml_cow_delete" -> (carried, tCow), "dml_full_rewrite" -> (0L, tFull))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] dml leg failed: $e")
      Seq("dml_cow_delete" -> (-1L, -1.0))
    }
    // MOR delete-churn leg (B140): 20 sequential deletion-vector
    // commits against the factor×600k-row lineitem — each commit must
    // stay O(this commit's matched rows): per-commit NEW sidecar bytes
    // (inode-diff vs the previous version) must not grow with the
    // cumulative vector, and total wall time must stay flat-ish across
    // the sequence. The row reported is the MAX per-commit new bytes.
    val morChurnTimes = try {
      import graft.ops.{Dv, Sinks}
      val root = s"$out/mor_churn"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val li = spark.read.parquet(Tables.path(out, "lineitem"))
        .select("l_orderkey", "l_partkey", "l_quantity")
        .repartition(16)
      Sinks.publishVersioned(li, root, None)
      def dvPartInodes(v: Long): Set[Object] = {
        val d = java.nio.file.Paths.get(Sinks.versionPath(root, v), Dv.Sidecar)
        if (!java.nio.file.Files.isDirectory(d)) Set.empty
        else graft.io.Fs.listDir(d)
          .filter(_.getFileName.toString.endsWith(".parquet"))
          .map(f => java.nio.file.Files.readAttributes(f,
            classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()).toSet
      }
      var maxNewBytes = 0L
      val (_, tChurn) = timed {
        (0 until 20).foreach { i =>
          val v = Sinks.deleteVector(spark, root,
            pmod(col("l_orderkey"), lit(100)) === i)
          val prev = dvPartInodes(v - 1)
          val newBytes = {
            val d = java.nio.file.Paths.get(Sinks.versionPath(root, v), Dv.Sidecar)
            graft.io.Fs.listDir(d)
              .filter(_.getFileName.toString.endsWith(".parquet"))
              .filter(f => !prev.contains(java.nio.file.Files.readAttributes(f,
                classOf[java.nio.file.attribute.BasicFileAttributes]).fileKey()))
              .map(java.nio.file.Files.size).sum
          }
          maxNewBytes = math.max(maxNewBytes, newBytes)
        }
        0L
      }
      val finalCard = Dv.cardinality(spark, Sinks.resolve(root))
      System.err.println(s"[stress] mor_churn: 20 commits in $tChurn s, " +
        s"max per-commit dv bytes=$maxNewBytes, final cardinality=$finalCard")
      Seq("mor_churn_20" -> (maxNewBytes, tChurn))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] mor churn leg failed: $e")
      Seq("mor_churn_20" -> (-1L, -1.0))
    }
    // MOR reader-side COLUMNAR leg (round-16): a bucket-partitioned
    // (SPJ-capable → reader-side) table with a ~2% deletion vector must
    // read at ~the clean columnar scan's speed — the subtraction now
    // filters INSIDE the ColumnarBatch via a selection mapping instead
    // of downgrading the whole scan to row-at-a-time (was ≈1.8× before).
    // Clean baseline = time travel to the pre-DELETE version: identical
    // files, no sidecar.
    val morReadTimes = try {
      import graft.ops.{Dv, Sinks, TableProps}
      val mrCat = "gmorread"
      val mrRoot = s"$out/mor_read"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(mrRoot))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(mrRoot))
      spark.conf.set(s"spark.sql.catalog.$mrCat", "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$mrCat.root", mrRoot)
      spark.read.parquet(Tables.path(out, "lineitem"))
        .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
        .createOrReplaceTempView("mor_read_src")
      spark.sql(s"CREATE TABLE $mrCat.t (l_orderkey BIGINT, l_partkey BIGINT, " +
        "l_quantity DOUBLE, l_extendedprice DOUBLE) USING parquet " +
        "PARTITIONED BY (bucket(8, l_orderkey))")
      spark.sql(s"INSERT INTO $mrCat.t SELECT * FROM mor_read_src")
      // CREATE is v0 (empty) — the pre-DELETE snapshot is the INSERT's
      val preV = Sinks.currentVersion(s"$mrRoot/t").get
      TableProps.update(s"$mrRoot/t")(_ + ("graft.dml.mode" -> "mor"))
      spark.sql(s"DELETE FROM $mrCat.t WHERE l_orderkey % 50 = 3")
      require(Dv.exists(Sinks.resolve(s"$mrRoot/t")), "DELETE must route MOR")
      require(graft.catalog.MorSpj.readerSide(s"$mrRoot/t",
        Sinks.resolve(s"$mrRoot/t")), "bucket layout must ride reader-side")
      def agg(df: org.apache.spark.sql.DataFrame): Long =
        df.agg(count(lit(1)), sum(col("l_quantity")),
          sum(col("l_extendedprice") * col("l_quantity"))).head.getLong(0)
      val dvDf = spark.table(s"$mrCat.t")
      val plan = dvDf.queryExecution.executedPlan.toString
      require(plan.contains("ColumnarToRow"),
        s"reader-side MOR scan must stay columnar:\n$plan")
      val cleanDf = spark.sql(s"SELECT * FROM $mrCat.t VERSION AS OF $preV")
      agg(cleanDf); agg(dvDf) // warm both paths (footers, code)
      // best-of-3 per path: the scans are ~0.1 s at this scale, where a
      // single GC pause or JIT re-profile flips the ratio — the gate
      // pins the structural cost, not scheduler luck
      val (cleanN, tClean) = (1 to 3).map(_ => timed(agg(cleanDf))).minBy(_._2)
      val (dvN, tDv) = (1 to 3).map(_ => timed(agg(dvDf))).minBy(_._2)
      require(dvN < cleanN, s"DV subtraction must drop rows: $dvN vs $cleanN")
      val ratio = tDv / math.max(tClean, 1e-9)
      System.err.println(f"[stress] mor_read: clean=$tClean%.3f s dv=$tDv%.3f s " +
        f"ratio=$ratio%.2f (rows $cleanN -> $dvN)")
      require(ratio <= 1.35,
        f"reader-side columnar subtraction must stay near the clean scan: $ratio%.2f x")
      Seq("mor_read_ratio_pct" -> ((ratio * 100).toLong, tDv))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] mor read leg failed: $e")
      Seq("mor_read_ratio_pct" -> (-1L, -1.0))
    }
    // Bloom point-lookup leg (B123): the factor×150k-row orders table
    // HASH-laid on o_orderkey (range stats useless for a point probe) with
    // a _bloom sidecar — the membership prune vs the full scan for one
    // key. At this toy scale parquet row-group pushdown keeps the full
    // scan fast too; the structural claim is the files-opened count:
    // bloom opens ~1 of 32 regardless of table size, the full scan opens
    // all of them, and that ratio is what a 100 TB point lookup pays.
    val bloomTimes = try {
      import graft.ops.{Bloom, Sinks}
      val root = s"$out/bloom_orders"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val o = spark.read.parquet(Tables.path(out, "orders"))
        .repartition(32, col("o_orderkey"))
      Sinks.publishVersioned(o, root, None, statsCols = Seq("o_orderkey"))
      val live = Sinks.resolve(root)
      val (_, tBuild) = timed {
        Bloom.annotate(spark, live, Seq("o_orderkey"), expectedItems = 100000L); 0L
      }
      val key = o.filter(col("o_orderkey") >= 1000)
        .agg(min("o_orderkey")).head().getLong(0)
      val total = graft.io.Fs.walkParquet(java.nio.file.Paths.get(live)).size
      val kept = Bloom.prunedFilesEq(spark, live, "o_orderkey", key).size.toLong
      val (nB, tBloom) = timed(
        Bloom.readCurrentWhereEq(spark, root, "o_orderkey", key).count())
      val (nF, tFull) = timed(
        spark.read.parquet(live).filter(col("o_orderkey") === key).count())
      require(nB == nF, s"bloom lookup diverged: $nB vs $nF rows")
      System.err.println(s"[stress] bloom: kept=$kept/$total files, " +
        s"build=$tBuild lookup=$tBloom full_scan=$tFull")
      Seq("bloom_build" -> (0L, tBuild), "bloom_lookup" -> (kept, tBloom),
        "bloom_full_scan" -> (total.toLong, tFull))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] bloom leg failed: $e")
      Seq("bloom_lookup" -> (-1L, -1.0))
    }
    // Dedup-tier 100× leg (round-11 verdict item 6): the persisted
    // near-dup index is THE operator whose economics matter at corpus
    // scale, so measure the claim directly — build on the sf0.1 corpus
    // (~8k docs), then 10 cycles of [probe a FIXED 2k batch, append 80k
    // NOVEL docs]. The index grows ~100× underneath while the probe's
    // work should stay O(batch) thanks to the bloom file pruning +
    // broadcast join: per-cycle probe wall-time is the measurement, and
    // probe_last/probe_first is the flatness ratio the 100 TB claim
    // rides on. Appended docs are unique synthetic text (novel shingles)
    // — replicated REAL text would stack identical signatures into
    // ever-hotter buckets and grow the probe's OUTPUT, which would
    // measure join fan-out, not scan cost.
    val dedup100Times = try {
      import graft.ops.NearDupIndex
      val root = s"$out/neardup_100x"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val docsBase = spark.read.parquet(Tables.path(src, "documents"))
        .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
      val nBase = docsBase.count()
      val (_, tBuild) = timed { NearDupIndex.build(spark, docsBase, root); 0L }
      def synth(fromId: Long, n: Long, salt: String) =
        spark.range(fromId, fromId + n)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(1), lit(30)),
              j => md5(concat(col("id"), lit(salt), j)))).as("text"))
      // fixed probe batch: 1k near-dups of the ORIGINAL corpus + 1k
      // novel docs — constant input, constant expected output
      val probeBatch = docsBase.limit(1000)
        .select((col("doc_id") + lit(90L * Stride)).as("doc_id"), col("text"))
        .unionAll(synth(2_000_000_000L, 1000, "probe"))
        .localCheckpoint()
      val cycles = (1 to 10).map { i =>
        val (nCand, tProbe) = timed(
          NearDupIndex.candidates(spark, probeBatch, root).count())
        val (_, tAppend) = timed {
          NearDupIndex.append(spark,
            synth(3_000_000_000L + i * 1_000_000L, 80000, s"c$i"), root); 0L
        }
        System.err.println(f"[stress] neardup100x cycle $i: probe=$tProbe%.3f s " +
          f"($nCand cands), append(80k)=$tAppend%.3f s")
        (tProbe, tAppend, nCand)
      }
      val flat = cycles.last._1 / cycles.head._1
      val nFinal = graft.ops.Sinks.readCurrent(spark, root)
        .select("doc_id").distinct().count()
      System.err.println(f"[stress] neardup100x: $nBase -> $nFinal docs " +
        f"(${nFinal.toDouble / nBase}%.0fx), build=$tBuild%.2f s, " +
        f"probe first=${cycles.head._1}%.3f last=${cycles.last._1}%.3f " +
        f"(ratio $flat%.2f)")
      Seq("neardup100x_build" -> (nBase, tBuild),
        "neardup100x_probe_first" -> (cycles.head._3, cycles.head._1),
        "neardup100x_probe_last" -> (cycles.last._3, cycles.last._1),
        "neardup100x_append_max" -> (nFinal, cycles.map(_._2).max))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] neardup100x leg failed: $e")
      Seq("neardup100x_probe_last" -> (-1L, -1.0))
    }
    // Multi-writer contention leg (round-13): 6 genuinely concurrent
    // appender threads (10 commits each) + 1 merge-on-read deleter
    // (10 DV commits) hammering ONE table, every commit basing on a
    // just-read current version — the blind-append/disjoint-MOR traffic
    // auto-rebase exists for. Asserts ZERO lost commits (every commit
    // lands, version count proves it) and a serial-equivalent final
    // state (deletes target seeded negative ids, appends write disjoint
    // positives, so the exact final set is order-independent); reports
    // the rebase-retry count and worst per-commit latency — the
    // economics of optimistic concurrency under real contention.
    val multiWriterTimes = try {
      import graft.ops.Sinks
      val root = s"$out/multi_writer"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      val seed = (-10L to 0L).toSeq
      Sinks.publishVersioned(
        spark.createDataFrame(seed.map(Tuple1(_))).toDF("id")
          .withColumn("v", col("id") * 10).repartition(1), root, None)
      val nApp = 6; val perApp = 10; val nDel = 10
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val worstMs = new java.util.concurrent.atomic.AtomicLong(0)
      val rebase0 = Sinks.rebaseRetries.get()
      def track[T](f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        val ms = (System.nanoTime() - t0) / 1000000
        worstMs.getAndUpdate(m => math.max(m, ms)); r
      }
      val (_, tWall) = timed {
        val appenders = (1 to nApp).map { i =>
          new Thread(() => {
            try (0 until perApp).foreach { j =>
              val one = spark.createDataFrame(
                  Seq(Tuple1(i * 1000L + j))).toDF("id")
                .withColumn("v", col("id") * 10)
              track(Sinks.appendVersioned(one, root, Sinks.currentVersion(root)))
            } catch { case t: Throwable => errors.add(t) }
          })
        }
        val deleter = new Thread(() => {
          try (1 to nDel).foreach { r =>
            track(Sinks.deleteVector(spark, root, col("id") === lit(-r.toLong)))
          } catch { case t: Throwable => errors.add(t) }
        })
        (appenders :+ deleter).foreach(_.start())
        (appenders :+ deleter).foreach(_.join())
        0L
      }
      require(errors.isEmpty, s"multi-writer lost commits: ${errors.peek()}")
      val nCommits = Sinks.listVersions(root).size - 1
      require(nCommits == nApp * perApp + nDel,
        s"expected ${nApp * perApp + nDel} commits, found $nCommits versions")
      val got = Sinks.readCurrent(spark, root)
        .select("id").collect().map(_.getLong(0)).toSet
      val want = (for (i <- 1 to nApp; j <- 0 until perApp)
        yield i * 1000L + j).toSet + 0L
      require(got == want,
        s"serial-equivalent state violated: missing ${want -- got}, extra ${got -- want}")
      val rebases = Sinks.rebaseRetries.get() - rebase0
      System.err.println(s"[stress] multi_writer: ${nApp * perApp + nDel} commits " +
        s"from ${nApp + 1} threads in $tWall s, $rebases rebases, " +
        s"worst commit ${worstMs.get()} ms, zero lost")
      Seq("multi_writer_commits" -> ((nApp * perApp + nDel).toLong, tWall),
        "multi_writer_rebases" -> (rebases, worstMs.get() / 1000.0))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] multi-writer leg failed: $e")
      Seq("multi_writer_commits" -> (-1L, -1.0))
    }
    // equality-delete churn (round-14): concurrent BLIND upserters (no
    // table read per commit) racing a plain appender — the streaming-CDC
    // multi-writer shape. Each upserter owns a disjoint key range and
    // re-upserts it `rounds` times; within a thread commits are ordered,
    // so the final value per key is provably the last round. Invariants:
    // zero lost commits, exactly one live row per key (the seq-scoped
    // reconciliation), appended keys untouched by tombstones, and the
    // fold (compaction) preserves the exact state while shedding the
    // sidecars.
    val eqdelTimes = try {
      import graft.ops.{EqDel, Sinks}
      val root = s"$out/eq_upsert"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      Sinks.publishVersioned(
        spark.range(0, 1000).toDF("id").withColumn("v", lit(0L))
          .repartition(2), root, None)
      val nUps = 4; val rounds = 8; val nAppend = 20
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val (_, tWall) = timed {
        val upserters = (0 until nUps).map { i =>
          new Thread(() => {
            try (1 to rounds).foreach { r =>
              val mine = spark.range(i * 100L, i * 100L + 50L).toDF("id")
                .withColumn("v", lit(r.toLong))
              EqDel.upsertBatch(spark, mine, root, Seq("id"))
            } catch { case t: Throwable => errors.add(t) }
          })
        }
        val appender = new Thread(() => {
          try (0 until nAppend).foreach { j =>
            Sinks.appendVersioned(
              spark.createDataFrame(Seq((10000L + j, -1L))).toDF("id", "v"),
              root, Sinks.currentVersion(root))
          } catch { case t: Throwable => errors.add(t) }
        })
        (upserters :+ appender).foreach(_.start())
        (upserters :+ appender).foreach(_.join())
        0L
      }
      require(errors.isEmpty, s"eq-upsert churn lost commits: ${errors.peek()}")
      val nCommits = Sinks.listVersions(root).size - 1
      require(nCommits == nUps * rounds + nAppend,
        s"expected ${nUps * rounds + nAppend} commits, found $nCommits")
      val got = Sinks.readCurrent(spark, root)
        .groupBy("id").agg(count(lit(1)).as("n"), max("v").as("v"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      require(got.size == 1000 + nAppend, s"row-count drift: ${got.size}")
      require(got.forall(_._2._1 == 1L), "duplicate live rows for a key")
      (0 until nUps).foreach { i =>
        (i * 100L until i * 100L + 50L).foreach { k =>
          require(got(k)._2 == rounds.toLong,
            s"key $k final value ${got(k)._2} != last round $rounds")
        }
      }
      (0 until nAppend).foreach(j =>
        require(got(10000L + j)._2 == -1L, s"appended key ${10000 + j} lost"))
      // the fold: compaction sheds the sidecars, state identical
      val (_, tFold) = timed { Sinks.compactVersioned(spark, root); 0L }
      require(!EqDel.exists(Sinks.resolve(root)), "fold left tombstones")
      require(Sinks.readCurrent(spark, root).count() == 1000L + nAppend)
      System.err.println(s"[stress] eq_upsert: ${nUps * rounds + nAppend} blind " +
        s"commits from ${nUps + 1} threads in $tWall s, fold $tFold s, zero lost")
      Seq("eq_upsert_commits" -> ((nUps * rounds + nAppend).toLong, tWall),
        "eq_upsert_fold" -> ((1000L + nAppend), tFold))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] eq-upsert leg failed: $e")
      Seq("eq_upsert_commits" -> (-1L, -1.0))
    }
    // Governance leg (round-14, re-pointed round-16): metadata NDV +
    // right-to-erasure at the sweep's volume. Past the lgK=12 coupon
    // promotion threshold a distributed scan's HLL estimate is merge-
    // order-dependent (DataSketches HIP estimator), so bit-equality
    // with the scan is only pinned at spec size (NdvSpec); here the
    // serve must be DETERMINISTIC across calls and inside the sketch's
    // 3σ error of the EXACT distinct count — the invariant that holds
    // at every scale. The purge then MOR-deletes 5%, erases a key
    // stripe, and PROVES erasure with the raw scan — that proof is the
    // dominant cost and the honest price of the guarantee.
    val govTimes = try {
      import graft.ops.{Sinks, Stats, TableProps}
      val c = spark.read.parquet(Tables.path(out, "customer")).select(
        col("c_custkey"), col("c_name"), col("c_mktsegment"), col("c_acctbal"))
      val root = s"$out/gov_customer"
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(root))
      TableProps.store(root, Map(
        TableProps.NdvKey -> "c_custkey,c_mktsegment",
        TableProps.StatsKey -> "c_custkey"))
      Sinks.publishVersioned(
        c.repartitionByRange(32, col("c_custkey")), root, None)
      val (served, tNdv) = timed(Stats.ndv(spark, root, Seq("c_custkey")).head._2)
      require(served == Stats.ndv(spark, root, Seq("c_custkey")).head._2,
        "stress ndv: repeated metadata serves must be byte-deterministic")
      val exact = Sinks.readCurrent(spark, root).select("c_custkey")
        .distinct().count()
      val err = math.abs(served.toDouble - exact) / math.max(exact, 1L)
      require(err <= 0.05, // 3σ at lgK=12 is ~4.9%
        f"stress ndv: served $served vs exact $exact — err $err%.4f > 3σ")
      Sinks.deleteVector(spark, root, pmod(col("c_custkey"), lit(20)) === 0)
      val (purged, tPurge) = timed(
        Sinks.purgeWhere(spark, root, "c_custkey % 50 = 1")._1)
      System.err.println(s"[stress] gov: ndv=$served ($tNdv s), " +
        s"purged=$purged rows ($tPurge s, raw-scan verified)")
      Seq("gov_ndv" -> (served, tNdv), "gov_purge" -> (purged, tPurge))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] governance leg failed: $e")
      Seq("gov_ndv" -> (-1L, -1.0))
    }
    // Scan-tier leg (round-14, B185-B189): the three scan-wrapper
    // claims PLAN-ASSERTED at the sweep's volume, not just spec size —
    // sidecar statistics are row-exact on a factor×15k-row table, the
    // co-bucketed factor×60k⋈factor×15k join really runs Exchange-free,
    // and a star-schema probe really prunes partitions at runtime (DPP
    // through the v2 scan).
    val scanTierTimes = try {
      import graft.ops.{Sinks, TableProps}
      val cat = "gstress"
      spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
      spark.conf.set(s"spark.sql.catalog.$cat.root", s"$out/scan_tier")
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      graft.io.Fs.deleteRecursively(java.nio.file.Paths.get(s"$out/scan_tier"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$out/scan_tier"))
      // B185 exact stats at volume
      val c = spark.read.parquet(Tables.path(out, "customer"))
        .select(col("c_custkey"), col("c_nationkey"))
      val croot = s"$out/scan_tier/cust"
      TableProps.store(croot, Map(TableProps.StatsKey -> "c_custkey"))
      Sinks.publishVersioned(c.repartitionByRange(32, col("c_custkey")), croot, None)
      val (statsRows, tStats) = timed {
        val rel = spark.table(s"$cat.cust").queryExecution.optimizedPlan.collectFirst {
          case s: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => s.scan
        }.get
        rel.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
          .estimateStatistics().numRows().getAsLong
      }
      val trueRows = c.count()
      require(statsRows == trueRows,
        s"stress scan-tier: reported $statsRows != $trueRows rows")
      // B189 co-bucketed join Exchange-free at volume (the q_spj_bucket
      // warehouse built above at this factor). Broadcast is disabled for
      // the assertion — a stats-less side under the threshold would
      // legitimately broadcast, and "no Exchange" means NO exchange
      val bcat = "graftbkt_" + out.replaceAll("[^A-Za-z0-9]", "_")
      val savedBc = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (spjPairs, tSpj) = try timed {
        val j = spark.table(s"$bcat.orders_bkt")
          .join(spark.table(s"$bcat.lineitem_bkt"),
            col("o_orderkey") === col("l_orderkey"))
        val n = j.count()
        val plan = j.queryExecution.executedPlan.toString
        require(!plan.contains("Exchange"),
          "stress scan-tier: co-bucketed join shuffled at volume")
        n
      } finally savedBc match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      // B188 DPP at volume: nation-partitioned customers probed by a
      // two-nation dim — the runtime filter must reach the v2 scan
      val proot = s"$out/scan_tier/cust_part"
      TableProps.store(proot, Map(
        TableProps.PartitionKey -> "c_nationkey INT"))
      Sinks.publishVersioned(c, proot, None)
      import spark.implicits._
      spark.createDataset(Seq((1, 1), (2, 1))).toDF("c_nationkey", "grp")
        .write.mode("overwrite").parquet(s"$out/scan_tier/dim")
      val (dppRows, tDpp) = timed {
        val q = spark.table(s"$cat.cust_part").join(
          spark.read.parquet(s"$out/scan_tier/dim").filter(col("grp") === 1),
          "c_nationkey")
        val n = q.count()
        val plan = q.queryExecution.executedPlan.toString
        require(plan.contains("dynamicpruning"),
          "stress scan-tier: DPP did not reach the v2 scan at volume")
        n
      }
      System.err.println(s"[stress] scan_tier: stats exact ($tStats s), " +
        s"spj pairs=$spjPairs Exchange-free ($tSpj s), dpp rows=$dppRows ($tDpp s)")
      Seq("scan_stats" -> (statsRows, tStats), "scan_spj" -> (spjPairs, tSpj),
        "scan_dpp" -> (dppRows, tDpp))
    } catch { case e: Throwable =>
      System.err.println(s"[stress] scan-tier leg failed: $e")
      Seq("scan_stats" -> (-1L, -1.0))
    }
    val all = results ++ cdfTimes ++ mvTimes ++ skipTimes ++ partTimes ++
      appendTimes ++ dmlTimes ++ morChurnTimes ++ morReadTimes ++ bloomTimes ++
      dedup100Times ++ multiWriterTimes ++ eqdelTimes ++ govTimes ++
      scanTierTimes
    val qs = all.map { case (k, (_, t)) => s"\"" + k + "\":" + t }
      .mkString("{", ",", "}")
    val rows = all.map { case (k, (n, _)) => s"\"" + k + "\":" + n }
      .mkString("{", ",", "}")
    val errs = all.collect { case (k, (n, _)) if n < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = all.map(_._2._2).filter(_ >= 0).sum
    println(s"""{"metric":"stress_total","value":$total,"unit":"sec","factor":$factor,"queries":$qs,"rows":$rows,"errors":$errs,"src":"$src"}""")
    spark.stop()
  }
}
