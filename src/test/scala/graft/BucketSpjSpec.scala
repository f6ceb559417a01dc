package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** B189 bucket co-location: PURE-bucket hidden specs stay on the v2
  * scan path (DvReadRule deliberately does not swap them — the bare
  * scan is row-complete and the table hides the derived column), where
  * the wrapper reports `bucket(n, col)` KeyGroupedPartitioning resolved
  * through the catalog's `bucket` scalar function — so HIGH-CARDINALITY
  * co-bucketed tables join with zero Exchange — and point lookups on
  * the bucket source prune to one `_tp_*` directory via the implied
  * directory-equality pushdown.
  */
class BucketSpjSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): String = {
    seq += 1
    val cat = s"gbkt$seq"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("graft_bucketspj").toString)
    cat
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

  test("pure-bucket tables read COMPLETE and schema-hidden on the v2 path") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 5000L).map(i => (i, s"p$i")).toDF("k", "payload")
      .createOrReplaceTempView("bkt_src")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, payload STRING) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM bkt_src")
    val df = spark.table(s"$cat.t")
    assert(df.columns.toSeq == Seq("k", "payload"), "the derived column must stay hidden")
    assert(df.count() == 5000L, "every bucket directory must be read")
    // the un-swapped read IS the v2 scan (no funnel Project/V1 relation)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), s"pure bucket must stay on the v2 path:\n$plan")
    assert(df.agg(sum("k")).head.getLong(0) == (0L until 5000L).sum)
  }

  test("co-bucketed join: zero Exchange, exact results; mismatched bucket counts shuffle") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 20000L).map(i => (i % 5000L, i)).toDF("k", "a")
      .createOrReplaceTempView("bkt_l_src")
    (0L until 5000L).map(i => (i, i * 7)).toDF("k", "b")
      .createOrReplaceTempView("bkt_r_src")
    spark.sql(s"CREATE TABLE $cat.l (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.l SELECT * FROM bkt_l_src")
    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM bkt_r_src")
    spark.sql(s"CREATE TABLE $cat.r4 (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.r4 SELECT * FROM bkt_r_src")
    val expected = spark.table("bkt_l_src")
      .join(spark.table("bkt_r_src"), "k")
      .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s"))
      .head
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(s"$cat.l").join(spark.table(s"$cat.r"), "k")
      val got = joined.agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
      assert(got == expected, s"SPJ result must equal the recompute: $got vs $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"co-bucketed high-cardinality join must not shuffle:\n$plan")
      // 8 vs 4 buckets: NOT compatible — the shuffle must come back
      // (and results stay exact)
      val mismatched = spark.table(s"$cat.l").join(spark.table(s"$cat.r4"), "k")
      val got4 = mismatched.agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
      assert(got4 == expected)
      assert(mismatched.queryExecution.executedPlan.toString.contains("Exchange"),
        "different bucket counts are not co-partitioned")
    }
  }

  test("point lookup prunes to the value's bucket directory via the implied pushdown") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 4000L).map(i => (i, s"p$i")).toDF("k", "payload")
      .createOrReplaceTempView("bkt_pt_src")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, payload STRING) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM bkt_pt_src")
    val q = spark.table(s"$cat.t").filter(col("k") === 1234L)
    assert(q.collect().map(_.getString(1)).toSeq == Seq("p1234"))
    val expect = graft.ops.Transforms.bucketValue(1234L,
      org.apache.spark.sql.types.LongType, 8)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("_tp_k__b8"),
      s"the implied bucket-directory predicate must reach PartitionFilters:\n$plan")
    assert(plan.contains(s"= $expect)") || plan.contains(s"= $expect]"),
      s"the pushed bucket must be $expect:\n$plan")
    // IN lists prune to the union of their buckets; a NULL equality
    // pushes nothing extra and returns nothing
    val in = spark.table(s"$cat.t").filter(col("k").isin(7L, 9L))
    assert(in.count() == 2)
    assert(in.queryExecution.executedPlan.toString.contains("_tp_k__b8"))
    assert(spark.table(s"$cat.t").filter(col("k") === lit(null).cast("bigint"))
      .count() == 0)
  }

  test("mixed identity+bucket spec: the composite key still joins with zero Exchange") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 6000L).map(i => (i, s"r${i % 3}", i * 2)).toDF("k", "region", "a")
      .createOrReplaceTempView("bkt_mixspj_src")
    spark.sql(s"CREATE TABLE $cat.l (k BIGINT, a BIGINT, region STRING) " +
      "USING parquet PARTITIONED BY (region, bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.l SELECT k, a, region FROM bkt_mixspj_src")
    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, b BIGINT, region STRING) " +
      "USING parquet PARTITIONED BY (region, bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.r SELECT k, a * 5, region FROM bkt_mixspj_src")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val j = spark.table(s"$cat.l")
        .join(spark.table(s"$cat.r"), Seq("region", "k"))
      assert(j.count() == 6000L)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"identity+bucket composite clustering must not shuffle:\n$plan")
    }
  }

  test("the metadata surface follows: .partitions rolls up bucket dirs under their human spelling") {
    val cat = mkCat()
    import spark.implicits._
    (0L until 1000L).map(i => (i, s"p$i")).toDF("k", "payload")
      .createOrReplaceTempView("bkt_meta_src")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, payload STRING) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.t SELECT * FROM bkt_meta_src")
    val parts = spark.sql(s"SELECT * FROM $cat.t.`partitions`").collect()
    assert(parts.length == 4, s"4 buckets expected, got ${parts.length}")
    assert(parts.head.schema.fieldNames.head == "bucket(4, k)",
      "the derived dir surfaces under its human spelling")
    assert(parts.map(_.getAs[Long]("n_rows")).sum == 1000L)
  }

  test("COMPATIBLE bucket counts join shuffle-free via the reducer (round-15)") {
    // bucket(8) fact ⋈ bucket(4) dim: the finer side's values reduce to
    // the coarser grid (v % 4 == pmod(hash, 4)) under Spark's
    // allowCompatibleTransforms — zero Exchange where the mismatch leg
    // above (without the conf) correctly shuffles
    val cat = mkCat()
    import spark.implicits._
    (0L until 16000L).map(i => (i % 4000L, i)).toDF("k", "a")
      .createOrReplaceTempView("bkt_c8_src")
    (0L until 4000L).map(i => (i, i * 11)).toDF("k", "b")
      .createOrReplaceTempView("bkt_c4_src")
    spark.sql(s"CREATE TABLE $cat.c8 (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.c8 SELECT * FROM bkt_c8_src")
    spark.sql(s"CREATE TABLE $cat.c4 (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.c4 SELECT * FROM bkt_c4_src")
    val expected = spark.table("bkt_c8_src").join(spark.table("bkt_c4_src"), "k")
      .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.allowCompatibleTransforms.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(s"$cat.c8").join(spark.table(s"$cat.c4"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"compatible bucket counts must join with zero Exchange:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s"))
        .head == expected)
    }
  }

  test("partially-clustered distribution (skew mode) stays exact and Exchange-free") {
    // Spark's skew-aware SPJ keeps the skewed side's splits separate and
    // replicates the other side's groups instead of coalescing — the
    // wrapper's HasPartitionKey groups must survive that regrouping
    val cat = mkCat()
    import spark.implicits._
    // heavy skew: 80% of the fact rows share one key
    (0L until 20000L).map(i => (if (i % 5 != 0) 7L else i % 2000L, i))
      .toDF("k", "a").createOrReplaceTempView("bkt_sk_l")
    (0L until 2000L).map(i => (i, i * 13)).toDF("k", "b")
      .createOrReplaceTempView("bkt_sk_r")
    spark.sql(s"CREATE TABLE $cat.sl (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.sl SELECT * FROM bkt_sk_l")
    spark.sql(s"CREATE TABLE $cat.sr (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.sr SELECT * FROM bkt_sk_r")
    val expected = spark.table("bkt_sk_l").join(spark.table("bkt_sk_r"), "k")
      .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(s"$cat.sl").join(spark.table(s"$cat.sr"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"partially-clustered SPJ must stay zero-Exchange:\n$plan")
      assert(joined.agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s"))
        .head == expected)
    }
  }

  test("DV on a pure-bucket table stays v2 (reader-side subtraction, round-15); day+bucket stays v2 too") {
    val cat = mkCat()
    import spark.implicits._
    (0 until 1000).map(i => (i.toLong, s"p$i")).toDF("k", "payload")
      .createOrReplaceTempView("bkt_dv_src")
    spark.sql(s"CREATE TABLE $cat.d (k BIGINT, payload STRING) USING parquet " +
      "PARTITIONED BY (bucket(8, k)) TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql(s"INSERT INTO $cat.d SELECT * FROM bkt_dv_src")
    spark.sql(s"DELETE FROM $cat.d WHERE k < 100")
    val df = spark.table(s"$cat.d")
    assert(df.count() == 900L, "the vector must subtract reader-side")
    // round-15: the SPJ-capable layout keeps the v2 scan — the wrapper
    // subtracts inside its readers (MorSpjSpec pins the zero-Exchange
    // join and value-exactness)
    assert(df.queryExecution.executedPlan.toString.contains("BatchScan gbkt"),
      "a DV'd pure-bucket version must stay on the v2 scan path")
    // mixed range+bucket spec: round-15 serves range grids on the v2
    // path too (builder-implied pruning, RangeSpjSpec), so the whole
    // table stays v2 — no funnel swap left for hidden partitioning
    Seq((java.sql.Timestamp.valueOf("2026-01-02 03:04:05"), 1L))
      .toDF("ts", "k").createOrReplaceTempView("bkt_mix_src")
    spark.sql(s"CREATE TABLE $cat.m (ts TIMESTAMP, k BIGINT) USING parquet " +
      "PARTITIONED BY (days(ts), bucket(4, k))")
    spark.sql(s"INSERT INTO $cat.m SELECT * FROM bkt_mix_src")
    val m = spark.table(s"$cat.m")
    assert(m.count() == 1L)
    assert(m.columns.toSeq == Seq("ts", "k"))
    assert(m.queryExecution.executedPlan.toString.contains("BatchScan gbkt"),
      "a day+bucket table must stay on the v2 scan path (round-15)")
  }

  test("SPJ survives RENAME COLUMN (round-16): co-bucketed join stays zero-Exchange through a column mapping") {
    // a metadata-only rename used to drop the version to the v1 funnel,
    // re-introducing the shuffle a co-located layout exists to avoid —
    // until the next compaction. Round-16 serves rename/drop mappings on
    // the v2 path: the builder prunes/pushes under PHYSICAL footer
    // names, the scan re-aliases its read schema back to logical, and
    // the reported KeyGroupedPartitioning speaks logical names too.
    val cat = mkCat()
    import spark.implicits._
    (0L until 20000L).map(i => (i % 4000L, i)).toDF("k", "a")
      .createOrReplaceTempView("bkt_cm_l_src")
    (0L until 4000L).map(i => (i, i * 3)).toDF("k", "b")
      .createOrReplaceTempView("bkt_cm_r_src")
    spark.sql(s"CREATE TABLE $cat.l (k BIGINT, a BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.l SELECT * FROM bkt_cm_l_src")
    spark.sql(s"CREATE TABLE $cat.r (k BIGINT, b BIGINT) USING parquet " +
      "PARTITIONED BY (bucket(8, k))")
    spark.sql(s"INSERT INTO $cat.r SELECT * FROM bkt_cm_r_src")
    // rename BOTH the payload and the join key (the bucket SOURCE): the
    // key rename is the hard case — the grid dirs stay `_tp_bucket_8_k`
    // (physical) while the plan joins on the logical name
    spark.sql(s"ALTER TABLE $cat.r RENAME COLUMN b TO amount")
    spark.sql(s"ALTER TABLE $cat.r RENAME COLUMN k TO kk")
    val r = spark.table(s"$cat.r")
    assert(r.columns.toSeq == Seq("kk", "amount"))
    assert(r.queryExecution.executedPlan.toString.contains("BatchScan gbkt"),
      "a pure-rename mapping must stay on the v2 scan path")
    val expected = spark.table("bkt_cm_l_src")
      .join(spark.table("bkt_cm_r_src"), "k")
      .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(s"$cat.l")
        .join(r, col("k") === col("kk"))
      val got = joined
        .agg(count(lit(1)).as("n"), sum(col("a") + col("amount")).as("s")).head
      assert(got == expected, s"renamed-column SPJ result drifted: $got vs $expected")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"a rename must not re-introduce the co-bucketed join's shuffle:\n$plan")
    }
    // filter pushdown translates logical→physical: the implied bucket
    // directory-equality prune still works on the renamed source column
    val hit = spark.table(s"$cat.r").filter(col("kk") === 123L)
    assert(hit.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq ==
      Seq((123L, 369L)))
    // writes after the rename land under the carried PHYSICAL footer
    // schema and re-derive the grid from the mapped source
    spark.sql(s"INSERT INTO $cat.r VALUES (99001, -1)")
    assert(spark.table(s"$cat.r").filter(col("kk") === 99001L).count() == 1L)
    // the FORMAT door serves the same reader-side colmap path with
    // footer filter pushdown intact (physical-name delegate there too)
    val rRoot = spark.conf.get(s"spark.sql.catalog.$cat.root") + "/r"
    val fd = spark.read.format("graft").load(rRoot).filter(col("kk") === 123L)
    val fdPlan = fd.queryExecution.executedPlan.toString
    assert(fdPlan.contains("EqualTo(k,123)"),
      s"format-door pushdown must translate the renamed column:\n$fdPlan")
    assert(fd.count() == 1L)
    // DV + rename compose reader-side: DELETE keeps the v2 path and the
    // join stays shuffle-free over the subtracted rows
    spark.sql(s"ALTER TABLE $cat.r SET TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql(s"DELETE FROM $cat.r WHERE kk % 10 = 7")
    withConfs(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val joined = spark.table(s"$cat.l")
        .join(spark.table(s"$cat.r"), col("k") === col("kk"))
      val got2 = joined
        .agg(count(lit(1)).as("n"), sum(col("a") + col("amount")).as("s")).head
      val exp2 = spark.table("bkt_cm_l_src")
        .join(spark.table("bkt_cm_r_src").filter(col("k") % 10 =!= 7), "k")
        .agg(count(lit(1)).as("n"), sum(col("a") + col("b")).as("s")).head
      assert(got2 == exp2, s"DV+rename SPJ drifted: $got2 vs $exp2")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"DV + rename must stay zero-Exchange reader-side:\n$plan")
    }
  }
}
