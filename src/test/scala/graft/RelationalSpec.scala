package graft

import graft.io.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape and semantic assertions for the relational surface —
  * the tests the DuckDB oracle can't express (SURVEY §5.2 items 2/5/6).
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.{sf001, sf01}

  test("driver smoke: entry() returns rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry with matching shape intent") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("B2: Tables.events normalizes ts whatever the physical layout (bare session)") {
    val e = Tables.events(spark, sf001)
    assert(e.schema("ts").dataType.typeName == "timestamp")
    assert(e.count() == 1000)
    // VALUE-level sanity, not just type: a fixture misread through the
    // wrong physical-layout branch lands every instant in 1970 (µs read
    // as ns is 1000× off). The fixture's domain is Jan 2024.
    val yrs = e.select(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(yrs.getInt(0) == 2024 && yrs.getInt(1) == 2024,
      s"events.ts misread: year range ${yrs.getInt(0)}..${yrs.getInt(1)}")
  }

  test("B19 plan shape: dim joins use BroadcastHashJoin") {
    val plan = SparkEntry.queries("q_join_broadcast")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dim join degenerated to SMJ")
  }

  test("q_partition_pruning plan: 7 of 30 date partitions survive planning") {
    val out = graft.queries.ScanOps.partitionedEventsCopy(spark, sf01)
    val scan = spark.read.parquet(out)
      .filter(col("event_date").between("2024-01-08", "2024-01-14"))
    val fs = scan.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(fs.partitionFilters.nonEmpty, "filter did not reach PartitionFilters")
    val total = fs.relation.location.listFiles(Nil, Nil).length
    val pruned = fs.relation.location.listFiles(fs.partitionFilters, Nil).length
    assert(total == 30, s"expected 30 date partitions, got $total")
    assert(pruned == 7, s"expected 7 partitions after pruning, got $pruned")
  }

  test("round-5 plan shapes: merge full-outer SMJ, dims broadcast in TPC-H sweep") {
    // q_merge_upsert: the MERGE join must be a shuffle join on the key
    // (full-outer cannot broadcast) — if this ever plans a nested loop
    // the operator is broken at scale.
    val merge = SparkEntry.queries("q_merge_upsert")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(merge.contains("SortMergeJoin") && merge.contains("FullOuter"),
      s"merge upsert lost its full-outer SMJ:\n$merge")
    // q_market_share: every dimension side broadcasts (two nation roles,
    // part, supplier, region) — no dim may degrade to a shuffle join.
    val share = SparkEntry.queries("q_market_share")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(share).size >= 5,
      s"market share lost its broadcast dims:\n$share")
  }

  test("B36 plan shape: aggregation is partial -> final HashAggregate") {
    val plan = SparkEntry.queries("q_pricing_summary")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2, s"no partial agg in:\n$plan")
  }

  test("plan shape: filter and projection push into the parquet scan") {
    val df = Tables.lineitem(spark, sf001)
      .filter(col("l_quantity") > 30)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("B43 plan shape: orderBy+limit plans as TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q_topn")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$plan")
  }

  test("B27/B63 word-count golden test against independent JVM computation") {
    import spark.implicits._
    val texts = Tables.documents(spark, sf001).select("text").as[String].collect()
    val expected: Map[String, Long] = texts.toSeq.flatMap(_.split(" "))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val got = Tables.documents(spark, sf001)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("B30 approx_count_distinct within 10% of exact") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf01)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].head()
    val approx = li.select(approx_count_distinct(col("l_partkey"))).as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.10,
      s"approx $approx vs exact $exact")
  }

  test("B42 sortWithinPartitions orders inside every partition") {
    val sorted = Tables.orders(spark, sf001)
      .repartition(4, col("o_custkey"))
      .sortWithinPartitions(col("o_totalprice"))
      .select("o_totalprice")
    val violations = sorted.rdd.mapPartitions { it =>
      val prices = it.map(_.getDouble(0)).toSeq
      Iterator.single(prices.zip(prices.drop(1)).count { case (a, b) => a > b })
    }.sum()
    assert(violations == 0)
  }

  test("B24 as-of window implementation matches naive range-join semantics") {
    val asof = SparkEntry.queries("q_asof_join")(spark, sf001)
    val e = Tables.events(spark, sf001)
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val naive = p.join(c, col("c_user") === col("p_user") && col("c_ts") <= col("p_ts"))
      .groupBy(col("p_id").as("event_id"))
      .agg(max(col("c_ts")).as("last_click_ts"))
    assert(asof.count() == naive.count())
    assert(asof.except(naive).isEmpty && naive.except(asof).isEmpty)
  }

  test("B3 JSON/CSV round-trip: schema-d read equals the parquet source") {
    val src = Tables.orders(spark, sf001)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val dir = java.nio.file.Files.createTempDirectory("b3").toString
    src.write.mode("overwrite").json(s"$dir/j")
    src.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val js = spark.read.schema(src.schema).json(s"$dir/j")
    val cs = spark.read.schema(src.schema).option("header", "true").csv(s"$dir/c")
    assert(js.exceptAll(src).isEmpty && src.exceptAll(js).isEmpty)
    assert(cs.exceptAll(src).isEmpty && src.exceptAll(cs).isEmpty)
  }

  test("B16 map functions: map/map_keys/map_values/explode") {
    import spark.implicits._
    val m = Tables.orders(spark, sf001)
      .limit(100)
      .select(col("o_orderkey"),
        map(lit("status"), col("o_orderstatus"),
          lit("priority"), col("o_orderpriority")).as("m"))
    assert(m.select(explode(map_keys(col("m")))).distinct().as[String]
      .collect().toSet == Set("status", "priority"))
    val exploded = m.select(col("o_orderkey"), explode(col("m")))
    assert(exploded.count() == 200)
    assert(exploded.filter(col("key") === "status" && col("value").isin("F", "O", "P"))
      .count() == 100)
  }

  test("na functions: fill, drop, replace over injected nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "b"), (3L, null))
      .toDF("k", "v")
    assert(df.na.drop().count() == 1)
    assert(df.na.drop(Seq("k")).count() == 2)
    val filled = df.na.fill(Map("k" -> -1L, "v" -> "missing"))
    assert(filled.filter($"k" === -1L || $"v" === "missing").count() == 2)
    val replaced = df.na.replace("v", Map("a" -> "A"))
    assert(replaced.filter($"v" === "A").count() == 1)
  }

  test("B58 explode_outer preserves rows with empty/null arrays") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("x", "y")),
      (2L, Seq.empty[String])).toDF("id", "arr")
      .union(Seq((3L, null.asInstanceOf[Seq[String]])).toDF("id", "arr"))
    assert(df.select($"id", explode($"arr")).count() == 2)       // inner drops 2,3
    val outer = df.select($"id", explode_outer($"arr").as("e"))
    assert(outer.count() == 4)
    assert(outer.filter($"e".isNull).select("id").as[Long].collect().sorted.toSeq == Seq(2L, 3L))
  }

  test("B34 first/last with ignoreNulls skip null values") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double)]((1, null), (2, 2.0), (3, 3.0), (4, null))
      .toDF("ord", "v").orderBy("ord").coalesce(1)
    val r = df.agg(
      first($"v", ignoreNulls = true).as("f"),
      last($"v", ignoreNulls = true).as("l")).head()
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 3.0)
  }

  test("operational columns: monotonically_increasing_id unique, partition id bounded") {
    import spark.implicits._
    val df = Tables.orders(spark, sf001).repartition(4)
      .select(monotonically_increasing_id().as("mid"), spark_partition_id().as("pid"))
    assert(df.select(countDistinct($"mid")).head().getLong(0) == df.count())
    assert(df.select(max($"pid")).head().getInt(0) < 4)
  }

  test("B35 WeightedMean agrees with algebraic expansion") {
    import spark.implicits._
    val li = Tables.lineitem(spark, sf001)
    val viaUdaf = li.agg(graft.functions.WeightedMean(col("l_extendedprice"), col("l_quantity")))
      .as[Double].head()
    val expanded = li.agg(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")))
      .as[Double].head()
    assert(math.abs(viaUdaf - expanded) < 1e-6 * math.abs(expanded))
  }
}
