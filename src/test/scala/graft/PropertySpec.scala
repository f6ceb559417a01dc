package graft

import graft.functions.WeightedMean
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Algebraic laws (SURVEY §5.2 item 3) over seeded random inputs. These
  * are the partial/final soundness guarantees Spark's distributed
  * execution relies on: reduce-then-merge must equal reduce-of-whole for
  * ANY split, or results would depend on partitioning.
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)
  private def randomPairs(n: Int): List[(Double, Double)] =
    List.fill(n)((rnd.nextDouble() * 2e6 - 1e6, rnd.nextDouble() * 1e3 + 0.001))

  private def close(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("WeightedMean: merge of split buffers == reduce of whole (partial-agg soundness)") {
    for (_ <- 1 to 200) {
      val xs = randomPairs(1 + rnd.nextInt(50))
      val k = rnd.nextInt(xs.length)
      val (l, r) = xs.splitAt(k)
      val whole = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val split = WeightedMean.merge(
        l.foldLeft(WeightedMean.zero)(WeightedMean.reduce),
        r.foldLeft(WeightedMean.zero)(WeightedMean.reduce))
      assert(close(whole._1, split._1) && close(whole._2, split._2),
        s"split at $k diverged: $whole vs $split")
    }
  }

  test("WeightedMean: finish equals direct weighted mean") {
    for (_ <- 1 to 200) {
      val xs = randomPairs(1 + rnd.nextInt(50))
      val buf = xs.foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val direct = xs.map { case (x, w) => x * w }.sum / xs.map(_._2).sum
      assert(close(WeightedMean.finish(buf), direct))
    }
  }

  test("WeightedMean: merge is commutative and zero is identity") {
    for (_ <- 1 to 200) {
      val a = randomPairs(1 + rnd.nextInt(20)).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      val b = randomPairs(1 + rnd.nextInt(20)).foldLeft(WeightedMean.zero)(WeightedMean.reduce)
      assert(WeightedMean.merge(a, b) == WeightedMean.merge(b, a))
      assert(WeightedMean.merge(a, WeightedMean.zero) == a)
    }
  }

  test("WeightedMean: empty buffer finishes to NaN, not a crash") {
    assert(WeightedMean.finish(WeightedMean.zero).isNaN)
  }

  // ---- Spark-evaluated laws for the vector/dedup primitives ----

  private lazy val spark = TestSpark.spark

  test("Vec.cosine: symmetry, self-similarity 1, range [-1,1] on random vectors") {
    import graft.functions.Vec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = (1 to 50).map { i =>
      (i.toLong, Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    }.toDF("id", "v")
    val a = vecs.select($"id".as("ida"), $"v".as("va"))
    val b = vecs.select($"id".as("idb"), $"v".as("vb"))
    val pairs = a.crossJoin(b)
      .select($"ida", $"idb",
        Vec.cosine6($"va", $"vb").as("ab"),
        Vec.cosine6($"vb", $"va").as("ba"))
      .collect()
    pairs.foreach { r =>
      val (ida, idb, ab, ba) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(ab == ba, s"cosine not symmetric for ($ida,$idb)")
      assert(ab >= -1.0000001 && ab <= 1.0000001, s"cosine out of range: $ab")
      if (ida == idb) assert(math.abs(ab - 1.0) < 1e-6, s"self-cosine $ab != 1")
    }
  }

  test("CosineSim ≡ HOF cosine bit-for-bit on adversarial random vectors") {
    import graft.functions.Vec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // magnitudes spanning denormal-adjacent to huge, zero vectors, and
    // exact negatives — the inputs where a fused loop could diverge from
    // the three-pass HOF form if the fold order differed at all
    val vecs = (1 to 200).map { i =>
      val dim = 1 + rnd.nextInt(32)
      val scale = math.pow(10, rnd.nextInt(20) - 10)
      val v =
        if (i % 17 == 0) Seq.fill(dim)(0.0)
        else Seq.fill(dim)((rnd.nextDouble() * 2 - 1) * scale)
      (i.toLong, v)
    }.toDF("id", "v")
    val a = vecs.select($"id".as("ida"), $"v".as("va"))
    val b = vecs.select($"id".as("idb"), $"v".as("vb"))
    val diverging = a.crossJoin(b)
      .select(Vec.cosine($"va", $"vb").as("hof"),
        Vec.cosineNative($"va", $"vb").as("native"))
      .filter(!($"hof" <=> $"native"))
      .count()
    assert(diverging == 0, s"$diverging of 40000 random pairs diverge")
  }

  test("CDF law: upsert(v0, changesAsDelta(changesBetween(v0,v1))) == v1 on random mutations") {
    import graft.ops.{Merge, Sinks}
    import spark.implicits._
    for (round <- 1 to 5) {
      val root = java.nio.file.Files.createTempDirectory(s"graft_cdf_prop$round")
        .toString + "/t"
      // v0: random keyed table; v1: random per-key keep/mutate + new keys
      val n = 20 + rnd.nextInt(60)
      val v0rows = (1 to n).map(i => (i.toLong, rnd.nextInt(5), rnd.nextDouble()))
      val v1rows = v0rows.collect {
        case (k, c, v) if rnd.nextDouble() > 0.3 => // 30% deleted
          if (rnd.nextDouble() < 0.5) (k, rnd.nextInt(5), v) else (k, c, v)
      } ++ (1 to rnd.nextInt(10)).map(i => ((n + i).toLong, rnd.nextInt(5), rnd.nextDouble()))
      val v0 = v0rows.toDF("k", "c", "v")
      val v1 = v1rows.toDF("k", "c", "v")
      Sinks.publishVersioned(v0, root, None)
      Sinks.publishVersioned(v1, root, Some(0L))
      val replayed = Merge.upsert(
        Sinks.readVersion(spark, root, 0L),
        Sinks.changesAsDelta(
          Sinks.changesBetween(spark, root, 0L, 1L, Seq("k"))),
        Seq("k"))
      assert(replayed.exceptAll(Sinks.readVersion(spark, root, 1L)).count() == 0
        && Sinks.readVersion(spark, root, 1L).exceptAll(replayed).count() == 0,
        s"round $round: replica sync diverged")
      // feed size law: every v1-only key appears once (insert), every
      // v0-only key once (delete), changed keys twice (pre+post)
      val k0 = v0rows.map(_._1).toSet
      val k1 = v1rows.map(_._1).toSet
      val changedKeys = v0rows.filter(r => k1.contains(r._1)).toSet
        .map((r: (Long, Int, Double)) => r._1)
        .filter(k => v0rows.find(_._1 == k) != v1rows.find(_._1 == k))
      val expected = (k1 -- k0).size + (k0 -- k1).size + 2 * changedKeys.size
      assert(Sinks.changesBetween(spark, root, 0L, 1L, Seq("k")).count() == expected,
        s"round $round: feed size law broken")
    }
  }

  test("Dedup.jaccard: bounds, symmetry, identity on Spark-evaluated token sets") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (1 to 40).map { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("id", "text")
    val a = docs.select($"id".as("ida"), array_distinct(split($"text", " ")).as("ta"))
    val b = docs.select($"id".as("idb"), array_distinct(split($"text", " ")).as("tb"))
    val rows = a.crossJoin(b).select($"ida", $"idb",
      Dedup.jaccard($"ta", $"tb").as("jab"), Dedup.jaccard($"tb", $"ta").as("jba")).collect()
    rows.foreach { r =>
      val (ida, idb, jab, jba) = (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      assert(jab == jba, "jaccard not symmetric")
      assert(jab >= 0.0 && jab <= 1.0, s"jaccard out of bounds: $jab")
      if (ida == idb) assert(jab == 1.0, s"self-jaccard $jab != 1")
    }
  }

  test("q_histogram partitions the data: bucket counts sum to the table count") {
    val dir = TestSpark.sf001
    val hist = SparkEntry.queries("q_histogram")(spark, dir)
    val total = hist.agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(total == graft.io.Tables.orders(spark, dir).count())
  }

  test("q_stratified_sample keep rates track the md5 band widths") {
    val dir = TestSpark.sf01
    val docs = graft.io.Tables.documents(spark, dir)
    val kept = SparkEntry.queries("q_stratified_sample")(spark, dir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, n) <- totals) {
      val want = if (lang == "en") 64.0 / 256 else 128.0 / 256
      val got = kept.getOrElse(lang, 0L).toDouble / n
      // binomial noise at fixture sizes: ±4 sigma
      val tol = 4 * math.sqrt(want * (1 - want) / n)
      assert(math.abs(got - want) <= tol,
        s"$lang keep rate $got outside $want ± $tol (n=$n)")
    }
  }

  test("UTC-pinned day/hour derivation is the UTC calendar, in EVERY session zone") {
    import graft.ops.{Sinks, TableProps, Transforms}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // random instants across ±60 years plus exact day/hour boundaries
    // ±1 µs (the rounding seams a zone-dependent derivation gets wrong)
    val base = (1 to 300).map(_ =>
      (rnd.nextLong() % (60L * 365 * 86400)) * 1000000L + rnd.nextInt(1000000))
    val seams = (-3 to 3).flatMap(d => Seq(-1L, 0L, 1L).map(e =>
      d * Transforms.MicrosPerDay + e))
    val micros = (base ++ seams).distinct
    val df = micros.toDF("us").select($"us", timestamp_micros($"us").as("ts"))
    val tz0 = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "Asia/Tokyo", "America/Los_Angeles", "Pacific/Kiritimati")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val rows = Transforms.derive(df, Seq("_tp_ts__day", "_tp_ts__hour"))
          .select($"us", $"_tp_ts__day".cast("string"), $"_tp_ts__hour")
          .collect()
        rows.foreach { r =>
          val us = r.getLong(0)
          val truthDay = java.time.Instant.ofEpochSecond(
            Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000)
            .atZone(java.time.ZoneOffset.UTC).toLocalDate
          assert(r.getString(1) == truthDay.toString,
            s"day($us) under $tz derived ${r.getString(1)}, UTC truth $truthDay")
          val truthHour = Math.floorDiv(us, Transforms.MicrosPerHour)
          assert(r.getInt(2) == truthHour,
            s"hour($us) under $tz derived ${r.getInt(2)}, truth $truthHour")
        }
      }
    } finally spark.conf.set("spark.sql.session.timeZone", tz0)
  }

  test("Transforms.parse is total and inverts colName for every transform") {
    import graft.ops.Transforms
    // totality: arbitrary (printable) names never throw
    for (_ <- 1 to 2000) {
      val n = new String(Array.fill(1 + rnd.nextInt(24))(
        (32 + rnd.nextInt(95)).toChar))
      Transforms.parse(n) // must not throw, whatever the shape
      Transforms.parse("_tp_" + n)
    }
    // round-trip: parse(t.colName) == t
    val srcs = Seq("ts", "user_id", "a_b", "x__y")
    val all: Seq[Transforms.T] = srcs.flatMap(s => Seq(
      Transforms.Day(s), Transforms.Month(s), Transforms.Year(s),
      Transforms.Hour(s), Transforms.Bucket(1 + rnd.nextInt(1 << 20), s),
      Transforms.Truncate(1 + rnd.nextInt(1000), s)))
    all.foreach(t => assert(Transforms.parse(t.colName).contains(t),
      s"parse(${t.colName}) != $t"))
  }

  test("decimal bound rescaling only widens: pruning never drops a matching file") {
    import graft.ops.{Sinks, Stats}
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // one file per 100-unit band at scale 3; random decimal bounds at
    // scales 0..6 — every file holding a value inside [lo, hi] must be
    // kept whatever the bound's scale (floor/ceil rescaling law)
    val dir = java.nio.file.Files.createTempDirectory("graft_decprop") + "/t"
    (0L until 1000L).map(i => (i, BigDecimal(i) / 8))
      .toDF("k", "price")
      .select($"k", $"price".cast("decimal(12,3)").as("price"))
      .repartitionByRange(5, col("price")).sortWithinPartitions("price")
      .write.parquet(dir)
    Stats.annotate(spark, dir, Seq("price"))
    val full = spark.read.parquet(dir)
    for (_ <- 1 to 60) {
      val scale = rnd.nextInt(7)
      val a = BigDecimal(rnd.nextInt(130000), scale) - 10
      val b = a + BigDecimal(rnd.nextInt(40000), scale)
      val kept = Stats.prunedFilesBounds(spark, dir, "price",
        Some(a.bigDecimal), Some(b.bigDecimal))
      val matchRows = full.filter(col("price") >= lit(a.bigDecimal) &&
        col("price") <= lit(b.bigDecimal))
      val needed = matchRows.withColumn("f", input_file_name())
        .select("f").distinct().collect()
        .map(r => java.nio.file.Paths.get(new java.net.URI(r.getString(0))).toString)
      val keptSet = kept.toSet
      needed.foreach(f => assert(keptSet.contains(f),
        s"bound [$a,$b] (scale $scale) pruned file $f that holds matches"))
    }
  }

  test("Dedup.hamming: zero on self, symmetric, bounded by signature length") {
    import graft.ops.Dedup
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = (1 to 20).map(i =>
      (i.toLong, Seq.fill(5)(s"w${rnd.nextInt(30)}").mkString(" "))).toDF("id", "text")
    val sigs = docs.select($"id", Dedup.simhashBits($"text").as("s"))
    val a = sigs.select($"id".as("ida"), $"s".as("sa"))
    val b = sigs.select($"id".as("idb"), $"s".as("sb"))
    val rows = a.crossJoin(b).select($"ida", $"idb",
      Dedup.hamming($"sa", $"sb").as("dab"), Dedup.hamming($"sb", $"sa").as("dba")).collect()
    rows.foreach { r =>
      val (ida, idb, dab, dba) = (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))
      assert(dab == dba, "hamming not symmetric")
      assert(dab >= 0 && dab <= 64, s"hamming out of bounds: $dab")
      if (ida == idb) assert(dab == 0, s"self-hamming $dab != 0")
    }
  }
}
