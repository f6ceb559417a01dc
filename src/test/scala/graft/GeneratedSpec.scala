package graft

import java.nio.file.Files

import graft.ops.{Generated, Sinks}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Generated columns (round-16, B199): `GENERATED ALWAYS AS (expr)` —
  * spec in `_PROPS` (footers stripped), INSERT doors derive NULLs and
  * refuse mismatching explicit values row-locally, UPDATE and MERGE
  * re-derive on source assignment (direct assignment refuses), and a
  * generated PARTITION column whose expression is an invertible
  * zone-free Transforms shape prunes directories from SOURCE-column
  * predicates.
  */
class GeneratedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): (String, String) = {
    seq += 1
    val cat = s"ggen$seq"
    val root = Files.createTempDirectory("graft_generated").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    (cat, root)
  }

  test("INSERT derives NULLs, accepts matching explicit values, refuses mismatches") {
    val (cat, root) = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, code STRING, " +
      "pfx STRING GENERATED ALWAYS AS (substring(code, 1, 2))) USING parquet")
    // the spec lives in _PROPS, not footers
    assert(Generated.specs(s"$root/t") ==
      Seq(Generated.Spec("pfx", "substring(code, 1, 2)")))
    // omitted column (by-name) and explicit NULL both derive
    spark.sql(s"INSERT INTO $cat.t (k, code) VALUES (1, 'ABCD')")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 'XYZW', NULL)")
    // an explicit value that MATCHES the recompute is accepted
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 'KLMN', 'KL')")
    val got = spark.table(s"$cat.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(2))).toSeq
    assert(got == Seq((1L, "AB"), (2L, "XY"), (3L, "KL")), got.toString)
    // a mismatching explicit value fails row-locally, loudly
    val e = intercept[Exception](
      spark.sql(s"INSERT INTO $cat.t VALUES (4, 'QRST', 'ZZ')"))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("does not match the recompute")),
      msgs(e).mkString(" | "))
    assert(spark.table(s"$cat.t").count() == 3, "a refused row must not land")
    // the catalog surface carries the expression (injected from _PROPS
    // through the writable table's schema → connector columns)
    import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
    val tc = spark.sessionState.catalogManager.catalog(cat)
      .asInstanceOf[TableCatalog]
    val pfxCol = tc.loadTable(Identifier.of(Array.empty, "t"))
      .columns().find(_.name == "pfx").get
    assert(pfxCol.generationExpression() == "substring(code, 1, 2)",
      String.valueOf(pfxCol.generationExpression()))
    // ...but the stored footers carry no generation metadata (footer
    // hygiene: _PROPS is the only truth)
    val raw = spark.read.parquet(Sinks.resolve(s"$root/t"))
    assert(!raw.schema.fields.exists(_.metadata.contains(
      org.apache.spark.sql.catalyst.util.GeneratedColumn
        .GENERATION_EXPRESSION_METADATA_KEY)))
  }

  test("UPDATE re-derives on source assignment (both routes); direct SET, MERGE, RENAME/DROP refuse") {
    val (cat, root) = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, code STRING, note STRING, " +
      "pfx STRING GENERATED ALWAYS AS (substring(code, 1, 2))) USING parquet")
    spark.sql(s"INSERT INTO $cat.t (k, code, note) VALUES (1, 'ABCD', 'n'), " +
      "(2, 'EFGH', 'm')")
    val e1 = intercept[Exception](
      spark.sql(s"UPDATE $cat.t SET pfx = 'ZZ' WHERE k = 1"))
    assert(e1.getMessage.contains("GENERATED ALWAYS"), e1.getMessage)
    // a SOURCE assignment re-derives in the same pass — copy-on-write
    // route first; unmatched rows keep their values
    spark.sql(s"UPDATE $cat.t SET code = 'WXYZ' WHERE k = 1")
    val afterCow = spark.table(s"$cat.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
    assert(afterCow == Seq((1L, "WXYZ", "WX"), (2L, "EFGH", "EF")), afterCow)
    // the change feed's post-image re-derives too
    // the change feed's post-state row carries the re-derived value too
    // (this table serves a reconstructed insert/delete diff)
    val feedAll = spark.sql(s"SELECT * FROM table_changes('$root/t', 1, 2)")
      .collect()
    val post = feedAll.filter(r =>
      Set("insert", "update_postimage")(r.getAs[String]("_change_type")) &&
        r.getAs[String]("code") == "WXYZ")
    assert(post.nonEmpty && post.head.getAs[String]("pfx") == "WX",
      s"feed post-state must re-derive: ${feedAll.mkString("; ")}")
    // merge-on-read route: same derivation inside the vector rewrite
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql(s"UPDATE $cat.t SET code = concat(code, 'Q'), note = 'mor' " +
      "WHERE k = 2")
    val afterMor = spark.table(s"$cat.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSeq
    assert(afterMor == Seq((1L, "WXYZ", "WX"), (2L, "EFGHQ", "EF")), afterMor)
    // unrelated columns update without touching the derivation
    spark.sql(s"UPDATE $cat.t SET note = 'updated' WHERE k = 1")
    assert(spark.table(s"$cat.t").filter(col("k") === 1).head.getString(2)
      == "updated")
    // MERGE no longer refuses the table (derivation lifted — see the
    // dedicated MERGE test); a DIRECT generated assignment still does
    val e3 = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.t t USING (SELECT 1 AS mk) s ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET pfx = 'ZZ'""".stripMargin))
    assert(e3.getMessage.contains("GENERATED ALWAYS"), e3.getMessage)
    val e4 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN code TO code2"))
    assert(e4.getMessage.contains("derives from it"), e4.getMessage)
    val e5 = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN pfx TO pfx2"))
    assert(e5.getMessage.contains("GENERATED ALWAYS"), e5.getMessage)
    // a generated column referencing another generated column fails CREATE
    val e6 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad (a STRING, " +
        "b STRING GENERATED ALWAYS AS (substring(a, 1, 2)), " +
        "c STRING GENERATED ALWAYS AS (substring(b, 1, 1))) USING parquet"))
    assert(e6.getMessage.toLowerCase.contains("generated"), e6.getMessage)
  }

  test("MERGE derives: update actions substitute sources, insert actions derive and reconcile (both routes)") {
    val (cat, root) = mkCat()
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, code STRING, " +
      "pfx STRING GENERATED ALWAYS AS (substring(code, 1, 2))) USING parquet")
    spark.sql(s"INSERT INTO $cat.t (k, code) VALUES (1, 'ABCD'), (2, 'EFGH')")
    // copy-on-write route: the matched UPDATE assigns the source → pfx
    // re-derives from the ASSIGNED expression; the unmatched INSERT
    // omits pfx → derives from the action's values
    spark.sql(
      s"""MERGE INTO $cat.t t USING (
         |  SELECT 1 AS mk, 'MNOP' AS mcode UNION ALL SELECT 3, 'QRST') s
         |ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET code = s.mcode
         |WHEN NOT MATCHED THEN INSERT (k, code) VALUES (s.mk, s.mcode)""".stripMargin)
    val afterCow = spark.table(s"$cat.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(afterCow == Seq((1L, "MNOP", "MN"), (2L, "EFGH", "EF"),
      (3L, "QRST", "QR")), afterCow.toString)
    // the merge's change images carry derived values (post-state rows,
    // whether served from a stored feed or a reconstructed diff)
    val feed = spark.sql(s"SELECT * FROM table_changes('$root/t', 1, 2)")
      .collect().filter(r => Set("insert", "update_postimage")(
        r.getAs[String]("_change_type")) &&
        Set("MNOP", "QRST")(r.getAs[String]("code")))
    assert(feed.nonEmpty)
    feed.foreach(r => assert(
      r.getAs[String]("pfx") == r.getAs[String]("code").take(2),
      s"feed post-state must derive: $r"))
    // insert-only MERGE (the linked-append fast path) reconciles an
    // explicit value: matching lands, mismatching refuses row-locally
    spark.sql(s"MERGE INTO $cat.t t USING (SELECT 4 AS mk, 'UVWX' AS mcode) s " +
      "ON t.k = s.mk " +
      "WHEN NOT MATCHED THEN INSERT (k, code, pfx) VALUES (s.mk, s.mcode, 'UV')")
    assert(spark.table(s"$cat.t").filter(col("k") === 4).head.getString(2) == "UV")
    val bad = intercept[Exception](spark.sql(
      s"MERGE INTO $cat.t t USING (SELECT 5 AS mk, 'YYYY' AS mcode) s " +
        "ON t.k = s.mk " +
        "WHEN NOT MATCHED THEN INSERT (k, code, pfx) VALUES (s.mk, s.mcode, 'ZZ')"))
    assert(msgs(bad).exists(_.contains("does not match the recompute")),
      msgs(bad).mkString(" | "))
    assert(spark.table(s"$cat.t").filter(col("k") === 5).count() == 0)
    // merge-on-read route: the same derivation inside the vector rewrite
    spark.sql(s"ALTER TABLE $cat.t SET TBLPROPERTIES ('graft.dml.mode' = 'mor')")
    spark.sql(
      s"""MERGE INTO $cat.t t USING (
         |  SELECT 2 AS mk, 'IJKL' AS mcode UNION ALL SELECT 6, 'GHIJ') s
         |ON t.k = s.mk
         |WHEN MATCHED THEN UPDATE SET code = s.mcode
         |WHEN NOT MATCHED THEN INSERT (k, code) VALUES (s.mk, s.mcode)""".stripMargin)
    val afterMor = spark.table(s"$cat.t").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(afterMor == Seq((1L, "MNOP", "MN"), (2L, "IJKL", "IJ"),
      (3L, "QRST", "QR"), (4L, "UVWX", "UV"), (6L, "GHIJ", "GH")),
      afterMor.toString)
    // WHEN NOT MATCHED BY SOURCE updates re-derive too (the non-COW
    // full-table path)
    spark.sql(s"MERGE INTO $cat.t t USING (SELECT 1 AS mk) s ON t.k = s.mk " +
      "WHEN NOT MATCHED BY SOURCE AND t.k = 3 " +
      "THEN UPDATE SET code = concat('Z', t.code)")
    val k3 = spark.table(s"$cat.t").filter(col("k") === 3).head
    assert((k3.getString(1), k3.getString(2)) == ("ZQRST", "ZQ"))
  }

  test("generated PARTITION column: source predicates prune directories (invertible shapes)") {
    val (cat, root) = mkCat()
    import spark.implicits._
    // string prefix → Truncate shape
    spark.sql(s"CREATE TABLE $cat.p (k BIGINT, code STRING, " +
      "pfx STRING GENERATED ALWAYS AS (substring(code, 1, 1))) USING parquet " +
      "PARTITIONED BY (pfx)")
    (0L until 400L).map(i => (i, f"${('A' + (i % 4).toInt).toChar}%c${i}%03d"))
      .toDF("k", "code").createOrReplaceTempView("gen_p_src")
    spark.sql(s"INSERT INTO $cat.p SELECT k, code, NULL FROM gen_p_src")
    // the grid stores derived values
    assert(graft.io.Fs.listDir(java.nio.file.Paths.get(Sinks.resolve(s"$root/p")))
      .exists(_.getFileName.toString.startsWith("pfx=")))
    val q = spark.table(s"$cat.p").filter($"code" === "B001").select("k", "pfx")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("pfx"), plan.take(2000))
    assert(plan.contains("PartitionFilters: [") &&
      !plan.contains("PartitionFilters: []"),
      s"source predicate must imply a directory predicate:\n${plan.take(3000)}")
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "B")))
    // date month-floor → Month shape, range predicate prunes
    spark.sql(s"CREATE TABLE $cat.d (k BIGINT, d DATE, " +
      "m DATE GENERATED ALWAYS AS (trunc(d, 'month'))) USING parquet " +
      "PARTITIONED BY (m)")
    (0 until 120).map(i => (i.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(i * 3))))
      .toDF("k", "d").createOrReplaceTempView("gen_d_src")
    spark.sql(s"INSERT INTO $cat.d SELECT k, d, NULL FROM gen_d_src")
    val qd = spark.table(s"$cat.d")
      .filter($"d" >= java.sql.Date.valueOf("2024-03-05") &&
        $"d" < java.sql.Date.valueOf("2024-04-02"))
    val dplan = qd.queryExecution.executedPlan.toString
    assert(dplan.contains("PartitionFilters: [") &&
      !dplan.contains("PartitionFilters: []"),
      s"date range must imply month-floor directory bounds:\n${dplan.take(3000)}")
    val expected = (0 until 120).map(i =>
      java.time.LocalDate.of(2024, 1, 1).plusDays(i * 3))
      .count(d => !d.isBefore(java.time.LocalDate.of(2024, 3, 5)) &&
        d.isBefore(java.time.LocalDate.of(2024, 4, 2)))
    assert(qd.count() == expected)
  }
}
