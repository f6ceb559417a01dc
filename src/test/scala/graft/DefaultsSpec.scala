package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** B190 DEFAULT column values: declared at CREATE or via ALTER COLUMN
  * SET/DROP DEFAULT, stored as original SQL in `_PROPS`, injected as
  * CURRENT_DEFAULT schema metadata so Spark's analyzer fills omitted
  * columns and the DEFAULT keyword on every INSERT door. ADD COLUMN
  * DEFAULT is refused (old rows are null-backfilled by contract).
  */
class DefaultsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): String = {
    seq += 1
    val cat = s"gdef$seq"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("graft_defaults").toString)
    cat
  }

  test("CREATE-time defaults fill omitted columns and the DEFAULT keyword") {
    val cat = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, status STRING DEFAULT 'new', " +
      "score INT DEFAULT 10 + 32) USING parquet")
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (1)")
    spark.sql(s"INSERT INTO $cat.t VALUES (2, 'done', DEFAULT)")
    spark.sql(s"INSERT INTO $cat.t (k, score) VALUES (3, 7)")
    val got = spark.sql(s"SELECT * FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
    assert(got == Seq((1L, "new", 42), (2L, "done", 42), (3L, "new", 7)))
  }

  test("ALTER COLUMN SET DEFAULT affects future inserts only; DROP DEFAULT reverts to NULL") {
    val cat = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (1)")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v SET DEFAULT 'filled'")
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (2)")
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v DROP DEFAULT")
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (3)")
    val got = spark.sql(s"SELECT k, v FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSeq
    assert(got == Seq((1L, None), (2L, Some("filled")), (3L, None)),
      s"pre-SET rows stay NULL, post-DROP rows revert: $got")
    // DESCRIBE surfaces the stored default while it exists
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v SET DEFAULT 'x'")
    val desc = spark.sql(s"DESCRIBE TABLE $cat.t").collect().mkString("\n")
    assert(spark.table(s"$cat.t").schema("v").metadata.contains("CURRENT_DEFAULT"),
      s"schema must carry the default metadata:\n$desc")
    // snapshot doors never resurrect footer-echoed defaults: the insert
    // at v2 wrote 'filled' metadata into its file, but the pinned read's
    // schema follows the _PROPS truth of the READ door (stripped)
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN v DROP DEFAULT")
    val snap = spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 2")
    assert(!snap.schema("v").metadata.contains("CURRENT_DEFAULT"),
      "a time-travel schema must not echo a dropped default from footers")
    assert(!spark.table(s"$cat.t").schema("v").metadata.contains("CURRENT_DEFAULT"))
  }

  test("bad defaults fail loudly: non-constant, unresolvable, ADD COLUMN DEFAULT") {
    val cat = mkCat()
    // CREATE with a column-referencing default: no table left behind
    val e1 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.bad (k BIGINT, v BIGINT DEFAULT k + 1) USING parquet"))
    assert(!spark.sql(s"SHOW TABLES IN $cat").collect()
      .exists(_.getString(1) == "bad"), s"CREATE must not orphan: $e1")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING parquet")
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ALTER COLUMN v SET DEFAULT nonexistent_col"))
    // a bad ADD COLUMN DEFAULT fails loudly with neither column nor
    // default left behind (round-15: the valid form is supported)
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD COLUMNS (w STRING DEFAULT k + 1)"))
    assert(spark.table(s"$cat.t").columns.toSeq == Seq("k", "v"))
    // the failed ALTERs left no default behind
    spark.sql(s"INSERT INTO $cat.t (k) VALUES (1)")
    assert(spark.sql(s"SELECT v FROM $cat.t").head.isNullAt(0))
  }

  test("ADD COLUMN DEFAULT (round-15): pre-ADD rows read the ADD-time constant") {
    val cat = mkCat()
    val root = spark.conf.get(s"spark.sql.catalog.$cat.root")
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING) USING parquet")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"ALTER TABLE $cat.t ADD COLUMNS (score INT DEFAULT 10 + 32)")
    // pre-ADD rows read the existence default, not NULL
    val got = spark.sql(s"SELECT k, score FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSeq
    assert(got == Seq((1L, 42), (2L, 42)),
      s"pre-ADD rows must read the folded ADD-time default: $got")
    // post-ADD inserts fill CURRENT; explicit NULL stays NULL
    spark.sql(s"INSERT INTO $cat.t (k, v) VALUES (3, 'c')")
    spark.sql(s"INSERT INTO $cat.t VALUES (4, 'd', NULL)")
    spark.sql(s"INSERT INTO $cat.t VALUES (5, 'e', 7)")
    val all = spark.sql(s"SELECT k, score FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    assert(all == Seq((1L, Some(42)), (2L, Some(42)), (3L, Some(42)),
      (4L, None), (5L, Some(7))), s"got $all")
    // a later DROP DEFAULT changes future inserts only — the existence
    // default is immutable (the pre-ADD rows' content was fixed at ADD)
    spark.sql(s"ALTER TABLE $cat.t ALTER COLUMN score DROP DEFAULT")
    spark.sql(s"INSERT INTO $cat.t (k, v) VALUES (6, 'f')")
    val after = spark.sql(s"SELECT k, score FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    assert(after.take(2) == Seq((1L, Some(42)), (2L, Some(42))),
      s"pre-ADD rows keep the existence default after DROP DEFAULT: $after")
    assert(after.last == ((6L, None)), s"post-DROP inserts are NULL: $after")
    // time travel below the ADD serves each version's own schema
    assert(spark.sql(s"SELECT * FROM $cat.t VERSION AS OF 1").columns.toSeq ==
      Seq("k", "v"), "a pre-ADD version must not carry the column")
    // the format door agrees with the catalog door
    val viaFormat = spark.read.format("graft").load(s"$root/t")
    assert(viaFormat.filter("k = 1").select("score").head.getInt(0) == 42,
      "the path-based door must serve the existence default too")
    // compaction materializes the defaulted values and sheds the marker
    graft.ops.Sinks.compactVersioned(spark, s"$root/t")
    val live = graft.ops.Sinks.resolve(s"$root/t")
    assert(graft.ops.ColMap.added(live).isEmpty,
      "compaction must shed the added-column marker")
    val post = spark.sql(s"SELECT k, score FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getInt(1)))).toSeq
    assert(post == after, s"compaction must preserve the values: $post vs $after")
  }

  test("defaults follow schema evolution: rename re-keys, drop sheds; partitioned + CHECK compose") {
    val cat = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, status STRING DEFAULT 'new', " +
      "region STRING) USING parquet PARTITIONED BY (region) " +
      "TBLPROPERTIES ('check.pos' = 'k >= 0')")
    spark.sql(s"INSERT INTO $cat.t (k, region) VALUES (1, 'r1')")
    spark.sql(s"ALTER TABLE $cat.t RENAME COLUMN status TO state")
    spark.sql(s"INSERT INTO $cat.t (k, region) VALUES (2, 'r2')")
    val got = spark.sql(s"SELECT k, state FROM $cat.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "new"), (2L, "new")),
      s"the renamed column must keep its default: $got")
    // CHECK still gates alongside the default
    intercept[Exception](spark.sql(s"INSERT INTO $cat.t (k, region) VALUES (-5, 'r1')"))
    // DROP COLUMN sheds the default with the column
    spark.sql(s"ALTER TABLE $cat.t DROP COLUMN state")
    assert(!graft.ops.TableProps
      .load(spark.conf.get(s"spark.sql.catalog.$cat.root") + "/t")
      .keys.exists(_.startsWith("graft.default.")),
      "a dropped column must shed its stored default")
  }
}
