package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** B191 native constraint DDL: `CREATE TABLE (…, CONSTRAINT c CHECK …)`
  * and `ALTER TABLE ADD/DROP CONSTRAINT` route through Spark's v2
  * constraint API into the SAME `check.<name>` store the TBLPROPERTIES
  * spelling uses — one store, every door, identical enforcement.
  */
class ConstraintSqlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private var seq = 0
  private def mkCat(): String = {
    seq += 1
    val cat = s"gcons$seq"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.catalog.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root",
      Files.createTempDirectory("graft_constraintsql").toString)
    cat
  }

  test("CREATE-time CONSTRAINT … CHECK gates inserts like the property spelling") {
    val cat = mkCat()
    spark.sql(s"CREATE TABLE $cat.t (k BIGINT, v STRING, " +
      "CONSTRAINT k_pos CHECK (k >= 0)) USING parquet")
    spark.sql(s"INSERT INTO $cat.t VALUES (1, 'ok')")
    intercept[Exception](spark.sql(s"INSERT INTO $cat.t VALUES (-1, 'bad')"))
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 1L)
    // one store: the property door sees the natively-declared constraint
    val props = spark.sql(s"SHOW TBLPROPERTIES $cat.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("check.k_pos").exists(_.contains("k")), props.toString)
  }

  test("ALTER ADD CONSTRAINT validates existing rows; DROP CONSTRAINT releases the gate") {
    val cat = mkCat()
    import spark.implicits._
    Seq((1L, 5), (2L, 50)).toDF("k", "score").createOrReplaceTempView("cons_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM cons_src")
    // a constraint the existing data violates must refuse and store nothing
    intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD CONSTRAINT small CHECK (score < 10)"))
    spark.sql(s"INSERT INTO $cat.t VALUES (3, 999)") // no gate stored
    spark.sql(s"ALTER TABLE $cat.t ADD CONSTRAINT cap CHECK (score <= 999)")
    intercept[Exception](spark.sql(s"INSERT INTO $cat.t VALUES (4, 1000)"))
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT cap")
    spark.sql(s"INSERT INTO $cat.t VALUES (4, 1000)") // gate released
    assert(spark.sql(s"SELECT count(*) FROM $cat.t").head.getLong(0) == 4L)
    // DROP of a missing constraint: loud without IF EXISTS, silent with
    intercept[Exception](spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT nope"))
    spark.sql(s"ALTER TABLE $cat.t DROP CONSTRAINT IF EXISTS nope")
  }

  test("non-CHECK kinds and NOT ENFORCED checks refuse loudly — nothing stored unenforced") {
    val cat = mkCat()
    import spark.implicits._
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("cons_pk_src")
    spark.sql(s"CREATE TABLE $cat.t AS SELECT * FROM cons_pk_src")
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE $cat.t ADD CONSTRAINT pk PRIMARY KEY (k)"))
    assert(e.getMessage.contains("CHECK") || e.getMessage.contains("enforce"),
      e.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"CREATE TABLE $cat.u (k BIGINT, CONSTRAINT u UNIQUE (k)) USING parquet"))
    assert(!spark.sql(s"SHOW TABLES IN $cat").collect()
      .exists(_.getString(1) == "u"), s"refused CREATE must not orphan: $e2")
  }
}
