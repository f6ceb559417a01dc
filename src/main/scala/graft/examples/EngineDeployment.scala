package graft.examples

import graft.io.Tables
import graft.ops.Sinks
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The declarative deployment surface, end to end — everything a user
  * configures rather than calls:
  *
  *   1. `spark.sql.extensions=graft.GraftExtensions` — optimizer rule +
  *      native functions arrive with the session (here set on the
  *      SparkConf exactly as `spark-submit --conf` would);
  *   2. `spark.sql.catalog.wh=graft.catalog.GraftCatalog` — versioned
  *      tables mounted for SQL, with time travel;
  *   3. a published table queried current / `VERSION AS OF`, its
  *      change feed read back, and `cosine_sim`/`topk_agg` used straight
  *      from SQL with no `register()` call anywhere.
  *
  * Runnable: `sbt "runMain graft.examples.EngineDeployment [sfDir]"`.
  */
object EngineDeployment {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val wh = java.nio.file.Files.createTempDirectory("graft_deploy")
    graft.streaming.StreamOps.cleanOnExit(wh)

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // the two deployment confs — this is the whole integration
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.catalog.wh", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.wh.root", wh.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // publish two versions of a table through the commit protocol
    val nation = Tables.nation(spark, sfDir)
    Sinks.publishVersioned(nation, s"$wh/nations", None)
    Sinks.publishVersioned(nation.filter(col("n_regionkey") =!= 0), s"$wh/nations", Some(0L))

    // SQL over the catalog: current vs time travel
    val cur = spark.sql("SELECT count(*) AS n FROM wh.nations").head().getLong(0)
    val v0 = spark.sql("SELECT count(*) AS n FROM wh.nations VERSION AS OF 0").head().getLong(0)
    println(s"wh.nations: current=$cur rows, VERSION AS OF 0=$v0 rows")

    // the change feed between the two commits, as SQL-visible rows
    val changes = Sinks.changesBetween(spark, s"$wh/nations", 0L, 1L, Seq("n_nationkey"))
    println("change feed v0->v1 by type: " + changes.groupBy("_change_type").count()
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", "))

    // SQL DDL/DML lands through the same commit protocol: every write is
    // a new atomic version, so the pre-INSERT state stays travelable
    spark.sql("CREATE TABLE wh.top_nations AS SELECT * FROM wh.nations WHERE n_nationkey < 5")
    spark.sql("INSERT INTO wh.top_nations VALUES (97, 'VALINOR', 9)")
    println("wh.top_nations: now=" +
      spark.sql("SELECT count(*) AS n FROM wh.top_nations").head().getLong(0) +
      " rows, pre-INSERT (VERSION AS OF 1)=" +
      spark.sql("SELECT count(*) AS n FROM wh.top_nations VERSION AS OF 1").head().getLong(0))

    // injected functions straight from SQL — no register() anywhere
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("embeddings")
    val sims = spark.sql(
      """SELECT e.vec_id, cosine_sim(e.embedding, q.embedding) AS sim
        |FROM embeddings e
        |CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |WHERE e.vec_id <> 0
        |ORDER BY sim DESC, e.vec_id LIMIT 3""".stripMargin)
    println("top-3 by injected cosine_sim:")
    sims.collect().foreach(r => println(f"  vec ${r.getLong(0)}%5d  sim=${r.getDouble(1)}%.6f"))

    spark.stop()
  }
}
