package graft

import graft.io.Tables
import graft.plans.{AnnRewrite, AnnTopKMarker}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.PlanBridge
import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions=graft.GraftExtensions` — the declarative
  * deployment path for the whole engine surface (optimizer rule +
  * native functions), proven on a REAL session built from the config,
  * not by calling the imperative registrars.
  */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import TestSpark.sf001

  /** Build a brand-new SparkSession over the shared SparkContext with
    * the extensions config applied (getOrCreate only constructs — and
    * only applies extensions — when no active/default session exists).
    * `spark.sql.extensions` is STATIC: session construction reads it
    * from the SparkContext conf, exactly where `spark-submit --conf`
    * puts it — so that is where the test sets it.
    */
  private def withExtensionSession[A](f: SparkSession => A): A = {
    val prior = spark
    // SparkEnv.get.conf IS the context's live SparkConf (the context
    // clones the user conf once and hands that instance to SparkEnv)
    val scConf = org.apache.spark.SparkEnv.get.conf
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    scConf.set("spark.sql.extensions", "graft.GraftExtensions")
    try {
      val s2 = SparkSession.builder().getOrCreate()
      assert(s2 ne prior, "getOrCreate returned the prior session — extensions not applied")
      f(s2)
    } finally {
      // never stop s2 — it shares the suite-wide SparkContext
      scConf.remove("spark.sql.extensions")
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("config-built session has cosine_sim and topk_agg without any register() call") {
    withExtensionSession { s2 =>
      val cos = s2.sql(
        "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c").head().getDouble(0)
      assert(cos == 1.0)
      // float inputs get the widening cast from the injected builder
      val tk = s2.sql(
        """SELECT topk_agg(s, i, 2) AS tk
          |FROM VALUES (1.0d, 1L), (3.0d, 2L), (2.0d, 3L) AS t(s, i)""".stripMargin)
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(tk.map(r => (r.getDouble(0), r.getLong(1))) == Seq((3.0, 2L), (2.0, 3L)))
    }
  }

  test("config-built session rewrites AnnTopKMarker without AnnRewrite.install") {
    withExtensionSession { s2 =>
      // the injected rule must be in the session's optimizer
      assert(s2.sessionState.optimizer.batches.exists(_.rules.exists(_ eq AnnRewrite)),
        "AnnRewrite missing from the optimizer of the extensions-built session")
      // plant the marker BY HAND (annTopK would call install() and mask
      // the extensions path); the injected rule alone must expand it
      val corpus = Tables.embeddings(s2, sf001)
      val queries = Tables.embeddings(s2, sf001).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val template = graft.ops.Similarity.bruteForceTopK(corpus, queries, 5)
      val out = template.schema.map(f =>
        AttributeReference(f.name, f.dataType, f.nullable)())
      val declared = PlanBridge.ofRows(s2, AnnTopKMarker(
        corpus.queryExecution.analyzed, queries.queryExecution.analyzed, 5, out.toSeq))
      assert(declared.queryExecution.optimizedPlan
        .collect { case m: AnnTopKMarker => m }.isEmpty,
        "marker survived optimization — injected rule did not fire")
      assert(declared.orderBy("query_id", "rnk").collect().toSeq ==
        template.orderBy("query_id", "rnk").collect().toSeq)
    }
  }

  test("engine text/similarity functions serve SQL == Column API (round-14)") {
    import spark.implicits._
    val docs = Seq(
      ("a", "mail me at bob@example.com or 10.0.0.1 <b>now</b>"),
      ("b", "cards 1234-5678-9012-3456 and plain text"),
      ("c", "the quick brown fox jumps over the lazy dog")
    ).toDF("id", "text")
    docs.createOrReplaceTempView("fn_docs")
    val viaSql = spark.sql(
      """SELECT id, graft_scrub(text) AS s, graft_email_count(text) AS e,
        |       graft_ip_count(text) AS i, graft_card_count(text) AS c,
        |       graft_strip_html(text) AS h, graft_simhash(text) AS sh,
        |       graft_minhash(text, 3, 16) AS mh
        |FROM fn_docs ORDER BY id""".stripMargin).collect()
    val viaApi = docs.select($"id",
        graft.ops.Pii.scrub($"text").as("s"),
        graft.ops.Pii.emailCount($"text").as("e"),
        graft.ops.Pii.ipCount($"text").as("i"),
        graft.ops.Pii.cardCount($"text").as("c"),
        graft.ops.TextAnalysis.stripHtml($"text").as("h"),
        graft.ops.Dedup.simhashBits($"text").as("sh"),
        graft.ops.Dedup.minhashSignature($"text", 3, 16).as("mh"))
      .orderBy("id").collect()
    assert(viaSql.map(_.toString).sameElements(viaApi.map(_.toString)))
    assert(viaSql.head.getString(1).contains("<EMAIL>") &&
      viaSql.head.getString(1).contains("<IP>"))
    // pairwise estimators compose in SQL too
    val sim = spark.sql(
      """SELECT graft_minhash_sim(graft_minhash(a.text, 3, 64),
        |                         graft_minhash(b.text, 3, 64)) AS est
        |FROM fn_docs a JOIN fn_docs b ON a.id = 'a' AND b.id = 'a'
        |LIMIT 1""".stripMargin).collect().head.getDouble(0)
    assert(sim == 1.0, s"self-similarity must be 1.0, got $sim")
    // quality / language-id / token-count scalars agree with the
    // DataFrame builders they share expressions with
    val docs2 = Seq(("d1", "the quick brown fox and the lazy dog", "en"),
      ("d2", "der schnelle braune fuchs und der hund", "de"),
      ("d3", "", "en")).toDF("doc_id", "text", "lang")
    docs2.createOrReplaceTempView("fn_docs2")
    val sqlQ = spark.sql(
      """SELECT doc_id, graft_quality(text) AS q, graft_langid(text) AS l,
        |       graft_token_count(text) AS n
        |FROM fn_docs2 ORDER BY doc_id""".stripMargin).collect()
    val apiQ = graft.ops.TextAnalysis.qualityScore(docs2)
      .select("doc_id", "quality").orderBy("doc_id").collect()
    val apiL = graft.ops.TextAnalysis.languageId(docs2)
      .select("doc_id", "predicted_lang").orderBy("doc_id").collect()
    sqlQ.zip(apiQ.zip(apiL)).foreach { case (s0, (q, l)) =>
      assert(s0.getDouble(1) == q.getDouble(1), s"quality ${s0.getString(0)}")
      assert(s0.getString(2) == l.getString(1), s"langid ${s0.getString(0)}")
    }
    assert(sqlQ.map(_.getString(2)).toSeq == Seq("en", "de", "und"))

    // non-literal minhash params refused loudly
    val e = intercept[Exception](spark.sql(
      "SELECT graft_minhash(text, length(text), 16) FROM fn_docs").collect())
    assert(e.getMessage.contains("integer literal"), e.getMessage)
  }
}
