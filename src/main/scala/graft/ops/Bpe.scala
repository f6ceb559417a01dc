package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding TRAINING and encoding over a corpus (round-14;
  * extends B150's pair counting into the full tokenizer-training loop —
  * Sennrich et al. 2016, the word-level formulation every production
  * trainer uses).
  *
  * Scale shape: the corpus is scanned ONCE to build the word-frequency
  * vocabulary; every training iteration then runs on the VOCAB table
  * (distinct words × weights — tens of millions of rows at 100 TB, not
  * the corpus), and each iteration is one adjacent-pair aggregation plus
  * a 1-row top-pair collect plus a string-replace merge application. No
  * iteration ever re-reads the corpus. Encoding reuses the same idea:
  * distinct words encode once, the corpus joins back by word.
  *
  * Determinism (what makes training ORACLE-PROVABLE, not just
  * plausible): symbol sequences are SPACE-JOINED STRINGS, and applying a
  * merge is exactly `replace(' '||sym||' ', ' a b ', ' ab ')` — the
  * left-to-right non-overlapping semantics of `replace` in Spark and
  * DuckDB are identical, so both engines produce byte-identical merge
  * sequences; the top pair per iteration is pinned by (count DESC, pair
  * ASC). q_bpe_train hash-matches an unrolled DuckDB recomputation of
  * the whole loop.
  */
object Bpe {

  /** End-of-word marker. The vocabulary is restricted to `^[a-z]{2,}$`
    * words, so the marker characters can never collide with a symbol.
    */
  val EndOfWord = "</w>"

  /** The word-frequency vocabulary of `textCol`, symbolized: one row
    * per distinct qualifying word with its corpus count and its initial
    * symbol sequence ("l o w </w>"). ONE corpus pass.
    */
  def vocabulary(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]{2,}$"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("sym",
        concat(trim(regexp_replace(col("w"), "(.)", "$1 ")),
          lit(" " + EndOfWord)))

  /** Adjacent symbol pairs of `sym` ("a b", weighted by `n`). */
  private def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("n"), split(col("sym"), " ").as("a"))
      .filter(size(col("a")) >= 2)
      .select(col("n"), explode(expr(
        "transform(sequence(0, size(a) - 2), i -> concat(a[i], ' ', a[i + 1]))"))
        .as("pair"))
      .groupBy("pair").agg(sum("n").as("cnt"))

  /** Apply one merge ("a b" -> "ab") to every symbol sequence — the
    * space-padded string replace whose semantics both engines share.
    */
  private def applyMerge(sym: Column, pair: String): Column =
    trim(call_function("replace",
      concat(lit(" "), sym, lit(" ")),
      lit(s" $pair "), lit(" " + pair.replace(" ", "") + " ")))

  /** Train `nMerges` BPE merges. Returns (merge table, final vocab):
    * the merge table is (rank, pair, merged, weight) — metadata-scale,
    * the artifact a tokenizer ships; the final vocab is (w, n, sym)
    * with every learned merge applied — the word-level encoder input.
    *
    * Iteration cost: one Spark job per merge (the pair aggregation +
    * 1-row top collect). Learned merges ride on the PERSISTED base
    * vocab as a lazy chain of codegen'd string-replace expressions —
    * applying a merge is pure per-row compute (microseconds over the
    * vocab table), so materializing a new vocab per iteration bought
    * nothing and cost a second job + persist/unpersist churn per round
    * (measured: it doubled the per-iteration wall time at bench scale).
    * The chain re-pins every [[RepinEvery]] merges so expression depth
    * (and thus plan/codegen size) stays bounded for production-scale
    * merge counts, keeping lineage O(RepinEvery) at any nMerges.
    */
  private val RepinEvery = 24

  def train(docs: DataFrame, textCol: String, nMerges: Int)
      : (DataFrame, DataFrame) = {
    require(nMerges >= 1, s"nMerges must be positive, got $nMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    var pinned = vocabulary(docs, textCol).persist()
    pinned.count() // ONE corpus pass, materialized before the loop
    var pending = List.empty[String] // merges since last pin, newest first
    def cur: DataFrame = pinned.withColumn("sym",
      pending.reverse.foldLeft(col("sym"))((c, m) => applyMerge(c, m)))
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var done = false
    var r = 1
    while (r <= nMerges && !done) {
      val top = pairCounts(cur)
        .orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) done = true // every word fully merged
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        merges += ((r, pair, pair.replace(" ", ""), cnt))
        pending ::= pair
        if (pending.length >= RepinEvery) {
          val next = cur.persist()
          next.count()
          pinned.unpersist()
          pinned = next
          pending = Nil
        }
      }
      r += 1
    }
    (merges.toSeq.toDF("rank", "pair", "merged", "weight"), cur)
  }

  /** Encode a corpus under a learned merge table: distinct words encode
    * once (the merge chain replayed in rank order — vocab-scale work),
    * then every document joins its words back by key and reassembles in
    * position order. Output: (idCol, tokens ARRAY<STRING>). Words
    * outside the trained character class pass through as single opaque
    * tokens (the unknown-word convention).
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[String]): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("pos", "w")))
    val distinctW = words.select("w").distinct()
      .withColumn("sym",
        when(col("w").rlike("^[a-z]{2,}$"),
          merges.foldLeft(
            concat(trim(regexp_replace(col("w"), "(.)", "$1 ")),
              lit(" " + EndOfWord)): Column)((c, m) => applyMerge(c, m)))
          .otherwise(col("w")))
    words.join(distinctW, "w")
      .groupBy(idCol)
      .agg(array_sort(collect_list(struct(col("pos"), col("sym")))).as("ps"))
      .select(col(idCol),
        flatten(expr("transform(ps, x -> split(x.sym, ' '))")).as("tokens"))
  }
}
