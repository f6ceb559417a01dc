package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2B B63 +
  * north-star mandate): tokenization/counting, quality scoring,
  * heuristic language ID, and content fingerprinting.
  *
  * Everything is built from codegen'd built-ins over the `documents`
  * table; per-doc work is embarrassingly parallel (no shuffle except the
  * final aggregations), which is the right shape for a 100 TB corpus.
  */
object TextAnalysis {

  val stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Marker-token sets for the heuristic language identifier. Real
    * pipelines would use character n-gram profiles; the scoring and
    * argmax plumbing here is the scale-relevant part.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "de" -> Seq("der", "und", "die", "ist"),
    "es" -> Seq("el", "la", "que", "es"),
    "fr" -> Seq("le", "la", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了"))

  /** Whitespace tokenization that is robust to real corpus text: split
    * on RUNS of any whitespace (tabs, newlines, multi-space) and drop
    * the empty fragments a leading/trailing run produces. A plain
    * `split(c, " ")` counts "a\nb" as one token and "a  b" as three —
    * systematically wrong signals on anything but single-spaced
    * fixtures. Empty/blank text tokenizes to [] (not [""]).
    */
  private[ops] def toks(c: Column): Column =
    array_remove(split(c, "\\s+"), "")
    // array_remove, not filter(length>0): value-identical (split never
    // yields nulls, so the empties are exactly the removable elements)
    // but codegen'd — the HOF filter interprets its lambda per token

  /** Whitespace token count as a scalar — the SQL-function spelling. */
  def tokenCount(text: Column): Column = size(toks(text))

  /** The composite quality score as a SCALAR over any text column —
    * exactly the expression [[qualityScore]] lands in its `quality`
    * column (one definition, two doors). Empty/blank text scores 0.0,
    * never null (a null would slip `quality < t` curation gates).
    */
  def quality(text: Column): Column = {
    val t = toks(text)
    val nTokens = size(t)
    val punct = regexp_count(text, lit("[^a-z0-9 ]")).cast("double")
    val stopHits = size(filter(t, w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    round(when(nTokens === 0, lit(0.0)).otherwise(
      least(nTokens.cast("double") / 100.0, lit(1.0)) * 0.5
        + (lit(1.0) - least(punct / length(text), lit(1.0))) * 0.3
        + least(stopHits.cast("double") / nTokens * 5.0, lit(1.0)) * 0.2),
      6)
  }

  /** Heuristic language ID as a SCALAR — the same marker-intersection
    * argmax (with the same precedence tie-break) [[languageId]] lands
    * in `predicted_lang`, with the per-language scores inlined instead
    * of temp columns (ExtensionsSpec pins the two doors equal).
    */
  def langId(text: Column): Column = {
    val dt = array_distinct(toks(text))
    val scores: Map[String, Column] = langMarkers.map { case (l, markers) =>
      l -> size(array_intersect(dt, array(markers.map(lit): _*)))
    }.toMap
    val best = greatest(langMarkers.map { case (l, _) => scores(l) }: _*)
    langMarkers.reverse.foldLeft(lit("und")) { case (elseCol, (l, _)) =>
      when(best > 0 && scores(l) === best, lit(l)).otherwise(elseCol)
    }
  }

  /** Whitespace + BPE-ish token counting and shape stats per document. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("lang"),
      size(toks(col("text"))).as("ws_tokens"),
      expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')").cast("int").as("bpe_tokens"),
      length(col("text")).as("n_chars_measured"))

  /** Composite quality score: token count, punctuation ratio, stopword
    * ratio, mean token length — the usual cheap pre-filter signals.
    *
    * Empty/blank documents score 0.0 (worst), NOT null: a null quality
    * would slip through `quality < threshold` curation filters, letting
    * exactly the junkiest inputs survive the gate.
    */
  def qualityScore(docs: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val nTokens = size(t)
    val punct = expr("regexp_count(text, '[^a-z0-9 ]')").cast("double")
    val stopHits = size(filter(t, w => w.isin(stopwords.map(_.asInstanceOf[Any]): _*)))
    val punctRatio = when(length(col("text")) === 0, lit(0.0))
      .otherwise(punct / length(col("text")))
    docs.select(col("doc_id"), col("lang"),
      nTokens.as("n_tokens"),
      round(punctRatio, 6).as("punct_ratio"),
      round(when(nTokens === 0, lit(0.0))
        .otherwise(stopHits.cast("double") / nTokens), 6).as("stop_ratio"),
      round(when(nTokens === 0, lit(0.0))
        .otherwise(length(col("text")).cast("double") / nTokens), 4).as("avg_token_len"),
      quality(col("text")).as("quality"))
  }

  /** Heuristic language ID: score = |tokens ∩ markers(lang)|, predict the
    * argmax with a fixed precedence tie-break, 'und' when all zero.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val distinctToks = array_distinct(toks(col("text")))
    val scored = langMarkers.foldLeft(docs.select(col("doc_id"), col("lang"), distinctToks.as("dt"))) {
      case (df, (l, markers)) =>
        df.withColumn(s"s_$l",
          size(array_intersect(col("dt"), array(markers.map(lit): _*))))
    }
    val scores = langMarkers.map { case (l, _) => col(s"s_$l") }
    val best = greatest(scores: _*)
    // declared order = tie-break precedence (en beats de on equal score)
    val predOrdered = langMarkers.reverse.foldLeft(lit("und")) {
      case (elseCol, (l, _)) =>
        when(best > 0 && col(s"s_$l") === best, lit(l)).otherwise(elseCol)
    }
    scored.select((Seq(col("doc_id"), col("lang"), predOrdered.as("predicted_lang")) ++
      langMarkers.map { case (l, _) => col(s"s_$l") }): _*)
  }

  /** HTML/markup stripping — the C4-style extraction cleanup a crawl
    * corpus runs before any text analysis: drop `<script>`/`<style>`
    * blocks wholesale (their text is code, not prose), remove every
    * remaining tag, decode the six ubiquitous character entities
    * (`&amp; &lt; &gt; &quot; &#39; &nbsp;`), and collapse the
    * whitespace the removed markup leaves behind. Pure codegen'd `regexp_replace` chain — no
    * UDF, no parser, engine-portable (every step reproduces in DuckDB's
    * `regexp_replace(…, 'g')` — RE2, so no backreferences anywhere in
    * the patterns), which also states the honest contract: this is
    * corpus CLEANUP, not an HTML5 parser (malformed nesting degrades to
    * extra whitespace, never to an error).
    */
  def stripHtml(c: Column): Column = {
    val noScript = regexp_replace(c,
      "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    // &amp; decodes LAST (the standard order): '&amp;lt;' is a page
    // DISPLAYING the literal text '&lt;' and must strip to exactly
    // that — decoding &amp; first would double-decode it to '<'
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (acc, (e, r)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(e), r) }
    // explicit whitespace class, NOT \s: Java's \s includes U+000B,
    // RE2's does not — the one place the two engines' shorthand classes
    // disagree, so the oracle would silently diverge on a vertical tab
    trim(regexp_replace(ent, "[ \\t\\n\\x0B\\f\\r]+", " "))
  }

  /** Regex scrubbing pass (PII-shaped): redact email-like tokens, long
    * digit runs, and hex identifiers — the cheap pre-training scrub.
    * Pure regexp_replace chain: codegen'd, shuffle-free, oracle-portable.
    */
  def redact(docs: DataFrame): DataFrame =
    // order matters: hex ids must be scrubbed BEFORE digit runs, or a
    // 6+-digit prefix inside a hex id gets eaten by <NUM> and the
    // remainder falls under the {16,} threshold; (?i) because PII scrubs
    // see raw-case input even in a lowercase corpus
    docs.withColumn("text_redacted",
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"),
            "(?i)[a-z0-9._%+-]+@[a-z0-9.-]+", "<EMAIL>"),
          "(?i)\\b[0-9a-f]{16,}\\b", "<HEX>"),
        "[0-9]{6,}", "<NUM>"))

  /** Content digest fingerprint (md5) — the exact-dedup key. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), md5(col("text")).as("digest"),
      substring(md5(col("text")), 1, 8).as("digest8"),
      length(col("text")).as("n_chars_measured"))

  /** Winnowing-style rolling fingerprint: xxhash64 over k-gram shingles,
    * then the minimum within each sliding window of w hashes — the
    * document-similarity sketch used by MOSS-style dedup. Set-valued; the
    * fingerprint count is the stable scalar summary.
    */
  def rollingFingerprint(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val hashes = transform(Dedup.shingles(col("text"), k), s => xxhash64(s))
    val windows = when(size(hashes) < w, array(array_min(hashes)))
      .otherwise(transform(sequence(lit(1), size(hashes) - (w - 1)),
        i => array_min(slice(hashes, i, lit(w)))))
    docs.select(col("doc_id"),
      array_distinct(windows).as("fingerprints"),
      size(array_distinct(windows)).as("n_fingerprints"))
  }
}
