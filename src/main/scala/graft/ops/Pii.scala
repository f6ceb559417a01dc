package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction pass every public-web training corpus
  * runs before anything else sees the text (the Dolma/RedPajama
  * pipeline stage): detect and replace emails, IPv4 addresses, and
  * 16-digit card-shaped numbers with typed placeholder tokens, and
  * surface match counts for corpus auditing.
  *
  * Engine-portable by construction: the patterns use only syntax with
  * identical semantics in Java regex (Spark codegen'd `regexp_replace`
  * / `regexp_count`) and RE2 (the DuckDB oracle) — character classes,
  * bounded repetition, `\b`, no backreferences, no lookaround — so the
  * scrubbed text hash-matches across engines. Replacement order is
  * fixed (emails first, then IPs, then cards) and scrubbing is
  * idempotent: placeholders contain no scrubbable characters.
  *
  * Scale shape: pure per-row codegen'd string expressions — no UDF, no
  * shuffle, trivially partition-parallel at 100 TB.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val CardRe = "\\b\\d{4}[- ]\\d{4}[- ]\\d{4}[- ]\\d{4}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val CardToken = "<CARD>"

  /** The redacted text (fixed order: email, ip, card). */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, EmailToken),
        Ipv4Re, IpToken),
      CardRe, CardToken)

  /** Match counts on the ORIGINAL text (audit side). */
  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe)).cast("long")
  def ipCount(text: Column): Column = regexp_count(text, lit(Ipv4Re)).cast("long")
  def cardCount(text: Column): Column = regexp_count(text, lit(CardRe)).cast("long")
}
