package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every public-crawl
  * pretraining pipeline runs before anything else sees the text (C4 strips
  * lines with curly braces / lorem ipsum; Dolma and RefinedWeb mask emails,
  * phone numbers and IP addresses with typed placeholder tokens, which is
  * the convention followed here).
  *
  * Everything is a per-row projection over codegen'd built-ins
  * (`regexp_count` / `regexp_replace`) — ZERO shuffle, stays inside the
  * scan's WholeStageCodegen span, and scales embarrassingly: at 100 TB the
  * pass is scan-bound, which is the best possible posture for a full-corpus
  * rewrite. No UDF anywhere.
  *
  * Pattern dialect: the patterns below restrict themselves to the common
  * subset of java.util.regex (Spark) and RE2 (DuckDB oracle) — character
  * classes, bounded repetition, ASCII `\b` word boundaries; no
  * backreferences, no lookaround — so the oracle can run the IDENTICAL
  * pattern strings and the gate compares the full rewritten text row-level.
  *
  * Redaction order is part of the contract (documented, mirrored in the
  * oracle): emails first, then IPv4, then phones. The order matters in
  * principle (a replacement that inserted digits could create a phone
  * match) and pinning it keeps the composed rewrite deterministic; the
  * placeholder tokens themselves contain no digits or `@`, so no
  * replacement can cascade into a new match.
  */
object Pii {

  /** RFC-ish email: local part @ dotted domain with an alpha TLD. */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NANP-style dashed phone number (555-123-4567). */
  val PhonePattern: String = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** Dotted-quad IPv4 (syntactic — octet range not enforced, matching the
    * common crawl-scrubbing recipes which over-redact rather than parse).
    */
  val Ipv4Pattern: String = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken    = "<IP>"
  val PhoneToken = "<PHONE>"

  /** Per-class match counts for `text` (null text → null counts, like every
    * per-row text stat in this engine). Long-typed for oracle portability.
    */
  def counts(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailPattern)).cast("long"),
    "n_ipv4"   -> regexp_count(text, lit(Ipv4Pattern)).cast("long"),
    "n_phones" -> regexp_count(text, lit(PhonePattern)).cast("long"))

  /** The rewritten text: all three classes replaced by their placeholder
    * tokens, in the documented order. `regexp_replace` replaces every
    * occurrence (the oracle's DuckDB twin needs the explicit 'g' flag).
    */
  def redact(text: Column): Column = {
    val e  = regexp_replace(text, EmailPattern, EmailToken)
    val ip = regexp_replace(e, Ipv4Pattern, IpToken)
    regexp_replace(ip, PhonePattern, PhoneToken)
  }

  /** Detection + redaction in one projection: input columns plus the three
    * counts and the redacted text. One pass, no shuffle.
    */
  def scrub(df: DataFrame, textCol: String): DataFrame = {
    val withCounts = counts(col(textCol)).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    withCounts.withColumn("redacted", redact(col(textCol)))
  }
}
