package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the regex scrub stage every public-web training
  * pipeline runs before tokenization (emails, phone numbers, IP
  * addresses → stable placeholder tokens), with per-pattern audit
  * counts so the curation run can report exactly how much it touched.
  *
  * Scale shape: pure scan-side `regexp_replace`/`regexp_count` — one
  * codegen'd projection per document, zero shuffles, zero UDFs; at
  * 100 TB this runs at scan speed alongside the other per-doc
  * normalizations (q64's token scrub, q27's quality features).
  *
  * Pattern dialect: kept to the conservative common core (character
  * classes, bounded repetition, non-capturing groups, `\b`) that Java's
  * regex and RE2-family engines (DuckDB, Hyperscan-based scrubbers)
  * interpret identically, so a downstream system can re-run the same
  * patterns and get the same corpus. Replacement order matters —
  * e.g. an IPv4-looking fragment inside an email's domain must not be
  * clipped before the email pattern sees it — so [[redact]] applies
  * patterns strictly in the given sequence and documents that contract.
  */
object Redact {

  /** Local-part@domain.tld — ASCII mailbox form (the overwhelming bulk
    * of web-scraped PII; internationalized addresses tokenize apart).
    */
  val Email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4, word-bounded so version strings ("1.2.3.4000")
    * don't half-match. Octet range deliberately loose (\\d{1,3}) — a
    * scrubber prefers false positives over leaked addresses.
    */
  val Ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** International-ish phone: optional +CC, then 3 groups of digits
    * with -/./space separators, 7+ digits total — bounded enough to
    * not eat ordinary numbers, word-bounded on both sides.
    */
  val Phone = "\\b\\+?\\d{1,3}[-. ]\\d{3}[-. ]\\d{4}\\b"

  /** Replace every match of each (pattern, placeholder) IN ORDER —
    * earlier patterns see the original text, later ones the partially
    * redacted text. Null text stays null (regexp_replace semantics).
    */
  def redact(text: Column, patterns: Seq[(String, String)]): Column =
    patterns.foldLeft(text) { case (t, (pat, repl)) =>
      regexp_replace(t, pat, repl)
    }

  /** Match count of one pattern (0 for null text — count is an audit
    * metric, and a null doc has zero redactions by definition).
    */
  def matches(text: Column, pattern: String): Column =
    coalesce(regexp_count(text, lit(pattern)), lit(0))
}
