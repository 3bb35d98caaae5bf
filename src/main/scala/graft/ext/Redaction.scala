package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection/redaction and URL analysis for training-data curation
  * (driver-mandated LLM-pipeline extension; no reference counterpart —
  * designed Spark-first per SURVEY.md §7 "ext/").
  *
  * Every operator is a pure per-row column projection over
  * `org.apache.spark.sql.functions` regex expressions — no UDFs, no
  * shuffle — so at 100 TB the whole pass is a single map stage over the
  * parquet scan with predicate/column pushdown intact, and it stays
  * inside whole-stage codegen.
  *
  * Pattern dialect note: every regex here is written in the common
  * subset of Java regex (Spark) and RE2 (the DuckDB oracle) — character
  * classes, bounded repetition, `\b`/`\d` — no backreferences or
  * lookaround, so both engines match identically and the oracle can
  * replay the semantics verbatim.
  */
object Redaction {

  /** Email addresses: local part `@` domain `.` tld. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic — octet range not enforced, the usual
    * scrubbing trade-off: over-redact rather than leak). */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** NANP-style dashed phone numbers (555-867-5309). */
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

  /** `https?://` URL; group 1 is the host/domain. */
  val UrlRe = "https?://([A-Za-z0-9.-]+)"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /** Replace every email / IPv4 / phone occurrence with a typed tag.
    * Email runs first so its dotted domain can't be half-eaten by the
    * IPv4 pass; the tags themselves match none of the patterns, so the
    * operator is idempotent. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  /** All URL host/domains mentioned in `text` (possibly with duplicates —
    * one element per occurrence), for domain-frequency curation filters. */
  def urlDomains(text: Column): Column =
    regexp_extract_all(text, lit(UrlRe), lit(1))
}
