package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PII detection + redaction for training-data scrubbing: emails,
 * IPv4 addresses, and E.164-style phone numbers replaced by typed
 * placeholder tokens, with per-type match counts for corpus audits.
 *
 * All three patterns stay inside the regex subset Java's engine and
 * RE2-family engines (DuckDB, Go) interpret identically — character
 * classes, bounded repetition, `\b`, no backreferences, no lookaround
 * — so the DuckDB gate oracle replays the exact same redaction, and
 * the operator is ONE codegen'd `regexp_replace` chain per row: a
 * narrow projection with no shuffle, the only shape that matters for
 * a scrub pass over 100 TB of text.
 */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\+\\d{7,15}"

  /** Redact in a fixed order (email first — an email's domain would
    * otherwise feed the IP pattern digit runs). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  // ip/phone counts run on the email-redacted text so the audit counts
  // agree with what redact() actually replaces (a '+12345678' inside an
  // email local part is scrubbed as part of <EMAIL>, not as a phone)
  def ipCount(text: Column): Column =
    regexp_count(regexp_replace(text, EmailRe, "<EMAIL>"), lit(Ipv4Re))
  def phoneCount(text: Column): Column =
    regexp_count(regexp_replace(text, EmailRe, "<EMAIL>"), lit(PhoneRe))
}
