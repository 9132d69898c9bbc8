package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for corpus cleaning — the scrub pass every
  * training-data pipeline runs before text leaves the ingest zone.
  *
  * Everything is codegen'd `regexp_extract_all` / `regexp_replace` over
  * the text column: zero shuffles, zero UDFs, scales linearly like the
  * rest of [[TextFunctions]].
  *
  * The patterns deliberately use the RE2-safe regex subset (character
  * classes, bounded repetition, `\b` word boundaries — no lookarounds, no
  * backreferences) so the SAME pattern strings produce the same matches
  * on java.util.regex, RE2 (Go / DuckDB), and Hyperscan — a redaction
  * audit must be reproducible in whatever engine reads the corpus later.
  */
object PiiFunctions {

  /** username@host.tld — the pragmatic corpus-scrub form, not RFC 5322. */
  val emailPattern: String =
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American 3-3-4 phone shape with - or . separators. */
  val phonePattern: String = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** Dotted-quad IPv4 (no octet-range check — redaction favors recall). */
  val ipv4Pattern: String =
    "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Redaction order matters and is part of the contract: emails first
    * (their domains contain dots that the IP pattern must never see),
    * then IPs, then phones (their digit runs cannot collide with the
    * already-redacted tags). */
  val defaultRules: Seq[(String, String)] = Seq(
    emailPattern -> "[EMAIL]",
    ipv4Pattern -> "[IP]",
    phonePattern -> "[PHONE]")

  /** Match count for one pattern (0 for null text). */
  def piiCount(text: Column, pattern: String): Column =
    coalesce(size(regexp_extract_all(text, lit(pattern), lit(0))), lit(0))
      .cast("long")

  /** Counts for email/IP/phone in one projection (detection runs on the
    * ORIGINAL text; redaction below is a separate column so callers can
    * keep both). */
  def piiCounts(text: Column): Column = struct(
    piiCount(text, emailPattern).as("n_email"),
    piiCount(text, ipv4Pattern).as("n_ip"),
    piiCount(text, phonePattern).as("n_phone"))

  /** Replace every match of every rule with its tag, applying rules in
    * order ([[defaultRules]] ordering is load-bearing — see its doc). */
  def redact(text: Column,
             rules: Seq[(String, String)] = defaultRules): Column =
    rules.foldLeft(text) { case (acc, (pattern, tag)) =>
      regexp_replace(acc, pattern, tag)
    }
}
