package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand cases for PII detection/redaction (the q136 oracle gates the
  * corpus-scale aggregate; these pin the per-string semantics). */
class PiiFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def scrub(text: String): (Long, Long, Long, String) = {
    val r = Seq(text).toDF("text").select(
      PiiFunctions.piiCounts(col("text")).as("c"),
      PiiFunctions.redact(col("text")).as("r"))
      .select(col("c.n_email"), col("c.n_ip"), col("c.n_phone"), col("r"))
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
  }

  test("detects and redacts each category") {
    assert(scrub("mail a.b+c@ex-1.org now") ==
      ((1L, 0L, 0L, "mail [EMAIL] now")))
    assert(scrub("host 192.168.0.1 up") == ((0L, 1L, 0L, "host [IP] up")))
    assert(scrub("call 555-123-4567.") == ((0L, 0L, 1L, "call [PHONE].")))
    assert(scrub("plain text only") == ((0L, 0L, 0L, "plain text only")))
  }

  test("mixed text counts every category and redacts in order") {
    val (e, i, p, r) =
      scrub("a@b.co b@c.org at 10.0.0.1 or 555.123.4567")
    assert((e, i, p) == ((2L, 1L, 1L)))
    assert(r == "[EMAIL] [EMAIL] at [IP] or [PHONE]")
  }

  test("email domains are never re-matched as IPs") {
    // the dotted domain must be swallowed by the email redaction first;
    // a digits-only domain would otherwise look dotted-quad-ish
    val (e, i, _, r) = scrub("x@1.2.3.44 rest")
    assert(e == 0L) // TLD must be alphabetic: not an email at all
    assert(i == 1L && r == "x@[IP] rest")
  }

  test("phone shape is exactly 3-3-4 with - or . separators") {
    assert(scrub("555-12-4567")._3 == 0L)
    assert(scrub("1555-123-4567")._3 == 0L) // \b blocks the 4-digit run
    assert(scrub("555-123-45678")._3 == 0L)
    assert(scrub("555.123-4567")._3 == 1L)
  }

  test("null text yields zero counts") {
    val r = Seq[Option[String]](None).toDF("text")
      .select(PiiFunctions.piiCounts(col("text")).as("c"))
      .select(col("c.n_email")).collect().head
    assert(r.getLong(0) == 0L)
  }
}
