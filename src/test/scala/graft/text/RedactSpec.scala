package graft.text

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class RedactSpec extends AnyFunSuite with SparkTestBase {

  private def redact(texts: String*): Seq[String] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"), Redact.redactPii(col("text")).as("red"))
      .orderBy(col("id"))
      .collect().map(_.getString(1)).toSeq
  }

  test("each PII type masks with its own placeholder") {
    assert(redact(
      "mail jane.doe+spam@sub.example.co.uk now",
      "ssn is 123-45-6789 ok",
      "call +1-555-123-4567 today",
      "from 192.168.0.1 came") === Seq(
      "mail <EMAIL> now",
      "ssn is <SSN> ok",
      "call <PHONE> today",
      "from <IP> came"))
  }

  test("phone shapes: country code, parens, dot/space separators") {
    assert(redact(
      "a 555-123-4567 b",
      "c (555) 123-4567 d",
      "e (555)123-4567 f",
      "g 555.123.4567 h",
      "i +1 555 123 4567 j",
      "k +44-555-123-4567 l") === Seq(
      "a <PHONE> b", "c <PHONE> d", "e <PHONE> f",
      "g <PHONE> h", "i <PHONE> j", "k <PHONE> l"))
  }

  test("all types in one string, multiple hits per type") {
    assert(redact(
      "a@b.io or c@d.org, ssn 111-22-3333, tel (555) 867-5309 / " +
        "+1-555-123-4567, hosts 10.0.0.1 and 172.16.254.3") ===
      Seq("<EMAIL> or <EMAIL>, ssn <SSN>, tel <PHONE> / <PHONE>, " +
        "hosts <IP> and <IP>"))
  }

  test("decoys survive: bare numbers, dashed dates, version strings") {
    val decoys = Seq(
      "order 123456 shipped",
      "date 2026-08-13 noted", // 4-2-2, not the SSN 3-2-4 shape
      "semver 1.2.3 not an ip", // only three octets
      "ref 1555-123 part code", // digit run glues to the 3-group: no \b
      "tel +1-555-0142 short", // the invalid 3-4 shape is NOT a phone
      "at example.com without local part")
    assert(redact(decoys: _*) === decoys)
  }

  test("phone match does not start mid-digit-run") {
    // 13 leading digits: "...1555-123-4567" — \b blocks the bare-digit
    // alternative from carving "555-123-4567" out of the longer number
    assert(redact("acct 91555-123-4567 end") === Seq("acct 91555-123-4567 end"))
  }

  test("redaction is idempotent") {
    val once = redact("a@b.io ssn 123-45-6789 +1-555-123-4567 10.0.0.1")
    assert(redact(once.head) === once)
  }

  test("counts tally per type independently of redaction order") {
    import spark.implicits._
    val df = Seq(
      (1L, "a@b.io c@d.io ssn 123-45-6789 (555) 123-4567 10.0.0.1"))
      .toDF("id", "text")
    val counts = Redact.piiCounts(col("text"))
    val row = df.select(counts.map { case (n, c) => c.as(n) }: _*).head
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3)) ===
      ((2, 1, 1, 1)))
  }
}
