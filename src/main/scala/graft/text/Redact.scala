package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training-corpus preparation: mask emails, phone
  * numbers, IPv4 addresses and US-SSN-shaped identifiers with typed
  * placeholder tokens before a corpus ships to training — the standard
  * "scrub then tokenize" step (the C4 / Dolma pipelines run exactly this
  * family of regex scrubbers at full-corpus scale).
  *
  * Every pattern is deliberately dialect-neutral regex — character
  * classes, bounded repetition, and ASCII `\b` word boundaries only (no
  * backreferences, no lookaround) — so Java (Spark codegen'd
  * `regexp_replace`/`regexp_count`) and RE2 (the DuckDB oracle) agree
  * byte-for-byte. Redaction is a pure per-row map: at 100 TB it is
  * embarrassingly parallel, fuses into whole-stage codegen with the scan,
  * and shuffles nothing.
  *
  * Order matters and is fixed: email first (its local/domain parts may
  * embed digit runs other patterns could clip), then SSN before phone
  * (both are dash-joined digit groups; SSN's 3-2-4 shape is the more
  * specific and is NOT a phone's 3-3-4), then phone before IPv4 (a
  * dot-separated phone is masked before the dotted-quad pattern could
  * see its digits; IPv4 runs last, when emails with numeric domains are
  * already masked too). */
object Redact {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  /** NANP-shaped numbers: optional +country code, then an area code —
    * parenthesized `(555)` or bare `555` — then 3-4 digits, with `-`,
    * `.` or space separators. The leading `\b` on the bare-digit
    * alternative stops the match from starting mid-digit-run (RE2 and
    * Java agree on ASCII `\b`); the trailing `\b` keeps version-ish
    * suffixes intact. Still dialect-neutral: no lookaround, no
    * backreferences. Non-NANP international formats (e.g. +44 20 7946
    * 0958's 2-4-4 grouping) are out of scope and documented so: this is
    * a corpus scrubber for the dominant 3-3-4 shapes, not an exhaustive
    * libphonenumber. */
  val PhoneRe =
    "(\\+\\d{1,3}[-. ])?(\\(\\d{3}\\)[-. ]?|\\b\\d{3}[-. ])\\d{3}[-. ]\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b"

  /** Redaction pass in the fixed order above; idempotent (placeholders
    * contain no pattern-matchable content). */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          SsnRe, "<SSN>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Pre-redaction hit counts per PII type (audit columns: what WOULD be
    * masked). Counted independently on the raw text, so overlapping
    * matches across types (an SSN-shaped group inside a longer phone
    * string) are each type's own tally, not the redaction order's. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EmailRe)),
    "n_ssn" -> regexp_count(text, lit(SsnRe)),
    "n_phone" -> regexp_count(text, lit(PhoneRe)),
    "n_ip" -> regexp_count(text, lit(Ipv4Re)))
}
