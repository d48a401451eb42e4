package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub step every public LLM corpus
  * pipeline runs before release (The Pile, RedPajama, FineWeb all ship a
  * regex pass for emails/IPs/phones). Pattern-based by design: the
  * published pipelines use exactly this class of expression, and a
  * pattern is the only form that replays bit-for-bit in the oracle.
  *
  * Cross-engine contract (the html_text discipline): every pattern is
  * RE2-safe — character classes, bounded repetition, non-capturing
  * groups, alternation, ASCII `\b` only; no backrefs, no lookaround —
  * so the DuckDB oracle runs the IDENTICAL pattern strings. `\b` is the
  * ASCII word boundary in BOTH engines (Java's default `\w` and RE2's
  * are both `[A-Za-z0-9_]`).
  *
  * Scan/redact order is FIXED and counts are taken on the progressively
  * redacted text: emails on the raw text, IPv4 on the email-redacted
  * text, phones on the IP-redacted text, SSN shapes on the
  * phone-redacted text. This makes each count equal the number of
  * replacements its stage performs — an E.164-looking email local part
  * (`+1234567@relay.example.org`) is counted once, as an email, never
  * again as a phone (fixture doc 2009 pins it).
  * Replacement tokens contain no digits or `@`, so a redaction can
  * never manufacture a new match; the residual scan over the fully
  * redacted text is 0 by construction and is emitted as an
  * oracle-replayed column rather than assumed.
  *
  * Phone policy is precision-over-recall, the standard curation trade:
  * `+`-prefixed E.164 runs (7–15 digits) and the dashed/dotted/spaced
  * NANP 3-3-4 form only. Bare digit runs are ambiguous (IDs, hashes,
  * timestamps) and are deliberately NOT matched. Known pattern-level
  * behaviors, pinned by fixture rather than papered over: octets are
  * not range-checked (`999.999.999.999` matches — the published regexes
  * do the same), and a 16+-digit E.164 run redacts its first 15 digits.
  *
  * Everything here is a per-row codegen'd scalar chain — one scan, NO
  * shuffle at any corpus scale, and the same frame runs unchanged as an
  * append-mode Structured Streaming ingest scrub (StreamingSpec pins
  * batch == streaming on the fixture edge docs).
  */
object PiiFns {

  /** Local part, `@`, dotted host, alphabetic TLD (≥2 chars). An
    * IP-literal host (`user@192.168.0.1`) deliberately does NOT match —
    * the TLD arm requires letters — and falls through to the IPv4 stage
    * (fixture doc 2008).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Four dotted octet runs, `\b`-anchored both sides: version strings
    * like `v1.2.3.4` don't match (no boundary between `v` and `1`), a
    * five-group run matches its first four (fixture docs 2004/2005).
    */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** `+`-prefixed E.164 (7–15 digits) or `\b`-anchored NANP 3-3-4 with
    * a dash/dot/space separator. Disjoint from the SSN shape by the
    * middle-group width (3 vs 2 digits), so stage order between them
    * can never flip an assignment (fixture doc 2014 pins both).
    */
  val PhonePattern = "\\+[0-9]{7,15}|\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** `\b`-anchored SSN shape (3-2-4, dashes only). */
  val SsnPattern = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Replacement tokens: no digits, no `@`, no regex metacharacters in
    * either the pattern or replacement position of either engine.
    */
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"
  val SsnToken = "<SSN>"

  /** (pattern, token) stages in the fixed scan/redact order. */
  val Stages: Seq[(String, String)] = Seq(
    EmailPattern -> EmailToken, Ipv4Pattern -> IpToken,
    PhonePattern -> PhoneToken, SsnPattern -> SsnToken)

  /** Whole-match occurrence count of one pattern. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Text with all four stages applied in order. */
  def redact(text: Column): Column =
    Stages.foldLeft(text) { case (c, (p, t)) => regexp_replace(c, p, t) }

  /** The full scrub frame over an `(id, text)` relation: per-stage
    * counts (each on the previous stage's output, so count ==
    * replacements), the redacted text, totals, and the residual
    * re-scan over the redacted text (0 by construction, emitted so the
    * oracle replays the claim). ONE definition shared by the batch
    * q195/q196 rows and the streaming ingest-scrub twin — every column
    * is a stateless per-row scalar.
    */
  def piiFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val raw = col(textCol)
    val noEmail = regexp_replace(raw, EmailPattern, EmailToken)
    val noIp = regexp_replace(noEmail, Ipv4Pattern, IpToken)
    val noPhone = regexp_replace(noIp, PhonePattern, PhoneToken)
    val redacted = regexp_replace(noPhone, SsnPattern, SsnToken)
    df.select(
        col(idCol),
        matchCount(raw, EmailPattern).as("email_count"),
        matchCount(noEmail, Ipv4Pattern).as("ip_count"),
        matchCount(noIp, PhonePattern).as("phone_count"),
        matchCount(noPhone, SsnPattern).as("ssn_count"),
        redacted.as("redacted"))
      .withColumn("pii_total",
        col("email_count") + col("ip_count") + col("phone_count") + col("ssn_count"))
      .withColumn("has_pii", (col("pii_total") > 0).cast("long"))
      .withColumn("residual_pii",
        Stages.map { case (p, _) => matchCount(col("redacted"), p) }
          .reduce(_ + _))
  }
}
