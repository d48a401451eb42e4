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
  * phone-redacted text, IBAN shapes on the SSN-redacted text, and
  * Luhn-valid card numbers last. This makes each count equal the number
  * of replacements its stage performs — an E.164-looking email local
  * part (`+1234567@relay.example.org`) is counted once, as an email,
  * never again as a phone (fixture doc 2009 pins it), and an IBAN whose
  * tail is 16 digits is an IBAN, never also a card (doc 2021).
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
  * The CARD stage is the one stage that is NOT a bare regex: a
  * 13–19-digit run is a card only if it passes the Luhn mod-10 check —
  * exact integer arithmetic over the digit string, expressed as builtin
  * HOF column ops on the Spark side and replayed verbatim by the DuckDB
  * oracle (same fold, same digit weights). Candidates are `\b`-bounded
  * bare runs of 13–19 digits or the 4-4-4-4 grouped form with `-`/space
  * separators; replacement is `\b`-anchored per distinct valid
  * candidate, so a valid number embedded inside a LONGER (>19) digit
  * run is neither counted nor touched (doc 2020 pins it), and count ==
  * replacements holds for this stage too. Luhn-INVALID runs survive
  * untouched (doc 2015) — that precision is the point of carrying the
  * checksum instead of a width regex. IBAN matching is shape-only
  * (2 letters, 2 digits, 11–30 alphanumerics, uppercase, unspaced), the
  * same precision-over-recall policy as phones; the mod-97 digit check
  * would be expressible the same way the Luhn fold is, and is left out
  * deliberately — shape false-positives are rarer than spaced-IBAN
  * false-negatives either way.
  *
  * Everything here is a per-row scalar chain — one scan, NO shuffle at
  * any corpus scale, and the same frame runs unchanged as an
  * append-mode Structured Streaming ingest scrub (StreamingSpec pins
  * batch == streaming on the fixture edge docs). The regex stages ride
  * whole-stage codegen; the Luhn fold is a HOF chain (CodegenFallback
  * by Spark's design for lambda functions), but its per-row work is
  * bounded by the CANDIDATE count — on the overwhelming card-free
  * majority of rows the filter/fold see an empty array and the stage
  * costs one codegen'd regexp scan.
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

  /** `\b`-anchored IBAN shape: country code, 2 check digits, 11–30
    * alphanumerics (15–34 total — the published length envelope),
    * uppercase and unspaced only (doc 2019 pins the case and length
    * edges).
    */
  val IbanPattern = "\\b[A-Z]{2}[0-9]{2}[A-Z0-9]{11,30}\\b"

  /** Card CANDIDATES (validity is decided by the Luhn fold, not the
    * pattern): a `\b`-bounded bare run of 13–19 digits, or the 4-4-4-4
    * grouped form with `-` or space separators (mixed separators
    * accepted — RE2 has no backreferences to demand consistency, and
    * the oracle must run the identical pattern). A >=20-digit run never
    * matches (the trailing `\b` cannot fall inside a digit run), so
    * long numeric IDs are structurally exempt (doc 2017).
    */
  val CcCandidatePattern =
    "\\b(?:[0-9]{13,19}|[0-9]{4}[- ][0-9]{4}[- ][0-9]{4}[- ][0-9]{4})\\b"

  /** Replacement tokens: no digits, no `@`, no regex metacharacters in
    * either the pattern or replacement position of either engine.
    */
  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"
  val PhoneToken = "<PHONE>"
  val SsnToken = "<SSN>"
  val IbanToken = "<IBAN>"
  val CcToken = "<CC>"

  /** (pattern, token) REGEX stages in the fixed scan/redact order; the
    * Luhn card stage follows them and lives in [[ccValid]]/[[redact]]
    * (it is conditional on the checksum, so it cannot be a bare
    * pattern/token pair).
    */
  val Stages: Seq[(String, String)] = Seq(
    EmailPattern -> EmailToken, Ipv4Pattern -> IpToken,
    PhonePattern -> PhoneToken, SsnPattern -> SsnToken,
    IbanPattern -> IbanToken)

  /** Whole-match occurrence count of one pattern. */
  def matchCount(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0))).cast("long")

  /** Luhn mod-10 validity of one candidate (separators stripped first):
    * from the RIGHT, double every second digit, subtract 9 when the
    * double exceeds 9, valid iff the sum is divisible by 10. Pure
    * builtin HOFs — the DuckDB oracle replays the identical fold.
    */
  def luhnValid(cand: Column): Column = {
    val dg = regexp_replace(cand, "[^0-9]", "")
    val n = length(dg)
    val vals = transform(sequence(lit(1), n), i => {
      val d = ascii(substr(dg, n - i + lit(1), lit(1))) - lit(48)
      when(i % 2 === 0, when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    aggregate(vals, lit(0), (acc, x) => acc + x) % 10 === 0
  }

  /** The Luhn-valid card matches of `c`, one array entry per
    * `\b`-bounded occurrence (duplicates preserved so
    * `size == replacements`).
    */
  def ccValid(c: Column): Column =
    filter(regexp_extract_all(c, lit(CcCandidatePattern), lit(0)), luhnValid(_))

  /** Replace every `\b`-bounded occurrence of each distinct valid
    * candidate. The `\b` anchors keep an embedded (non-bounded)
    * occurrence inside a longer digit run untouched — mirroring the
    * extraction — and candidates are digits/`-`/space only, so the
    * assembled pattern contains no metacharacters in either engine.
    */
  private def ccRedact(c: Column): Column =
    aggregate(array_distinct(ccValid(c)), c, (acc, cand) =>
      regexp_replace(acc, concat(lit("\\b"), cand, lit("\\b")), lit(CcToken)))

  /** Text with every stage applied in order: the five regex stages,
    * then the Luhn card stage. The SQL `pii_redact` registration cannot
    * wrap this Column directly (a Bridge-wrapped Column node stays
    * opaque to the analyzer inside a FunctionRegistry builder), so it
    * parses [[redactSqlText]] instead — built from the SAME Stages seq
    * and constants — and SqlSurfaceSpec pins the two renderings equal
    * over the ENTIRE fixture, so they cannot drift silently.
    */
  def redact(text: Column): Column =
    ccRedact(Stages.foldLeft(text) { case (c, (p, t)) => regexp_replace(c, p, t) })

  /** A pattern/literal quoted for a Spark-SQL string literal (default
    * mode: backslash is the escape character).
    */
  private def sqlQ(s: String): String = s.replace("\\", "\\\\").replace("'", "\\'")

  /** The Luhn validity test as Spark-SQL text over the expression text
    * `cand` — the same fold [[luhnValid]] builds with the Column DSL.
    */
  private def luhnSqlText(cand: String): String = {
    val dg = s"regexp_replace($cand, '[^0-9]', '')"
    def digit = s"ascii(substr($dg, length($dg) - i + 1, 1)) - 48"
    s"""(aggregate(transform(sequence(1, length($dg)), i ->
       |  case when i % 2 = 0
       |       then case when ($digit) * 2 > 9 then ($digit) * 2 - 9
       |                 else ($digit) * 2 end
       |       else $digit end),
       |  0, (acc, x) -> acc + x) % 10) = 0""".stripMargin
  }

  /** The FULL redaction chain as parseable Spark-SQL text over the
    * input expression text — the FunctionRegistry's form of [[redact]],
    * generated from the same Stages seq, patterns, and tokens. The
    * staged base is inlined twice (extraction input and fold seed): a
    * SQL expression has no intermediate bindings, and the surface
    * scalar's convenience contract tolerates the duplicate regex work.
    */
  def redactSqlText(input: String): String = {
    val base = Stages.foldLeft(input) { case (acc, (p, t)) =>
      s"regexp_replace($acc, '${sqlQ(p)}', '$t')"
    }
    s"""aggregate(
       |  array_distinct(filter(regexp_extract_all($base, '${sqlQ(CcCandidatePattern)}', 0),
       |    c -> ${luhnSqlText("c")})),
       |  $base,
       |  (acc, c) -> regexp_replace(acc, concat('\\\\b', c, '\\\\b'), '$CcToken'),
       |  acc -> acc)""".stripMargin
  }

  /** The full scrub frame over an `(id, text)` relation: per-stage
    * counts (each on the previous stage's output, so count ==
    * replacements), the redacted text, totals, and the residual
    * re-scan over the redacted text (0 by construction, emitted so the
    * oracle replays the claim). ONE definition shared by the batch
    * q195/q196 rows, the corpus-scale q53 row, the q200/q204 manifest
    * composition, and the streaming ingest-scrub twin — every column is
    * a stateless per-row scalar.
    */
  // STAGED intermediates (the gopherGateFrame __gg_* discipline): each
  // progressively-redacted text is a real projection column referenced
  // TWICE (the next stage's input and its own count scan), which is
  // exactly what keeps CollapseProject from re-inlining the regex
  // chain into every consumer. This matters doubly since the card
  // stage: the Luhn HOFs are CodegenFallback, and interpreted
  // consumers don't share codegen's common-subexpression elimination —
  // without staging, each of the three ccValid sites would recompute
  // the full five-stage regex chain per row (measured ~1.5x on q53 at
  // sf0.1).
  private def stagedPii(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("__pii_ne", regexp_replace(col(textCol), EmailPattern, EmailToken))
    .withColumn("__pii_ni", regexp_replace(col("__pii_ne"), Ipv4Pattern, IpToken))
    .withColumn("__pii_np", regexp_replace(col("__pii_ni"), PhonePattern, PhoneToken))
    .withColumn("__pii_ns", regexp_replace(col("__pii_np"), SsnPattern, SsnToken))
    .withColumn("__pii_nb", regexp_replace(col("__pii_ns"), IbanPattern, IbanToken))
    .withColumn("__pii_cc", ccValid(col("__pii_nb")))

  /** APPEND `has_pii` to the frame, keeping every existing column — the
    * manifest-composition shape: the gate stats and the PII bit come
    * off ONE scan in one projection pass instead of two full text
    * chains joined back on the id (the q200 plan had two documents
    * scans + a broadcast join carrying nothing but this bit). Counts
    * and redaction stay [[piiFrame]]'s job; the staged chain is shared.
    */
  def withHasPii(df: DataFrame, textCol: String): DataFrame =
    stagedPii(df, textCol)
      .withColumn("has_pii",
        ((matchCount(col(textCol), EmailPattern) +
          matchCount(col("__pii_ne"), Ipv4Pattern) +
          matchCount(col("__pii_ni"), PhonePattern) +
          matchCount(col("__pii_np"), SsnPattern) +
          matchCount(col("__pii_ns"), IbanPattern) +
          size(col("__pii_cc")).cast("long")) > 0).cast("long"))
      .drop("__pii_ne", "__pii_ni", "__pii_np", "__pii_ns", "__pii_nb",
        "__pii_cc")

  def piiFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val staged = stagedPii(df, textCol)
    staged.select(
        col(idCol),
        matchCount(col(textCol), EmailPattern).as("email_count"),
        matchCount(col("__pii_ne"), Ipv4Pattern).as("ip_count"),
        matchCount(col("__pii_ni"), PhonePattern).as("phone_count"),
        matchCount(col("__pii_np"), SsnPattern).as("ssn_count"),
        matchCount(col("__pii_ns"), IbanPattern).as("iban_count"),
        size(col("__pii_cc")).cast("long").as("cc_count"),
        aggregate(array_distinct(col("__pii_cc")), col("__pii_nb"), (acc, cand) =>
          regexp_replace(acc, concat(lit("\\b"), cand, lit("\\b")), lit(CcToken)))
          .as("redacted"))
      .withColumn("pii_total",
        col("email_count") + col("ip_count") + col("phone_count") +
          col("ssn_count") + col("iban_count") + col("cc_count"))
      .withColumn("has_pii", (col("pii_total") > 0).cast("long"))
      .withColumn("residual_pii",
        (Stages.map { case (p, _) => matchCount(col("redacted"), p) } :+
          size(ccValid(col("redacted"))).cast("long")).reduce(_ + _))
  }
}
