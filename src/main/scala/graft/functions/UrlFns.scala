package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side dedup key every web corpus
  * computes before any content hashing (the same page is fetched under
  * case variants, default ports, tracking parameters, and fragments;
  * content-level dedup then wastes a full pass collapsing what the URL
  * already proves identical).
  *
  * Canonical form, applied in a FIXED order mirrored in the oracle:
  *   1. scheme lowercased;
  *   2. host (with port) lowercased — userinfo (the part before `@` in
  *      the authority) and path/query case are PRESERVED (both are
  *      case-sensitive per RFC 3986; only scheme and host are defined
  *      case-insensitive);
  *   3. default port dropped (`:80` for http, `:443` for https; other
  *      schemes' ports untouched, non-default ports kept);
  *   4. fragment dropped (never sent to the server);
  *   5. tracking parameters removed (`utm_*`, `fbclid`, `gclid` — the
  *      documented closed list; a tracking KEY inside another param's
  *      value does not match, the pattern requires parameter position);
  *   6. a dangling `?` tidied away.
  * Trailing slashes are NOT touched (`/a` vs `/a/` are distinct
  * resources in general — precision over recall, the PiiFns trade).
  *
  * Strings that don't start `scheme://` (mailto:, data:, relative
  * paths, empty) pass through VERBATIM with dropped_params = 0 — a
  * canonicalizer must never corrupt what it can't parse.
  *
  * Cross-engine contract (the PiiFns/html_text discipline): every
  * pattern is RE2-safe and shared verbatim with the DuckDB oracle;
  * `dropped_params` is counted on the SAME intermediates the removal
  * passes operate on (fragment already dropped, `&`-rule count before
  * the `?`-rule count), so the count equals replacements exactly —
  * a tracking key inside a fragment is dropped with the fragment, not
  * double-counted. All columns are per-row codegen'd scalars: one
  * scan, NO shuffle; the downstream dedup (groupBy canonical) is one
  * hash shuffle with map-side combine at any scale.
  */
object UrlFns {

  /** `scheme://` prefix; group 1 is the scheme (RFC 3986 charset). */
  val SchemePattern = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Group 1 is the authority ([userinfo@]host[:port]) — everything
    * between the `://` and the first `/`, `?`, or `#`.
    */
  val HostPattern = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"

  /** Userinfo prefix of the authority (up to the first `@`), group 1 —
    * kept verbatim while the host lowercases.
    */
  val UserinfoPattern = "^([^@]*)@"

  /** The same prefix, for removal (leaving host[:port]). */
  val UserinfoStripPattern = "^[^@]*@"

  /** Matches the scheme+authority prefix, for removal (the remainder
    * is path + query + fragment).
    */
  val PrefixPattern = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"

  /** First `#` to end of string ((?s): a crawl URL column can carry
    * stray newlines; the fragment still runs to the end).
    */
  val FragmentPattern = "(?s)#.*"

  /** The closed tracking-key list. */
  val TrackingKeys = "utm_[A-Za-z0-9_]*|fbclid|gclid"

  /** A tracking parameter in non-leading position (removed with its
    * `&`).
    */
  val AmpTrackingPattern = s"&(?:$TrackingKeys)=[^&]*"

  /** A tracking parameter in leading position (replaced by `?`, taking
    * the following `&` if present).
    *
    * Pattern-level behavior, pinned rather than papered over (fixture
    * doc 5014): the replace is global, so a literal `?utm_...=` embedded
    * MID-VALUE inside another parameter (`?b=?utm_x=2` — the second `?`
    * is data, not a query start) also matches, dropping those value
    * bytes and counting them in dropped_params. RE2 has no lookbehind to
    * anchor "the first `?` only", and a split-at-first-`?` restructure
    * would buy precision on a byte sequence that is itself malformed
    * percent-encoding practice (a literal `?` in a value should be
    * `%3F`, which does NOT match — doc 5011 pins that). Cross-engine
    * behavior is identical either way, so the oracle replays exactly.
    */
  val LeadTrackingPattern = s"\\?(?:$TrackingKeys)=[^&]*&?"

  /** A dangling `?` left after all parameters were removed. */
  val TrailingQueryPattern = "\\?$"

  /** The canonicalization frame over an `(id, url)` relation:
    * `canonical`, `dropped_params` (exact replacement count), and
    * `had_fragment`. ONE definition shared by the batch q197/q198 rows
    * and any streaming ingest — every column is a stateless scalar.
    */
  def canonicalFrame(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    val url = col(urlCol)
    val scheme = lower(regexp_extract(url, SchemePattern, 1))
    val auth = regexp_extract(url, HostPattern, 1)
    val userinfo = regexp_extract(auth, UserinfoPattern, 1)
    val hostPort = lower(regexp_replace(auth, UserinfoStripPattern, ""))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val authority = when(auth.rlike(UserinfoPattern),
      concat(userinfo, lit("@"), host)).otherwise(host)
    val rest = regexp_replace(url, PrefixPattern, "")
    val noFrag = regexp_replace(rest, FragmentPattern, "")
    val ampCount = size(regexp_extract_all(noFrag, lit(AmpTrackingPattern), lit(0))).cast("long")
    val noAmp = regexp_replace(noFrag, AmpTrackingPattern, "")
    val leadCount = size(regexp_extract_all(noAmp, lit(LeadTrackingPattern), lit(0))).cast("long")
    val noLead = regexp_replace(noAmp, LeadTrackingPattern, "?")
    val tidy = regexp_replace(noLead, TrailingQueryPattern, "")
    val parseable = url.rlike(SchemePattern)
    df.select(
      col(idCol),
      when(parseable, concat(scheme, lit("://"), authority, tidy))
        .otherwise(url).as("canonical"),
      when(parseable, ampCount + leadCount).otherwise(lit(0L)).as("dropped_params"),
      url.rlike("#").cast("long").as("had_fragment"))
  }
}
