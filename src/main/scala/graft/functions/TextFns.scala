package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * normalization, tokenization, quality scoring, language ID,
  * fingerprinting. All built from codegen'd `org.apache.spark.sql.functions`
  * (no UDFs) so they stay inside whole-stage codegen and scale linearly —
  * every function here is a per-row scalar expression with no shuffle.
  */
object TextFns {

  /** Canonical normalization: lowercase, strip non-alphanumerics (keep
    * spaces), collapse whitespace, trim.
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** Stable document fingerprint: md5 of the normalized text. Identical
    * in any engine with md5 — used for cross-system dedup keys.
    *
    * MULTILINGUAL TRAP (q181 pins it): [[normalize]] strips every
    * non-ASCII character, so ALL pure-CJK documents normalize to "" and
    * share ONE fingerprint — a fingerprint-keyed dedup would keep the
    * first CJK document and silently drop every other one as a
    * "duplicate". Use [[fingerprintUni]] on multilingual corpora.
    */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Unicode-aware content fingerprint: md5 over the space-joined
    * [[UniTok]] token stream — same canonicalization intent as
    * [[fingerprint]] (case/punctuation/whitespace-insensitive) without
    * the ASCII cliff: CJK text keeps its characters (as unigram tokens),
    * so distinct documents get distinct keys.
    *
    * UNSEGMENTABLE fallback: a script outside every UniTok range (Thai,
    * Devanagari, …) yields ZERO tokens — hashing the empty join would
    * recreate the exact md5('') collision class this function exists to
    * kill, one script further out. Non-empty text with no tokens
    * therefore falls back to md5 of the RAW text: no canonicalization
    * for those scripts (a case/punctuation variant gets a different
    * key — the conservative failure), but never a cross-document
    * collision. Truly empty text keeps the canonical md5('').
    */
  def fingerprintUni(text: Column): Column = {
    // NULL text yields NULL (same propagation as [[fingerprint]] and the
    // q181 oracle CASE) — without the guard, concat_ws silently SKIPS a
    // null token-array argument and the otherwise-branch would emit
    // md5(''), making null-content rows dedup against empty-content rows.
    // The token stream is bound once; codegen CSE keeps it one evaluation.
    val toks = uniTokens(text)
    when(text.isNull, lit(null).cast("string"))
      .when(size(toks) === 0 && length(text) > 0, md5(text))
      .otherwise(md5(concat_ws(" ", toks)))
  }

  /** Polynomial (Rabin-Karp) rolling-hash fingerprint over the text's
    * code points: h₀ = seed; hᵢ = (hᵢ₋₁·base + cᵢ) mod m. Exact integer
    * arithmetic, so any engine reproduces it bit-for-bit (max
    * intermediate ≈ 3.1e10 ≪ 2⁶³). Unlike the md5 fingerprint this hash
    * is incremental — the primitive behind content-defined chunking.
    * Delegates to the native codegen'd `RollingHash` expression (the
    * HOF `aggregate(transform(split(...)))` formulation is interpreted
    * and allocates per character; see TextFnsSpec for the equivalence
    * cross-check). Empty text returns the seed.
    */
  def rollingFingerprint(text: Column, seed: Long = 7L, base: Long = 31L,
                         mod: Long = 1000000007L): Column =
    RollingHash(text, seed, base, mod)

  /** Interpreted HOF formulation of the same fold — kept as the
    * independent cross-check implementation for the spec (BMP-equal to
    * the native expression; split-on-empty yields one element per
    * character with no trailing empty).
    */
  private[graft] def rollingFingerprintHof(text: Column, seed: Long = 7L, base: Long = 31L,
                                           mod: Long = 1000000007L): Column =
    when(length(text) === 0, lit(seed)).otherwise(
      aggregate(
        transform(split(text, ""), c => ascii(c).cast("long")),
        lit(seed),
        (h, c) => (h * base + c) % mod))

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Unicode-aware tokens: codepoint-class segmentation (CJK unigrams,
    * accented-Latin/Greek/Cyrillic runs — see [[UniTok]]). The opt-in
    * multilingual tier for every operator that tokenizes; the default
    * ASCII split returns NOTHING on CJK text.
    */
  def uniTokens(text: Column): Column = UniTokenize(text)

  /** Unicode-aware token count (empty text → 0, unlike whitespace
    * split's singleton empty token).
    */
  def uniTokenCount(text: Column): Column = size(uniTokens(text))

  /** BPE-ish subword count: alpha runs, digit runs, and single
    * non-alphanumeric marks, counted over the lowercased text.
    */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** Language marker words (classic high-frequency stopwords). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "los", "que", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** Count of occurrences of any marker of `lang`. ASCII markers are
    * word-bounded; CJK markers are counted bare — regex \b is ASCII-based
    * (in both Java regex and RE2), so `\b的\b` can never match inside
    * Chinese text.
    */
  def langScore(text: Column, lang: String): Column =
    size(regexp_extract_all(lower(text), lit(langPattern(lang)), lit(0)))

  def langPattern(lang: String): String = {
    val markers = LangMarkers.toMap.apply(lang)
    if (lang == "zh") markers.mkString("(", "|", ")")
    else markers.mkString("\\b(", "|", ")\\b")
  }

  /** Heuristic language ID: argmax of marker scores, ties broken by the
    * fixed marker-list order (en, de, es, fr, zh).
    */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val m = greatest(scores.map(_._2): _*)
    scores.tail.foldLeft(when(scores.head._2 === m, lit(scores.head._1))) {
      case (acc, (l, s)) => acc.when(s === m, lit(l))
    }
  }

  /** English stopword ratio over whitespace tokens (quality signal).
    * Clamped to 1: regex matches are counted against whitespace tokens,
    * and a token like "the,the" yields more matches than tokens.
    */
  def stopwordRatio(text: Column): Column =
    least(lit(1.0), langScore(text, "en").cast("double") / tokenCount(text))

  /** Composite quality score in [0,1] (all three terms clamped): length
    * signal + token-count signal + stopword signal. Pure double arithmetic
    * with an explicit expression tree, reproducible bit-for-bit in any
    * IEEE engine.
    *
    * `unicode = true` counts tokens with the [[UniTok]] segmenter (the
    * ASCII default scores CJK text as one giant "token" and a length
    * signal only); the stopword term stays the English-marker ratio in
    * both modes — it is a LANGUAGE signal, clamped, and near-zero on
    * non-English text by design.
    */
  def qualityScore(text: Column, unicode: Boolean = false): Column = {
    val toks = if (unicode) uniTokenCount(text) else tokenCount(text)
    least(lit(1.0), length(text) / lit(400.0)) * lit(0.5) +
      least(lit(1.0), toks / lit(80.0)) * lit(0.3) +
      stopwordRatio(text) * lit(0.2)
  }

  /** Word n-gram shingles (space-joined), distinct not applied. Guarded for
    * texts shorter than n tokens (empty array, not Spark's descending
    * `sequence` surprise). `unicode = true` shingles over [[UniTok]]
    * tokens (CJK: character n-grams, the standard unsegmented-script
    * shingling) instead of whitespace words.
    */
  def shingles(text: Column, n: Int = 3, unicode: Boolean = false): Column = {
    val toks = if (unicode) uniTokens(text) else tokens(text)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
  }

  // PII patterns and the scrub chain live in PiiFns — the single
  // authority since the round-12 unification (q53 routes through
  // PiiFns.piiFrame; the q53-era EmailPattern/Ipv4Pattern/SsnPattern
  // trio that used to live here was a second pattern set waiting to
  // drift).

  /** HTML → text extraction, the step every web-crawl corpus runs
    * before any other curation. Regex-based and deliberately RE2-safe
    * (no backrefs — script/style close in SEPARATE passes rather than a
    * \\1 backref — no lookaround), so the DuckDB oracle replays the
    * IDENTICAL pattern strings; a full parser is not warranted for
    * boilerplate stripping and would not be cross-engine replayable.
    * Removal order (fixed, mirrored in the oracle): comments first
    * (they may CONTAIN markup), then script/style blocks with their
    * payloads, then every remaining tag; entities decode named forms
    * first and `&amp;` LAST so `&amp;lt;` correctly yields the literal
    * text `&lt;` instead of `<`; whitespace squeezes to single spaces.
    * One codegen'd scalar pass per row — no shuffle at any scale.
    */
  val HtmlCommentPattern = "(?s)<!--.*?-->"
  val HtmlScriptPattern = "(?is)<script\\b[^>]*>.*?</script\\s*>"
  val HtmlStylePattern = "(?is)<style\\b[^>]*>.*?</style\\s*>"
  val HtmlTagPattern = "(?s)<[^>]*>"
  val HtmlAnchorPattern = "(?is)<a\\b[^>]*>(.*?)</a\\s*>"
  /** Whitespace-squeeze class spelled EXPLICITLY, not `\s+`: Java's
    * `\s` includes U+000B (vertical tab) but RE2's does not, so the
    * "identical pattern string" contract would silently break on real
    * crawl HTML containing VT. The explicit class means the same set
    * in both engines (fixture doc 1206 pins it).
    */
  val HtmlSpacePattern = "[ \\t\\n\\x0B\\f\\r]+"
  /** Named-entity decode table, applied in order (`&amp;` last). */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Comment/script/style blocks (payloads included) replaced by a
    * space — the first stage of the chain, also the form anchors are
    * extracted from (a commented-out link is a dead link).
    */
  private def stripBlocks(html: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(html,
      HtmlCommentPattern, " "), HtmlScriptPattern, " "), HtmlStylePattern, " ")

  /** Remaining tags removed, entities decoded (in table order, `&amp;`
    * last), whitespace squeezed — applied to block-stripped documents
    * and to anchor bodies alike.
    */
  private def stripTagsEntities(frag: Column): Column = {
    val noTags = regexp_replace(frag, HtmlTagPattern, " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r) // entities contain no regex metacharacters
    }
    trim(regexp_replace(decoded, HtmlSpacePattern, " "))
  }

  /** The visible text of an HTML document (markup stripped, entities
    * decoded, whitespace normalized).
    */
  def htmlText(html: Column): Column = stripTagsEntities(stripBlocks(html))

  /** `<br>` break pattern for [[htmlTextLines]]: case-insensitive,
    * optional ATTRIBUTE section (`<br clear="all">` is common in real
    * crawl HTML — without it the tag falls through to
    * [[stripTagsEntities]] and two authored lines silently merge, the
    * exact structure loss [[htmlTextLines]] exists to prevent),
    * optional self-closing slash. The attribute branch requires one
    * whitespace char first so `<brew>` never matches; whitespace is
    * spelled as the explicit [[HtmlSpacePattern]] class, not `\s` (the
    * RE2-vs-Java U+000B lesson). No backrefs/lookaround — RE2-safe,
    * replayed verbatim by `HtmlOracleSql.strippedLines`.
    */
  val HtmlBrPattern = "(?i)<br([ \\t\\n\\x0B\\f\\r][^>]*)?/?>"

  /** LINE-PRESERVING HTML extraction — the variant the C4 line-cleaning
    * tier needs upstream: [[htmlText]] squeezes ALL whitespace (newlines
    * included) to single spaces, which destroys the very line structure
    * Raffel et al. 2020 §2.2's rules operate on. Here the
    * blocks-removed document is split on `<br>` breaks FIRST, each
    * segment is tag-stripped/entity-decoded/space-squeezed
    * independently, and the segments rejoin on newline — a page
    * authored as `line<br>line` round-trips into [[lineArray]]
    * coordinates exactly. The split runs on the blocks-removed form
    * (a `<br>` inside a comment or script block is dead markup, not a
    * line break). Same codegen'd one-pass shape as [[htmlText]];
    * replayed in DuckDB by `HtmlOracleSql.strippedLines`.
    */
  def htmlTextLines(html: Column): Column =
    array_join(transform(split(stripBlocks(html), HtmlBrPattern, -1),
      s => stripTagsEntities(s)), "\n")

  /** Number of anchor (`<a>`) elements outside comment/script/style. */
  def htmlLinkCount(html: Column): Column =
    size(regexp_extract_all(stripBlocks(html), lit(HtmlAnchorPattern), lit(1))).cast("long")

  /** Characters of visible text inside anchors — the numerator of link
    * density, THE structural boilerplate signal (nav bars and footers
    * are link-dense, body prose is not; the jusText/trafilatura
    * heuristic). Anchor bodies are themselves markup-stripped so nested
    * inline tags don't count as text.
    */
  def htmlLinkChars(html: Column): Column =
    coalesce(aggregate(
      transform(regexp_extract_all(stripBlocks(html), lit(HtmlAnchorPattern), lit(1)),
        a => length(stripTagsEntities(a)).cast("long")),
      lit(0L), (acc, n) => acc + n), lit(0L))

  /** Link density in exact integer permille over ALREADY-COMPUTED count
    * columns (named, the ScriptMix idiom): (link_chars*1000) div
    * text_chars, 0 for empty text — integral `div`, never float `/`,
    * so the value replays bit-for-bit in the oracle.
    */
  def htmlLinkPermille(linkCharsCol: String, textCharsCol: String): Column =
    expr(s"case when $textCharsCol > 0 then ($linkCharsCol * 1000) div $textCharsCol else 0L end")

  /** Gopher/MassiveText repetition signals (Rae et al. 2021 §A1.1),
    * line/paragraph-structural — the COMPLEMENT of the word-level
    * duplicate-word / top-bigram stats in q38. Definitional choices,
    * mirrored verbatim in the oracle: a "line" is a newline-separated
    * segment, space-trimmed (ASCII 0x20 only — both engines' default
    * TRIM; tabs and other whitespace are content), kept if non-empty; a
    * "paragraph" is a blank-line-separated block keyed WITH its
    * embedded newlines; a duplicate is an exact-match occurrence beyond
    * the first, and the duplicate-char numerator counts the characters
    * of those beyond-the-first occurrences. All fractions are exact
    * integral permille. Everything here is a per-row scalar HOF chain
    * (array_distinct/filter/aggregate over the per-doc segment array —
    * segment counts are bounded per doc), so the whole signal is one
    * codegen'd scan with NO shuffle at any corpus scale.
    */
  def lineArray(text: Column): Column =
    filter(transform(split(text, "\n", -1), x => trim(x)), x => length(x) > 0)

  /** Blank-line-separated paragraph blocks (outer spaces trimmed,
    * embedded newlines kept as part of the dedup key).
    */
  def paraArray(text: Column): Column =
    filter(transform(split(text, "\n\n", -1), p => trim(p)), p => length(p) > 0)

  /** C4 line-cleaning survivors (Raffel et al. 2020 §2.2): the
    * [[lineArray]] lines that end in a terminal punctuation mark
    * ('.', '!', '?', '"'), have at least 5 whitespace words, and do
    * not mention javascript (CONTAINS on the lowered line — the C4
    * lua-filter shape, deliberately not word-bounded; q216's fixture
    * pins the embedded-token consequence). `array_join(_, "\n")` of
    * this IS the cleaned page text; q216 audits it as md5 plus the
    * doc-level lorem/brace/3-line rules.
    */
  def c4KeptLines(text: Column): Column =
    filter(lineArray(text), l =>
      substring(l, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(l, " "), w => length(w) > 0)) >= 5 &&
        !lower(l).contains("javascript"))

  /** Occurrences beyond the first of any repeated element. */
  def dupOccurrences(arr: Column): Column =
    (size(arr) - size(array_distinct(arr))).cast("long")

  /** Characters in occurrences beyond the first: Σ over distinct
    * elements of (count − 1)·length. Quadratic only in the per-doc
    * segment count (bounded small), never in corpus size.
    */
  def dupExtraChars(arr: Column): Column =
    coalesce(aggregate(
      transform(array_distinct(arr),
        e => ((size(filter(arr, x => x === e)) - 1) * length(e)).cast("long")),
      lit(0L), (acc, n) => acc + n), lit(0L))

  /** Total characters across the segment array. */
  def arrayChars(arr: Column): Column =
    coalesce(aggregate(transform(arr, x => length(x).cast("long")),
      lit(0L), (acc, n) => acc + n), lit(0L))

  /** Lines that look like list bullets ("- ", "* ", or "•" bullets) —
    * the Gopher "fraction of lines starting with a bullet point" rule.
    */
  def bulletLines(lines: Column): Column =
    size(filter(lines, x =>
      substring(x, 1, 2).isin("- ", "* ") || substring(x, 1, 1) === "•")).cast("long")

  /** Lines ending in a literal "..." — the Gopher ellipsis rule. The
    * length guard keeps sub-3-char lines out of the suffix probe (and
    * keeps the suffix arithmetic identical across engines).
    */
  def ellipsisLines(lines: Column): Column =
    size(filter(lines, x =>
      (length(x) >= 3) && (x.substr(length(x) - 2, lit(3)) === "..."))).cast("long")

  /** The full extraction frame over a `(id, html)` relation — text,
    * anchor count, anchor chars, text chars, integral-permille link
    * density. ONE definition shared by the batch q191 row and the
    * streaming crawl-ingest twin: every column is a stateless per-row
    * scalar, so the same transform runs unchanged in append-mode
    * Structured Streaming (StreamingSpec pins batch == streaming
    * exactly on the q191 fixture edge docs).
    */
  def htmlExtract(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val h = col(htmlCol)
    df.select(col(idCol),
        htmlText(h).as("text"),
        htmlLinkCount(h).as("n_links"),
        htmlLinkChars(h).as("link_chars"))
      .withColumn("text_chars", length(col("text")).cast("long"))
      .withColumn("link_permille", htmlLinkPermille("link_chars", "text_chars"))
      .select(col(idCol), col("n_links"), col("link_chars"),
        col("text_chars"), col("link_permille"), col("text"))
  }

  /** The eight stopwords the Gopher quality gate requires (Rae et al.
    * 2021 §A1.1).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** THE GOPHER DOCUMENT-QUALITY HARD GATE (Rae et al. 2021 §A1.1) with
    * the published thresholds as one boolean decision: 50 ≤ words ≤
    * 100 000; mean word length in [3, 10] chars; symbol-to-word ratio
    * ('#' and '...') ≤ 0.1; ≥ 80% of words contain an alphabetic
    * character; ≥ 2 of the 8 required stopwords present. Words split on
    * the SAME explicit whitespace class the HTML tier pins (Java `\s`
    * vs RE2 `\s` diverge on U+000B); every ratio is exact integer
    * milli/permille arithmetic so the gate bit itself replays
    * bit-for-bit in the oracle.
    *
    * Tokenizer pin (the paper publishes thresholds, not a tokenizer —
    * this implementation pins one and the oracle replays it): words are
    * raw whitespace tokens; the stopword test lowercases them (ASCII
    * corpus-safe in both engines — sentence-initial "The" counts), but
    * attached punctuation is NOT stripped, so "with," is not a stopword
    * hit (GopherFixture doc 1011 pins both decisions).
    *
    * APPENDS the stat columns (`n_words`, `mean_word_len_milli`,
    * `symbol_permille`, `alpha_word_permille`, `stop_hits`,
    * `pass_gate`) to the input frame, keeping every existing column —
    * ONE definition shared by the fixture-pinned q194 row, the
    * corpus-scale q199 rollup, and the append-mode streaming ingest
    * twin (StreamingSpec pins batch == streaming on the gate edges). One codegen'd scalar pass (the staged
    * `__gg_*` intermediates exist so the word array is computed once
    * per row, not once per stat), no shuffle: the gate runs before any
    * shuffle-bearing curation stage at any scale.
    */
  def gopherGateFrame(df: DataFrame, textCol: String): DataFrame = {
    val words = filter(
      split(col(textCol), HtmlSpacePattern, -1), w => length(w) > 0)
    df.select(col("*"), words.as("__gg_words"))
      .select(col("*"),
        size(col("__gg_words")).cast("long").as("n_words"),
        arrayChars(col("__gg_words")).as("__gg_chars"),
        size(filter(col("__gg_words"), w => w.rlike("[a-zA-Z]")))
          .cast("long").as("__gg_alpha"),
        size(array_intersect(
          array_distinct(transform(col("__gg_words"), w => lower(w))),
          array(GopherStopwords.map(lit): _*))).cast("long").as("stop_hits"),
        (expr(s"length($textCol) - length(replace($textCol, '#', ''))") +
          expr(s"(length($textCol) - length(replace($textCol, '...', ''))) div 3"))
          .cast("long").as("__gg_symbols"))
      .select(col("*"),
        expr("case when n_words > 0 then (__gg_chars * 1000) div n_words else 0L end")
          .as("mean_word_len_milli"),
        expr("case when n_words > 0 then (__gg_symbols * 1000) div n_words else 0L end")
          .as("symbol_permille"),
        expr("case when n_words > 0 then (__gg_alpha * 1000) div n_words else 0L end")
          .as("alpha_word_permille"))
      .select(col("*"),
        expr("""cast(n_words between 50 and 100000
                and mean_word_len_milli between 3000 and 10000
                and symbol_permille <= 100
                and alpha_word_permille >= 800
                and stop_hits >= 2 as long)""").as("pass_gate"))
      .drop("__gg_words", "__gg_chars", "__gg_alpha", "__gg_symbols")
  }
}
