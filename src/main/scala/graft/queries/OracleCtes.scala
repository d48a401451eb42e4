package graft.queries

import graft.functions.{PiiFns, TextFns}

/** Shared DuckDB-oracle CTE fragments — the SQL twins of the shared
  * Spark definitions (`TextFns.gopherGateFrame`, `PiiFns.piiFrame`,
  * `Dedup.jaccardPairs` + `connectedComponents`). One copy per concept:
  * when a gate threshold, a PII stage, the stopword list, or the
  * Jaccard closure changes, the Spark code and EVERY oracle that
  * replays it move together — a missed copy is impossible because
  * there is no copy. Pattern and threshold constants interpolate from
  * the same objects the Spark side reads.
  */
private[queries] object OracleCtes {

  /** Word-trigram shingle Jaccard (>= threshold) edge set plus the
    * recursive min-reach closure over `source` (a table name or
    * `read_parquet(...)`, default the documents table) — the replay of
    * `Dedup.jaccardPairs` + `connectedComponents`. Emits CTEs
    * docs/sh/sizes/inter/jp/edges/reach; embed directly after
    * `WITH RECURSIVE`.
    */
  def jaccardReach(threshold: String = "0.5",
                   source: String = "documents"): String = s"""
        docs AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM $source),
        sh AS (SELECT DISTINCT doc_id AS doc, UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
                 i -> ARRAY_TO_STRING(toks[i:i+2], ' '))) AS s FROM docs),
        sizes AS (SELECT doc, COUNT(*) AS n FROM sh GROUP BY doc),
        inter AS (SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS c
                  FROM sh a JOIN sh b ON a.s = b.s AND a.doc < b.doc GROUP BY 1, 2),
        jp AS (SELECT doc_a, doc_b FROM inter
               JOIN sizes sa ON sa.doc = inter.doc_a
               JOIN sizes sb ON sb.doc = inter.doc_b
               WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold),
        edges AS (SELECT doc_a AS src, doc_b AS dst FROM jp
                  UNION ALL SELECT doc_b, doc_a FROM jp),
        reach(doc, r) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.doc)"""

  /** Docs whose component representative is another doc (the dedup
    * victims); append after [[jaccardReach]].
    */
  val victims: String = """
        victims AS (SELECT doc AS doc_id FROM reach GROUP BY doc HAVING MIN(r) != doc)"""

  /** The Gopher gate staged replay of `TextFns.gopherGateFrame` over
    * `source` (a table name or `read_parquet(...)`), carrying `carry`
    * columns through. Emits ggbase/ggcounted/ggscored/gate; `gate` has
    * columns carry ++ (n_words, stop_hits, mean_word_len_milli,
    * symbol_permille, alpha_word_permille, pass_gate). The stopword
    * list interpolates from [[TextFns.GopherStopwords]].
    */
  def gopherGate(source: String, carry: Seq[String]): String = {
    val cc = carry.map(_ + ",").mkString(" ", " ", "")
    val stops = TextFns.GopherStopwords.map("'" + _ + "'").mkString(", ")
    s"""
        ggbase AS (
          SELECT$cc
            LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '${TextFns.HtmlSpacePattern}'),
              w -> LENGTH(w) > 0) AS words,
            text
          FROM $source),
        ggcounted AS (
          SELECT$cc
            CAST(LEN(words) AS BIGINT) AS n_words,
            CAST(COALESCE(LIST_SUM(LIST_TRANSFORM(words, w -> LENGTH(w))), 0) AS BIGINT) AS word_chars,
            CAST(LEN(LIST_FILTER(words, w -> REGEXP_MATCHES(w, '[a-zA-Z]'))) AS BIGINT) AS alpha_words,
            CAST(LEN(LIST_INTERSECT(LIST_DISTINCT(LIST_TRANSFORM(words, w -> LOWER(w))),
              [$stops])) AS BIGINT) AS stop_hits,
            CAST(LENGTH(text) - LENGTH(REPLACE(text, '#', ''))
              + (LENGTH(text) - LENGTH(REPLACE(text, '...', ''))) // 3 AS BIGINT) AS symbols
          FROM ggbase),
        ggscored AS (
          SELECT$cc n_words, stop_hits,
            CASE WHEN n_words > 0 THEN (word_chars * 1000) // n_words ELSE 0 END AS mean_word_len_milli,
            CASE WHEN n_words > 0 THEN (symbols * 1000) // n_words ELSE 0 END AS symbol_permille,
            CASE WHEN n_words > 0 THEN (alpha_words * 1000) // n_words ELSE 0 END AS alpha_word_permille
          FROM ggcounted),
        gate AS (
          SELECT$cc n_words, stop_hits, mean_word_len_milli, symbol_permille, alpha_word_permille,
            CAST(n_words BETWEEN 50 AND 100000
                 AND mean_word_len_milli BETWEEN 3000 AND 10000
                 AND symbol_permille <= 100
                 AND alpha_word_permille >= 800
                 AND stop_hits >= 2 AS BIGINT) AS pass_gate
          FROM ggscored)"""
  }

  /** The Luhn mod-10 validity test over a candidate expression `c` —
    * the replay of `PiiFns.luhnValid`: strip separators, from the right
    * double every second digit (minus 9 when over 9), valid iff the sum
    * is divisible by 10. Inlined wherever the card stage needs it so
    * the Spark fold and the oracle fold cannot drift apart.
    */
  private def luhnValidSql(c: String): String = {
    val dg = s"REGEXP_REPLACE($c, '[^0-9]', '', 'g')"
    s"""(LIST_SUM(LIST_TRANSFORM(RANGE(1, LENGTH($dg) + 1), i ->
        CASE WHEN i % 2 = 0
             THEN CASE WHEN (ASCII(SUBSTR($dg, CAST(LENGTH($dg) - i + 1 AS INT), 1)) - 48) * 2 > 9
                       THEN (ASCII(SUBSTR($dg, CAST(LENGTH($dg) - i + 1 AS INT), 1)) - 48) * 2 - 9
                       ELSE (ASCII(SUBSTR($dg, CAST(LENGTH($dg) - i + 1 AS INT), 1)) - 48) * 2 END
             ELSE ASCII(SUBSTR($dg, CAST(LENGTH($dg) - i + 1 AS INT), 1)) - 48 END)) % 10 = 0)"""
  }

  /** The Luhn-valid card occurrences of expression `c` (an array —
    * duplicates preserved, matching `PiiFns.ccValid`).
    */
  def ccValidSql(c: String): String =
    s"""LIST_FILTER(REGEXP_EXTRACT_ALL($c, '${PiiFns.CcCandidatePattern}'),
        cd -> ${luhnValidSql("cd")})"""

  /** The progressive PII replay of `PiiFns.piiFrame` over `source`
    * (must expose doc_id + text). Emits pstaged/p2/p3/p4/p5/p6/
    * pii_counted; `pii_counted` has doc_id, redacted, the six per-stage
    * counts (each taken on the previous stage's output, so count ==
    * replacements), and the residual re-scan. Patterns, tokens, and the
    * Luhn fold interpolate from [[PiiFns]]; the card-stage fold
    * replicates the `\b`-anchored per-distinct-candidate replacement
    * (LIST_REDUCE with the base text prepended — DuckDB's reduce has no
    * init argument).
    */
  def piiCounted(source: String): String = s"""
        pstaged AS (
          SELECT doc_id, text,
            REGEXP_REPLACE(text, '${PiiFns.EmailPattern}', '${PiiFns.EmailToken}', 'g') AS no_email
          FROM $source),
        p2 AS (SELECT *, REGEXP_REPLACE(no_email, '${PiiFns.Ipv4Pattern}', '${PiiFns.IpToken}', 'g') AS no_ip FROM pstaged),
        p3 AS (SELECT *, REGEXP_REPLACE(no_ip, '${PiiFns.PhonePattern}', '${PiiFns.PhoneToken}', 'g') AS no_phone FROM p2),
        p4 AS (SELECT *, REGEXP_REPLACE(no_phone, '${PiiFns.SsnPattern}', '${PiiFns.SsnToken}', 'g') AS no_ssn FROM p3),
        p5 AS (SELECT *, REGEXP_REPLACE(no_ssn, '${PiiFns.IbanPattern}', '${PiiFns.IbanToken}', 'g') AS no_iban FROM p4),
        -- LIST_DISTINCT does not guarantee Spark array_distinct's
        -- first-occurrence order, so the replacement FOLD ORDER can
        -- differ between engines. That is harmless because the
        -- \b-bounded card candidates cannot overlap each other and the
        -- replacement token is digit-free (it can never create or
        -- extend another candidate) — the fold is commutative. A future
        -- candidate-pattern change that allows overlapping matches or a
        -- digit-bearing token would silently break this cross-engine
        -- order independence; re-derive the argument before changing
        -- either.
        p6 AS (SELECT *,
            LIST_REDUCE(
              LIST_PREPEND(no_iban, LIST_DISTINCT(${ccValidSql("no_iban")})),
              (acc, cd) -> REGEXP_REPLACE(acc, '\\b' || cd || '\\b', '${PiiFns.CcToken}', 'g')) AS redacted
          FROM p5),
        pii_counted AS (
          SELECT doc_id, redacted,
            CAST(LEN(REGEXP_EXTRACT_ALL(text, '${PiiFns.EmailPattern}')) AS BIGINT) AS email_count,
            CAST(LEN(REGEXP_EXTRACT_ALL(no_email, '${PiiFns.Ipv4Pattern}')) AS BIGINT) AS ip_count,
            CAST(LEN(REGEXP_EXTRACT_ALL(no_ip, '${PiiFns.PhonePattern}')) AS BIGINT) AS phone_count,
            CAST(LEN(REGEXP_EXTRACT_ALL(no_phone, '${PiiFns.SsnPattern}')) AS BIGINT) AS ssn_count,
            CAST(LEN(REGEXP_EXTRACT_ALL(no_ssn, '${PiiFns.IbanPattern}')) AS BIGINT) AS iban_count,
            CAST(LEN(${ccValidSql("no_iban")}) AS BIGINT) AS cc_count,
            CAST(LEN(REGEXP_EXTRACT_ALL(redacted, '${PiiFns.EmailPattern}'))
               + LEN(REGEXP_EXTRACT_ALL(redacted, '${PiiFns.Ipv4Pattern}'))
               + LEN(REGEXP_EXTRACT_ALL(redacted, '${PiiFns.PhonePattern}'))
               + LEN(REGEXP_EXTRACT_ALL(redacted, '${PiiFns.SsnPattern}'))
               + LEN(REGEXP_EXTRACT_ALL(redacted, '${PiiFns.IbanPattern}'))
               + LEN(${ccValidSql("redacted")}) AS BIGINT) AS residual_pii
          FROM p6)"""

  /** The q192 add-one bigram LM replay against a FOREIGN model: train
    * the count tables over `trainSource`, score every `scoreSource` doc
    * — the CCNet reference-corpus deployment, which the q192 self-scored
    * oracle cannot express (its INNER joins assume every scored bigram
    * exists in the model; a reference model needs LEFT joins with the
    * c1 = 0 / c12 = 0 add-one floor, exactly `NgramLm.score`'s
    * semantics). Emits body-only CTEs lmtrain/lmuni/lmv/lmbi/lmlists/
    * lmbg/lmscored/lmsc; `lmsc` has (doc_id, avg_millibits) with the
    * q192 `total div n, 0 when n = 0` rule. Tokenization and the
    * milli_log2 kernel are byte-for-byte the q192 oracle's.
    */
  /** The DuckDB side of the fixed-point integer log2 kernel (the q173
    * BM25 / q192 LM / LangId shared arithmetic): bit-length plus a
    * one-shift interpolation, exact BIGINT for any argument >= 1 —
    * byte-for-byte the Spark side's length(bin(x))/shiftright formula.
    */
  def milliLog2(x: String): String =
    s"((LENGTH(PRINTF('%b', $x)) - 1) * 1000" +
      s" + (($x) * 1000 >> (LENGTH(PRINTF('%b', $x)) - 1)) - 1000)"

  def bigramLm(trainSource: String, scoreSource: String): String = {
    def mlog2(x: String): String = milliLog2(x)
    s"""
        lmtrain AS (
          SELECT LIST_FILTER(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ts
          FROM $trainSource),
        lmuni AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS c1
          FROM (SELECT UNNEST(ts) AS token FROM lmtrain) u GROUP BY token),
        lmv AS (SELECT CAST(COUNT(*) AS BIGINT) AS vocab FROM lmuni),
        lmbi AS (
          SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
          FROM (SELECT b['w1'] AS w1, b['w2'] AS w2
                FROM (SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ts)),
                        i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS b
                      FROM lmtrain) t) p
          GROUP BY w1, w2),
        lmlists AS (
          SELECT doc_id,
                 LIST_FILTER(string_split_regex(lower(text), '[^a-z]+'), t -> t <> '') AS ts
          FROM $scoreSource),
        lmbg AS (
          SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2
          FROM (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(ts)),
                  i -> struct_pack(w1 := ts[i], w2 := ts[i + 1]))) AS b
                FROM lmlists) t),
        lmscored AS (
          SELECT bg.doc_id,
                 ${mlog2("COALESCE(u.c1, 0) + vocab")}
               - ${mlog2("COALESCE(b.c12, 0) + 1")} AS bits
          FROM lmbg bg
          LEFT JOIN lmbi b USING (w1, w2)
          LEFT JOIN lmuni u ON bg.w1 = u.token, lmv),
        lmsc AS (
          SELECT l.doc_id,
                 CASE WHEN COUNT(s.bits) > 0
                      THEN CAST(SUM(s.bits) AS BIGINT) // CAST(COUNT(s.bits) AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END AS avg_millibits
          FROM lmlists l LEFT JOIN lmscored s USING (doc_id)
          GROUP BY l.doc_id)"""
  }
}
