package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Word-n-gram repetition CHARACTER coverage — the remaining half of the
  * MassiveText repetition-filter family (Rae et al. 2021, "Scaling
  * Language Models: ... Gopher", §A1.1). The family has six kinds of
  * signal; q38 carries the duplicate-word fraction and the top-bigram
  * OCCURRENCE fraction, q193 the duplicate line/paragraph (count and
  * char) rules — this operator computes the published character-FRACTION
  * n-gram rules:
  *
  *   - for small n (2..4): the fraction of characters covered by the
  *     occurrences of the single MOST FREQUENT word n-gram (computed
  *     whether or not it repeats, the published behavior — a unique top
  *     bigram still covers its own characters);
  *   - for large n (5..10): the fraction of characters covered by ANY
  *     word n-gram occurring MORE THAN ONCE in the document.
  *
  * Coverage is the INTERVAL UNION of the occurrences' character spans —
  * overlapping occurrences are never double-counted (the paper's
  * "taking care not to double-count characters that overlap" clause) —
  * computed with the island machinery the substring tier uses, at word
  * granularity. All signals are intra-document: nothing joins across
  * documents.
  *
  * THRESHOLD-COMPARABILITY NOTE (deliberate divergence): widespread
  * Gopher-rule reimplementations (the RedPajama/Dolma-style quality
  * signal sets) compute `count x gram_char_length / total_chars`
  * WITHOUT the overlap clause — on self-overlapping occurrences (e.g.
  * the top bigram of "a a a a") that product double-counts shared
  * characters and can exceed 1, while the interval union here never
  * does. The two agree exactly whenever occurrences are disjoint;
  * where they differ, this union form is the one the paper's clause
  * describes. Cut-offs tuned against count-times-length pipelines are
  * therefore NOT directly portable to these columns on repetitive
  * text — re-tune thresholds on this operator's own output (the
  * Spark/DuckDB oracle pair agrees bit-for-bit on the union form).
  *
  * Scale shape: words posexplode narrowly; ONE doc-keyed window pass
  * computes the running character offset (prefix sum over preceding
  * word lengths) and, per requested n, the n-word frame as a
  * frame-bounded collect_list — every per-word quantity is LINEAR in
  * the document (an array-building prefix-sum HOF would copy O(words²)
  * bytes per doc and break on long documents; the window formulation
  * is the declarative linear form). Gram structs then explode and flow
  * through doc-keyed window passes (occurrence count on (doc, n,
  * gram), top-gram rank on (doc, n), interval-union islanding on
  * (doc, n)). Shuffle volume is Σ|doc words| per requested n with
  * bounded per-group state — never a cross-document join, never a
  * per-row quadratic lambda.
  *
  * Determinism: the top gram per (doc, n) ties on (count DESC, gram md5
  * ASC) — a pure function of the text, replayed identically by the
  * DuckDB oracle. Tokenization is the q38 whitespace split, so newlines
  * ride inside "words" exactly as the oracle sees them.
  */
object NgramRep {

  /** Per-document repetition-coverage profile: `(doc_id, total_chars)`
    * plus one integral per-mille column per requested n —
    * `top{n}gram_char_permille` for `topNs`, `dup{n}gram_char_permille`
    * for `dupNs`. Every doc keeps a row (docs too short for an n-gram
    * report 0 coverage); requesting an n in both lists is rejected
    * (the two rules disagree on what to cover).
    */
  def ngramCoverage(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text",
                    topNs: Seq[Int] = Seq(2, 3, 4),
                    dupNs: Seq[Int] = Seq(5, 6, 7, 8, 9, 10)): DataFrame = {
    require(topNs.intersect(dupNs).isEmpty,
      s"an n cannot be both a top-gram and a dup-gram rule: ${topNs.intersect(dupNs)}")
    require((topNs ++ dupNs).forall(_ >= 1), "n-gram sizes must be positive")
    val allNs = (topNs ++ dupNs).distinct.sorted

    // stage A — linear per-word window pass: word rows posexplode
    // narrowly, ONE doc-keyed exchange of (doc_id, wi, word) computes
    // the running 1-based char offset (word i starts at
    // 1 + Σ_{j<i}(len_j + 1)) and, per n, the n-word forward frame as a
    // frame-bounded collect_list — all linear in the doc (a prefix-sum
    // HOF building the offsets ARRAY would copy O(words²) bytes on long
    // docs). A frame shorter than n (the doc's tail) yields no gram.
    // `en` falls out of the joined gram text itself: the gram spans
    // exactly length(gram) chars from its start (single-space joins are
    // what split guarantees).
    val byWord = Window.partitionBy(col("doc_id")).orderBy(col("wi"))
    val off = (lit(1L) + coalesce(
      sum(length(col("word")).cast("long") + 1L)
        .over(byWord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .as("st")
    // ONE forward frame at the largest n; each smaller gram is a
    // prefix slice of it (slice/concat_ws are codegen'd scalar
    // expressions — only the null-filter lambda is a HOF). Gram texts
    // are staged as projection columns so the en/md5 pair references
    // each one twice without re-evaluating it.
    val maxN = allNs.max
    val frame = collect_list(col("word"))
      .over(byWord.rowsBetween(Window.currentRow, maxN - 1)).as("aw")
    val gramTextCols = allNs.map(nn =>
      expr(s"if(size(aw) >= $nn, concat_ws(' ', slice(aw, 1, $nn)), null)")
        .as(s"gs$nn"))
    // (r19 note 2: narrowing g to the 16-byte digest — unhex(md5), an
    // order-preserving halving of the thrice-sorted gram key — was tried
    // per guide §2.3 and measured ~20% SLOWER: Spark's radix/prefix sort
    // on UTF8String outruns BinaryType comparison, and the unhex adds a
    // per-gram allocation. The hex-string key stays.)
    val gramStructSql = allNs.map(nn =>
      s"""if(gs$nn is null, null,
            named_struct('n', $nn, 'st', st,
              'en', st + length(gs$nn) - 1,
              'g', md5(cast(gs$nn as binary))))""").mkString(", ")
    val grams = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("wi", "word")))
      .select(col("doc_id"), off, frame)
      .select(col("doc_id") +: col("st") +: gramTextCols: _*)
      .select(col("doc_id"), explode(expr(
        s"filter(array($gramStructSql), x -> x is not null)")).as("gr"))
      .select(col("doc_id"), col("gr.n").as("n"), col("gr.st").as("st"),
        col("gr.en").as("en"), col("gr.g").as("g"))

    // stage B — occurrence counts and the top-gram winner. The winner
    // test marks EVERY occurrence row of the winning gram (same count,
    // same key), so the top tier keeps whole occurrence sets, not
    // single rows.
    // (r19 note: splitting the tiers — dup filter + an aggregated
    // winner joined back — was tried and measured 3x SLOWER: each tier
    // branch re-references the count-window subtree, and Spark reuses
    // only exchanges, so the window recomputed per reference. The
    // linear window chain keeps every operator single-pass.)
    // (r20, guide §2.4 "remove shuffles/sorts outright": the previous
    // form ranked the winner with dense_rank() OVER (PARTITION BY
    // doc_id, n ORDER BY c DESC, g ASC) — a SECOND full sort of the
    // gram rows on (doc_id, n, c, g), right after the count window had
    // already sorted them on (doc_id, n, g). "rank == 1 under
    // (c DESC, g ASC)" is just "(-c, g) equals its per-(doc, n)
    // minimum": an UNORDERED min(struct(-c, g)) window computes the
    // winner with NO order spec, and its required sort on the bare
    // partition keys (doc_id, n) is a PREFIX of the count window's
    // (doc_id, n, g) output order — the planner inserts no sort at all.
    // Three gram-row sorts become two (the count sort + stage C's
    // island sort); same winner rows bit-for-bit: all occurrences of
    // the winning gram share (c, g), ties on c break toward min g
    // exactly as (c DESC, g ASC) ranked them.)
    val byGram = Window.partitionBy(col("doc_id"), col("n"), col("g"))
    val byDocN = Window.partitionBy(col("doc_id"), col("n"))
    val kept = grams
      .withColumn("c", count(lit(1)).over(byGram))
      .withColumn("k", struct((-col("c")).as("nc"), col("g").as("g")))
      .withColumn("best", min(col("k")).over(byDocN))
      .filter(
        (col("n").isin(dupNs.map(Int.box): _*) && col("c") >= 2L) ||
          (col("n").isin(topNs.map(Int.box): _*) && col("k") === col("best")))
      .drop("k", "best")

    // stage C — interval union per (doc, n): the mergeSpans island rule
    // over character spans ((doc, n, st) is unique for a fixed
    // tokenization, so the ordering is total and the pass deterministic)
    val ord = Window.partitionBy(col("doc_id"), col("n"))
      .orderBy(col("st"), col("en"))
    val runMax = max(col("en")).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    val cov = kept
      .withColumn("brk",
        when(runMax.isNull || col("st") > runMax + 1, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n"), col("isl"))
      .agg(min(col("st")).as("a"), max(col("en")).as("b"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("b") - col("a") + 1).as("cov"))

    // stage D — pivot to one row per doc (conditional sums, not PIVOT:
    // fixed schema, no second scan) and integral per-mille against the
    // doc's total code points; gram-less docs keep a zero row
    val covAggs = allNs.map(nn =>
      sum(when(col("n") === nn, col("cov")).otherwise(0L)).as(s"cov$nn"))
    val perDoc = cov.groupBy(col("doc_id")).agg(covAggs.head, covAggs.tail: _*)
    val base = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("long").as("total_chars"))
    val outCols = col("doc_id") +: col("total_chars") +: allNs.map { nn =>
      val name = if (topNs.contains(nn)) s"top${nn}gram_char_permille"
                 else s"dup${nn}gram_char_permille"
      expr(s"case when total_chars > 0 then (coalesce(cov$nn, 0L) * 1000) div total_chars else 0L end")
        .as(name)
    }
    base.join(perDoc, Seq("doc_id"), "left").select(outCols: _*)
  }
}
