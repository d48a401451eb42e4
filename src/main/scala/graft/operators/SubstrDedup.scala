package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring cross-document dedup — minimum-length-L VERBATIM
  * duplicate spans at ARBITRARY byte offsets (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better": the
  * ExactSubstr pass run over C4/RealNews with a suffix array at 50
  * tokens). This is the dedup modality the CDC chunk tier (q187–q189)
  * structurally cannot see: a duplicated span SHORTER than the expected
  * chunk size, or one straddling an h%64==0 boundary, never becomes a
  * whole shared chunk — but a verbatim 40-char overlap is exactly what
  * the published exact-substring work targets (SubstrDedupSpec plants a
  * 60-char shared span the chunk tier provably misses).
  *
  * DEFINITION (exact, oracle-replayable): character c of document d is
  * duplicated iff it lies inside some length-L window of d whose
  * content also occurs verbatim in at least one OTHER document. Maximal
  * runs of duplicated characters are the reported spans. Same-document
  * repeats do not count (cross-doc semantics, matching the chunk tier).
  *
  * ARCHITECTURE — two passes replacing the suffix array, which does not
  * distribute (Lee et al. build it single-node on 600 GB; at 100 TB the
  * sort alone is the job):
  *
  *   Pass A (candidates): winnowed k-gram anchors
  *   ([[graft.functions.WinnowAnchors]], k + w - 1 = L) — ~n/w rows per
  *   doc into ONE shuffle on the anchor key; docs sharing an anchor
  *   with another doc are candidates. The winnowing guarantee makes
  *   this pruning LOSSLESS: any two docs sharing a length->=L substring
  *   share a selected anchor, so a non-candidate doc provably has no
  *   duplicated span (spec-pinned: two-pass == exhaustive).
  *
  *   Pass B (exact, candidates only): every length-L window of the
  *   candidate docs, keyed by an 8-BYTE xxhash64 of the window content
  *   through ONE exchange (min/max-doc window over the key partition —
  *   no aggregate-plus-semi-join double shuffle), then an md5 CONTENT
  *   confirmation restricted to the colliding positions only, so a
  *   64-bit collision cannot manufacture a false span (at 100 TB,
  *   ~1e14 windows make 64-bit collisions certain; the md5 discipline
  *   is kept exactly where span identity is decided, over the
  *   candidate subset where it is cheap). Confirmed hits p1 < p2 with
  *   p2 <= p1 + L merge into one maximal span (their L-char coverages
  *   overlap or touch). Cost is O(chars of docs that actually share
  *   something), not the corpus: at 100 TB pass A reads everything
  *   cheaply and pass B's window explosion is confined to the
  *   duplicated subset plus anchor-collision false positives.
  *
  *   EXCHANGE ACCOUNTING (the tier's 100 TB cost center): the only
  *   full-candidate-corpus exchange is the detection shuffle at
  *   (8-byte key + doc_id + pos) = 24 bytes per window position, once —
  *   previously two exchanges keyed by 32-char md5 hex. The per-
  *   position granularity itself is irreducible pre-shuffle: a run of
  *   duplicated text yields one DISTINCT window content per position
  *   (no shared key to collapse runs under), and positions of one doc
  *   are scattered across key partitions until a doc-keyed exchange
  *   co-locates them — so run-collapse before the island shuffle would
  *   need exactly the exchange it is trying to avoid. The island
  *   shuffle itself ships (doc_id, pos) = 16 bytes per CONFIRMED
  *   duplicated position, subset-bounded by genuinely duplicated mass.
  *
  * STRIP SEMANTICS: [[stripSpans]] removes every duplicated span from
  * EVERY document holding it — the published ExactSubstr behavior (Lee
  * et al. drop all copies and note the model quality still improves),
  * deliberately different from the chunk tier's min-doc owner election:
  * spans are not aligned entities across docs (each doc's maximal
  * coverage differs), so "first occurrence" has no stable meaning here.
  * A pipeline wanting one surviving copy layers whole-doc or chunk
  * dedup first.
  */
object SubstrDedup {

  /** Minimum duplicated-span length L, in code points. */
  val DefaultMinLen = 40
  /** Anchor k-gram length; with [[DefaultW]] the winnowing guarantee
    * threshold t = w + k - 1 equals [[DefaultMinLen]] exactly.
    */
  val DefaultK = 20
  /** Winnow window (consecutive k-gram hashes per selection). */
  val DefaultW = DefaultMinLen - DefaultK + 1

  /** Pass A rows: one per winnow-selected anchor — (doc_id, pos,
    * anchor) with `anchor` = xxhash64 of the k-gram at the selected
    * position (8 bytes on the wire and in the persisted state; an
    * anchor collision only ADDS a candidate doc, which the exact pass B
    * then discards — losslessness needs only "same content => same
    * anchor", true of any deterministic hash, so the pruning guarantee
    * is unaffected). This is also the PERSISTED incremental state:
    * store it partitioned by `anchor` so [[dupSpansAgainst]]'s
    * semi-join prunes at the source (the chunkPairState discipline).
    *
    * The output records its NORMALIZATION MODE as a constant `norm`
    * boolean column (free under parquet RLE): anchor hashes and span
    * positions live in raw-byte or NFC coordinates depending on the
    * flag, and a state probed under the other mode would silently miss
    * spans (byte-distinct k-grams) or report coordinates in the wrong
    * space — so the state-probing legs ([[dupSpansAgainst]],
    * [[contaminationSpansAgainst]]) verify the recorded bit against
    * their own flag and fail LOUDLY on mismatch, as they do for the
    * pre-xxhash64 string format ([[requireAnchorState]]).
    */
  def anchors(docs: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", k: Int = DefaultK,
              w: Int = DefaultW, normalize: Boolean = false): DataFrame =
    maybeNfc(docs, textCol, normalize)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        graft.functions.WinnowAnchors(col(textCol), k, w).as("ps"))
      .select(col("doc_id"), col("text"), explode(col("ps")).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(expr(s"substring(text, pos, $k)")).as("anchor"),
        lit(normalize).as("norm"))

  /** Loud persisted-state validation, run BEFORE any join against the
    * state can silently return nothing: (1) `anchor` must be LongType —
    * a pre-r14 md5-hex STRING state joined against 64-bit probe anchors
    * coerces to null and misses every duplicate with no error; (2) the
    * state's recorded `norm` bit (see [[anchors]]) must equal the
    * probe's `normalize` flag — mismatched coordinate spaces silently
    * hide NFD-variant spans or mis-place reported positions. The value
    * check reads ONE row of the state (a footer-bounded limit-1 scan;
    * the bit is constant by construction).
    */
  private def requireAnchorState(state: DataFrame, normalize: Boolean,
                                 what: String): Unit = {
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType}
    val fields = state.schema.fields.map(f => f.name -> f.dataType).toMap
    fields.get("anchor") match {
      case Some(LongType) => ()
      case Some(StringType) => throw new IllegalArgumentException(
        s"$what: anchor column is STRING — an md5-hex anchor state from the " +
          "pre-xxhash64 format; joining it against 64-bit probe anchors would " +
          "coerce to null and silently miss every duplicate. Rebuild the state " +
          "with anchors() under the current format.")
      case other => throw new IllegalArgumentException(
        s"$what: expected a LongType anchor column, found $other")
    }
    fields.get("norm") match {
      case Some(BooleanType) =>
        state.select(col("norm")).limit(1).collect().headOption.foreach { r =>
          require(r.getBoolean(0) == normalize,
            s"$what was built with normalize=${r.getBoolean(0)} but this probe " +
              s"runs with normalize=$normalize — anchor hashes and span " +
              "coordinates would silently disagree across the join; rebuild " +
              "the state or pass the matching flag")
        }
      case None => throw new IllegalArgumentException(
        s"$what records no `norm` column — an anchor state predating the " +
          "normalization record; rebuild with anchors() so coordinate " +
          "compatibility is verifiable")
      case other => throw new IllegalArgumentException(
        s"$what: expected a BooleanType norm column, found $other")
    }
  }

  /** Docs carrying at least one anchor shared with ANOTHER doc — the
    * lossless candidate set. Two shuffles on the anchor key (aggregate
    * + co-partitioned semi-join) and a distinct on doc_id; output is
    * bounded by the docs that share anything.
    */
  def candidateDocs(anchorRows: DataFrame): DataFrame = {
    val multi = anchorRows
      .groupBy(col("anchor"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("anchor"))
    anchorRows.join(multi, Seq("anchor"), "left_semi")
      .select(col("doc_id")).distinct()
  }

  /** NFC-normalize `textCol` in place when the flag is on — the
    * normalize-before-any-hash-keyed-stage discipline (q206/q207)
    * applied to this tier: an NFD-encoded copy of a span produces
    * byte-distinct k-grams and windows, so encoding variance silently
    * hides verbatim duplication from BOTH passes (NfcSpec pins the
    * composition). With the flag, every reported position/span is in
    * NORMALIZED code-point coordinates — the one coordinate space all
    * flagged stages share; strip/profile consumers must feed the same
    * normalized text to the *From variants. Per-row scalar, no shuffle.
    */
  private def maybeNfc(docs: DataFrame, textCol: String,
                       normalize: Boolean): DataFrame =
    if (!normalize) docs
    else docs.withColumn(textCol, graft.functions.NfcNormalize(col(textCol)))

  /** The 1-based window-start positions of a doc as an exploded column —
    * shared by both gram generators (one definition; the short-doc
    * guard matters because sequence(1, 0) is the DESCENDING [1, 0], not
    * empty — the NgramLm lesson).
    */
  private def windowPositions(minLen: Int) = expr(
    s"if(length(text) >= $minLen, sequence(1, length(text) - $minLen + 1), " +
      "array())")

  /** One row per length-L window of every doc: (doc_id, pos, g) with
    * `g` = md5 of the window content — the EXACT-identity form, used
    * where the window set is small by contract (the benchmark side of
    * [[contaminationSpans]]) and in the candidate-confirmation stage.
    */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
                       minLen: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"), col("text"), explode(windowPositions(minLen)).as("pos"))
      .select(col("doc_id"), col("pos"),
        md5(expr(s"substring(text, pos, $minLen)").cast("binary")).as("g"))

  /** [[gramRows]] keyed by xxhash64 — the 8-byte detection key that the
    * full-candidate-corpus exchanges ride (24-byte rows instead of
    * md5-hex-keyed ~48-byte ones). Collisions are possible at corpus
    * scale, so every consumer must confirm colliding groups by content
    * ([[confirmHits]] / the bench-md5 join in [[contaminationSpans]]).
    */
  private def gramRows64(docs: DataFrame, idCol: String, textCol: String,
                         minLen: Int): DataFrame =
    docs
      .select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"), col("text"), explode(windowPositions(minLen)).as("pos"))
      .select(col("doc_id"), col("pos"),
        xxhash64(expr(s"substring(text, pos, $minLen)")).as("h"))

  /** md5-confirm candidate hit positions against actual window content:
    * candidates (doc_id, pos) rejoin their doc text, windows re-keyed by
    * content md5, and a position survives iff its md5 group spans >= 2
    * distinct docs (min != max doc over the group — constant state, one
    * exchange, no aggregate-plus-self-join double compute). Grouping by
    * md5 across ALL candidates equals grouping within each 64-bit
    * collision group: equal content implies equal xxhash64, so two
    * candidates never share an md5 across different detection groups.
    * Cost is bounded by the candidate positions plus one exchange of the
    * candidate docs' text.
    */
  private def confirmHits(cand: DataFrame, docs: DataFrame,
                          minLen: Int): DataFrame = {
    val byG = Window.partitionBy(col("g"))
    cand.join(docs, Seq("doc_id"))
      .select(col("doc_id"), col("pos"),
        md5(expr(s"substring(text, pos, $minLen)").cast("binary")).as("g"))
      .withColumn("mn", min(col("doc_id")).over(byG))
      .withColumn("mx", max(col("doc_id")).over(byG))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))
  }

  /** Pass B hits over the GIVEN docs: (doc_id, pos) for every 1-based
    * position whose length-L window content occurs in >= 2 distinct
    * docs. Exact by construction — every position is examined; detection
    * rides the 8-byte xxhash64 key through ONE exchange (a cross-doc
    * group is one whose min and max doc_id differ — computed as window
    * functions over the key partition, replacing the old aggregate +
    * second full semi-join shuffle), and the md5 content confirmation
    * then re-proves every colliding position on the candidate subset, so
    * a 64-bit collision can only cost work, never correctness.
    */
  private[operators] def sharedGramHits(docs: DataFrame, idCol: String,
                                        textCol: String, minLen: Int): DataFrame = {
    val d = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val byH = Window.partitionBy(col("h"))
    val cand = gramRows64(d, "doc_id", "text", minLen)
      .withColumn("mn", min(col("doc_id")).over(byH))
      .withColumn("mx", max(col("doc_id")).over(byH))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))
    confirmHits(cand, d, minLen)
  }

  /** Maximal spans from hit positions: hits p1 < p2 of the same doc
    * merge when p2 <= p1 + L (coverages [p, p+L-1] overlap or touch).
    * One shuffle on doc_id (the island window); output one row per
    * maximal span — (doc_id, span_idx, span_start, span_end, span_len).
    */
  private[operators] def spansFromHits(hits: DataFrame, minLen: Int): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val islanded = hits
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) > minLen, 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    islanded
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + minLen - 1).cast("long").as("span_end"))
      .withColumn("span_idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("span_start"))).cast("long"))
      .select(col("doc_id"), col("span_idx"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** The two-pass detector: winnowed candidate pruning, then the exact
    * per-window pass restricted to candidates. Requires w + k - 1 <= L
    * (the winnowing guarantee threshold) — with the defaults t = L
    * exactly, so the pruning is lossless and the output equals the
    * exhaustive single-pass definition (spec-pinned).
    */
  def dupSpans(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", minLen: Int = DefaultMinLen,
               k: Int = DefaultK, w: Int = DefaultW,
               normalize: Boolean = false): DataFrame = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee t = w + k - 1 = ${w + k - 1} must not exceed minLen=$minLen: " +
        "a shared span of length minLen could otherwise select no common anchor")
    val d = maybeNfc(docs, textCol, normalize)
    val cands = candidateDocs(anchors(d, idCol, textCol, k, w))
    val candDocs = d.join(cands,
      d(idCol) === cands("doc_id"), "left_semi")
    spansFromHits(sharedGramHits(candDocs, idCol, textCol, minLen), minLen)
  }

  /** The exhaustive single-pass detector (no candidate pruning) — the
    * definition itself, quadratic-free but reading every window of
    * every doc. Exists as the spec's equality reference and the honest
    * small-corpus baseline; [[dupSpans]] is the scale path.
    */
  def dupSpansExhaustive(docs: DataFrame, idCol: String = "doc_id",
                         textCol: String = "text",
                         minLen: Int = DefaultMinLen,
                         normalize: Boolean = false): DataFrame =
    spansFromHits(sharedGramHits(maybeNfc(docs, textCol, normalize),
      idCol, textCol, minLen), minLen)

  /** Per-document duplicated-span profile over ALL docs: total code
    * points, duplicated code points (sum of maximal-span lengths),
    * span count — zero rows kept for clean docs so the profile covers
    * the corpus (the duplicatedMass discipline).
    */
  def dupProfile(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", minLen: Int = DefaultMinLen,
                 k: Int = DefaultK, w: Int = DefaultW): DataFrame =
    dupProfileFrom(docs, dupSpans(docs, idCol, textCol, minLen, k, w),
      idCol, textCol)

  /** [[dupProfile]] over a PRECOMPUTED (possibly persisted) span table —
    * the artifact-reuse form: the span detection is the expensive pass,
    * and the q201/q202/q203 trio shares one materialization of it (the
    * sharedPairs discipline).
    */
  def dupProfileFrom(docs: DataFrame, spans: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val agg = spans
      .groupBy(col("doc_id"))
      .agg(sum(col("span_len")).as("dup_chars"),
        count(lit(1)).as("n_spans"))
    docs.select(col(idCol).as("doc_id"),
        length(col(textCol)).cast("long").as("total_chars"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("total_chars"),
        coalesce(col("dup_chars"), lit(0L)).as("dup_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }

  /** The removal transform: drop every duplicated span from every doc
    * (ALL copies — the published ExactSubstr semantics; see the object
    * doc for why owner election is ill-posed at span granularity).
    * Output one row per doc: total/stripped code points, span count,
    * and md5 of the kept text (non-covered segments concatenated in
    * order) — compact and exactly verifiable without shipping
    * corpus-sized text through the gate. Clean docs keep a row whose
    * kept_md5 is the md5 of the full text.
    */
  def stripSpans(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", minLen: Int = DefaultMinLen,
                 k: Int = DefaultK, w: Int = DefaultW): DataFrame =
    stripSpansFrom(docs, dupSpans(docs, idCol, textCol, minLen, k, w),
      idCol, textCol)

  /** [[stripSpans]] over a precomputed span table (see
    * [[dupProfileFrom]]).
    */
  def stripSpansFrom(docs: DataFrame, spansIn: DataFrame,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val spans = spansIn
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start").as("st"),
          col("span_end").as("en")))).as("sps"),
        sum(col("span_len")).as("stripped_chars"),
        count(lit(1)).as("n_spans"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("total_chars"),
        coalesce(col("stripped_chars"), lit(0L)).as("stripped_chars"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        // fold the sorted, non-overlapping spans left to right, keeping
        // the text between the previous span's end and the next start,
        // then the tail after the last span
        md5(when(col("sps").isNull, col("text")).otherwise(expr(
          """aggregate(sps,
            |  named_struct('e', cast(0 as long), 'a', cast('' as string)),
            |  (ac, sp) -> named_struct(
            |    'e', sp.en,
            |    'a', concat(ac.a, substring(text, cast(ac.e as int) + 1,
            |                 cast(sp.st - ac.e - 1 as int)))),
            |  ac -> concat(ac.a, substring(text, cast(ac.e as int) + 1,
            |              length(text) - cast(ac.e as int))))""".stripMargin))
          .cast("binary")).as("kept_md5"))
  }

  /** EXACT-SUBSTRING DECONTAMINATION — the tier's second published use
    * (Lee et al. run ExactSubstr between train and eval sets; the
    * GPT-3/FLAN contamination studies match verbatim n-grams the same
    * way): every maximal span of a TRAIN doc whose length->=L windows
    * also occur verbatim in ANY benchmark doc. The q52 shingle tier
    * answers "how much overlaps"; this answers "exactly WHICH
    * characters leaked", at the same arbitrary-offset exactness as
    * [[dupSpans]].
    *
    * Same two-pass shape: benchmark anchors prune the train side
    * losslessly (a train doc sharing a length->=L span with a bench doc
    * must share a winnow anchor with it), then the exact window pass
    * runs over candidate train docs against the DISTINCT benchmark
    * window set. Cost: one anchor scan of each side, then windows of
    * only the suspicious train docs plus the benchmark (which is tiny
    * by definition). Train/bench id spaces are never joined, so
    * overlapping ids are harmless.
    */
  def contaminationSpans(train: DataFrame, bench: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         minLen: Int = DefaultMinLen, k: Int = DefaultK,
                         w: Int = DefaultW,
                         normalize: Boolean = false): DataFrame = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee t = w + k - 1 = ${w + k - 1} must not exceed minLen=$minLen")
    // normalize BOTH sides before any hash-keyed stage (the dupSpans
    // discipline): an NFD-encoded leak of a bench span is byte-invisible
    // to raw anchors and windows; spans come back in NFC coordinates
    val t = maybeNfc(train, textCol, normalize)
    val b = maybeNfc(bench, textCol, normalize)
    val ta = anchors(t, idCol, textCol, k, w)
    val ba = anchors(b, idCol, textCol, k, w)
    val touched = ta
      .join(ba.select(col("anchor")).distinct(), Seq("anchor"), "left_semi")
      .select(col("doc_id")).distinct()
    val candTrain = t.join(touched,
      t(idCol) === touched("doc_id"), "left_semi")
    spansFromHits(crossSetHits(candTrain, b, idCol, textCol, minLen), minLen)
  }

  /** Cross-set exact window hits: (doc_id, pos) of every `candTrain`
    * position whose length-L window occurs verbatim in `bench` — the
    * contamination pass-B primitive shared by [[contaminationSpans]] and
    * [[contaminationSpansAgainst]]. Deliberately NOT the xxhash64 +
    * confirm structure of [[sharedGramHits]]: there both sides are
    * corpus-scale and the key exchange is the cost center, but a
    * benchmark's DISTINCT window set is small by definition, so this
    * single md5 semi-join broadcasts the bench side and the train-side
    * windows are filtered MAP-SIDE — no train exchange at all, exact
    * identity with no confirmation pass, and `candTrain` referenced
    * once (a confirm rejoin would recompute its pass-A anchor pruning
    * subtree a second time for nothing).
    */
  private def crossSetHits(candTrain: DataFrame, bench: DataFrame,
                           idCol: String, textCol: String,
                           minLen: Int): DataFrame = {
    val bGrams = gramRows(bench, idCol, textCol, minLen)
      .select(col("g")).distinct()
    gramRows(candTrain, idCol, textCol, minLen)
      .join(bGrams, Seq("g"), "left_semi")
      .select(col("doc_id"), col("pos"))
  }

  /** INCREMENTAL decontamination: a NEW benchmark batch against the
    * PERSISTED anchor state of an already-ingested train corpus —
    * benchmark suites grow after ingest, and re-running
    * [[contaminationSpans]] from scratch per added benchmark would
    * re-scan the whole train side; this is [[dupSpansAgainst]] with the
    * sides swapped. The batch's winnow anchors probe `trainAnchors`
    * (the persisted [[anchors]] output — partition it by `anchor` and
    * the probe prunes at the source); only train docs sharing an anchor
    * with the new benchmark are re-read (`train` is a LAZY source,
    * restricted by semi-join on doc_id), and the exact cross-set window
    * pass runs over those docs against the new benchmark only.
    *
    * The merge rule (spec-pinned): full recompute over
    * (oldBench ∪ newBench) ==
    *   stored spans for UNTOUCHED train docs
    *   ∪ mergeSpans(stored spans for touched docs ∪ this output).
    * Soundness: a contaminated position is one whose window occurs in
    * ANY benchmark doc — per-position union semantics over the
    * benchmark set — and a maximal span set is exactly the interval
    * union of per-position coverages [p, p+L-1], so span sets from
    * disjoint benchmark subsets compose through [[mergeSpans]]
    * (interval union is associative); the winnowing guarantee makes
    * `touched` complete (a train doc sharing a length->=L span with a
    * new benchmark doc must share a winnow anchor with it).
    *
    * No disjointness probe, deliberately (the one contract difference
    * from [[dupSpansAgainst]], where batch/state overlap corrupts pair
    * semantics): re-processing a benchmark doc is IDEMPOTENT here — its
    * spans re-derive and merge into themselves under interval union.
    * The only contract is that `trainAnchors` is the [[anchors]] output
    * over `train`, built under the SAME `normalize` mode as this probe
    * (validated loudly — see [[requireAnchorState]]). Per-batch cost
    * scales with the new benchmark plus the genuinely-contaminated
    * train mass, never the train corpus.
    */
  def contaminationSpansAgainst(newBench: DataFrame, train: DataFrame,
                                trainAnchors: DataFrame,
                                idCol: String = "doc_id",
                                textCol: String = "text",
                                minLen: Int = DefaultMinLen, k: Int = DefaultK,
                                w: Int = DefaultW,
                                normalize: Boolean = false): DataFrame = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee t = w + k - 1 = ${w + k - 1} must not exceed minLen=$minLen")
    requireAnchorState(trainAnchors, normalize,
      "contaminationSpansAgainst: trainAnchors")
    val ba = anchors(newBench, idCol, textCol, k, w, normalize)
    val touched = trainAnchors
      .join(ba.select(col("anchor")).distinct(), Seq("anchor"), "left_semi")
      .select(col("doc_id")).distinct()
    val t = maybeNfc(train, textCol, normalize)
    val candTrain = t.join(touched,
      t(idCol) === touched("doc_id"), "left_semi")
    spansFromHits(crossSetHits(candTrain,
      maybeNfc(newBench, textCol, normalize), idCol, textCol, minLen), minLen)
  }

  /** Merge possibly-overlapping/adjacent span sets into maximal spans —
    * the incremental manifest's merge rule: coverage is a SET of
    * characters, so updated spans for a doc are the interval union of
    * its old spans and the [[dupSpansAgainst]] output. Adjacent spans
    * (start == prev end + 1) merge: coverage is contiguous.
    */
  def mergeSpans(spans: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy(col("doc_id"))
      .orderBy(col("span_start"), col("span_end"))
    val runMax = max(col("span_end")).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("brk",
        when(runMax.isNull || col("span_start") > runMax + 1, 1L).otherwise(0L))
      .withColumn("island", sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("span_start")).as("span_start"),
        max(col("span_end")).as("span_end"))
      .withColumn("span_idx", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("span_start"))).cast("long"))
      .select(col("doc_id"), col("span_idx"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_len"))
  }

  /** Incremental detection: a NEW batch against the persisted anchor
    * state of the prior corpus (disjoint doc sets — the
    * jaccardPairsAgainst contract, same loud probe). `oldDocs` is the
    * prior corpus as a LAZY source; only docs sharing an anchor with
    * the batch are actually read (semi-join on doc_id — partition the
    * lake by doc_id and the read prunes). Returns [[dupSpans]]-schema
    * rows for every doc in (new batch ∪ touched old docs).
    *
    * The merge rule (spec-pinned): full recompute over old ∪ new ==
    *   old spans for UNTOUCHED old docs
    *   ∪ mergeSpans(old spans for touched docs ∪ this output).
    * Soundness: a new doc sharing a length->=L span with an old doc
    * forces a shared winnow anchor (the guarantee), so every old doc
    * whose coverage changes is touched, and a new doc's spans involve
    * only new or touched docs — both sides of the rule are complete.
    * Per-batch cost scales with the batch plus the genuinely-duplicated
    * old mass, never the corpus. `oldAnchors` must have been built
    * under the SAME `normalize` mode as this probe (validated loudly —
    * see [[requireAnchorState]]; with the flag on, batch text is
    * NFC-normalized before hashing and spans come back in normalized
    * coordinates, matching the batch [[dupSpans]] leg).
    */
  def dupSpansAgainst(newDocs: DataFrame, oldDocs: DataFrame,
                      oldAnchors: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", minLen: Int = DefaultMinLen,
                      k: Int = DefaultK, w: Int = DefaultW,
                      normalize: Boolean = false): DataFrame = {
    require(w + k - 1 <= minLen,
      s"winnowing guarantee t = w + k - 1 = ${w + k - 1} must not exceed minLen=$minLen")
    requireAnchorState(oldAnchors, normalize, "dupSpansAgainst: oldAnchors")
    // loud disjointness probe on the batch's RAW ids (the
    // jaccardPairsAgainst discipline) — reading ids straight off
    // newDocs instead of its anchor rows costs one column-pruned scan
    // of the batch (no second anchor computation) and is STRICTER: a
    // sub-k-length doc produces no anchors at all, and the old
    // anchor-derived probe would have let such an id slip past the
    // disjointness contract unnoticed
    val dup = newDocs.select(col(idCol).as("doc_id")).distinct()
      .join(oldAnchors.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .limit(1).collect()
    require(dup.isEmpty,
      s"dupSpansAgainst batch overlaps the state (e.g. doc=${dup.headOption.map(_.get(0)).orNull}): " +
        "the incremental contract requires disjoint doc sets")
    val na = anchors(newDocs, idCol, textCol, k, w, normalize)
    val touched = oldAnchors
      .join(na.select(col("anchor")).distinct(), Seq("anchor"), "left_semi")
      .select(col("doc_id")).distinct()
    val touchedOldDocs = oldDocs.join(touched,
      oldDocs(idCol) === touched("doc_id"), "left_semi")
    val corpus = maybeNfc(
      newDocs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
        .unionByName(touchedOldDocs.select(col(idCol).as("doc_id"),
          col(textCol).as("text"))),
      "text", normalize)
    val allAnchors = na.unionByName(
      oldAnchors.join(touched, Seq("doc_id"), "left_semi"))
    val cands = candidateDocs(allAnchors)
    val candDocs = corpus.join(cands, Seq("doc_id"), "left_semi")
    spansFromHits(sharedGramHits(candDocs, "doc_id", "text", minLen), minLen)
  }
}
