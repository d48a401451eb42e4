package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunk-level cross-document duplication — the
  * substring-granular dedup tier between exact whole-doc dedup (q20)
  * and shingle-similarity dedup (Jaccard/MinHash/SimHash): web corpora
  * repeat PARAGRAPHS (licenses, boilerplate, quoted articles) inside
  * otherwise-distinct documents, invisible to whole-doc hashing and
  * diluted below threshold for whole-doc similarity once the host
  * documents are long enough.
  *
  * Chunking is CDC (the codegen'd rolling-hash `CdcBoundaries`, q55's
  * kernel), NOT fixed-width: boundaries are a pure function of local
  * content, so a shared paragraph chunks identically in every document
  * that contains it REGARDLESS of its byte offset — an insertion
  * upstream shifts fixed-width frames out of alignment but leaves CDC
  * chunks untouched past the edit's window (the insertion-locality
  * property TextFnsSpec pins). Detection is then exact equality on the
  * chunk hash: one shuffle on `chunk_hash`, never any pairwise compare.
  *
  * 100 TB story: chunking is a linear per-row scalar (no shuffle);
  * the cluster step shuffles (chunk_hash, doc_id, len) triples once
  * with map-side partial aggregation — cost is corpus-linear and the
  * output is bounded by the duplicated mass, not the corpus. The
  * repeated-chunk table is the removal manifest: anti-join it back on
  * (doc_id, chunk_idx) to strip duplicated passages while keeping the
  * host documents.
  */
object ChunkDedup {

  /** LOSSLESS CDC chunking: one row per (doc, chunk) with the chunk
    * SUBSTRING and its 1-based character span — concatenating a doc's
    * chunks in `chunk_idx` order reproduces the text exactly
    * (spec-pinned), so every downstream decision can be mapped back to
    * exact character ranges. Boundary positions come from
    * [[graft.functions.CdcBoundaries]] (window 8 / base 31 / mod 1e9+7
    * / div 64 defaults — expected chunk ≈ 64 chars); a cut at position
    * p ends the current chunk at p inclusive. Empty documents yield no
    * rows (a zero-length text has nothing to chunk).
    *
    * `normalize = true` NFC-normalizes the text FIRST (the shingleSets
    * flag's rationale: an encoding variant shifts every rolling-hash
    * window over accented text, so boundaries land elsewhere and no
    * chunk hash ever matches). Chunk spans and the lossless
    * reconstruction property then refer to the NORMALIZED text — the
    * coordinate space every downstream consumer of the flag sees
    * consistently.
    */
  def cdcChunks(docs: DataFrame, idCol: String, textCol: String,
                window: Int = 8, div: Long = 64L,
                normalize: Boolean = false): DataFrame = {
    val t = if (normalize) graft.functions.NfcNormalize(col(textCol))
            else col(textCol)
    val b = graft.functions.CdcBoundaries(t, window = window, div = div)
    docs
      .select(col(idCol).as("doc_id"), t.as("text"), b.as("b"))
      .withColumn("starts", concat(array(lit(1)), transform(col("b"), _ + 1)))
      .withColumn("ends", concat(col("b"), array(length(col("text")))))
      .select(col("doc_id"), col("text"),
        posexplode(zip_with(col("starts"), col("ends"),
          (st, en) => struct(st.as("st"), en.as("en")))).as(Seq("chunk_idx", "se")))
      // the empty tail chunk when the last boundary IS the last char:
      // st > en there, and on empty docs st=1 > en=0 — drop both
      .filter(col("se.st") <= col("se.en"))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        expr("substring(text, se.st, se.en - se.st + 1)").as("chunk"),
        // the BUILD-CONFIG record (constant — free under parquet RLE):
        // chunks cut at another (window, div) or in the other
        // normalization mode hash to different boundaries entirely, so
        // a persisted chunk state probed by a mismatched batch silently
        // reports "no duplication" — the incremental leg validates this
        // record instead (the shingleSets/anchors discipline)
        lit(s"w=$window,div=$div,nfc=$normalize").as("cfg"))
  }

  /** Chunk clusters repeated across documents: group [[cdcChunks]]
    * output by chunk hash, keep clusters spanning >= 2 DISTINCT docs
    * and chunks of at least `minChunkLen` chars (sub-window fragments
    * carry no dedup signal). Output one row per repeated chunk —
    * (chunk_hash, n_docs, n_occurrences, chunk_len, docs) — the
    * cross-document duplication manifest.
    *
    * Scale note: the `docs` membership list is Θ(cluster size) — a
    * license paragraph repeated across 10^8 documents makes that one
    * row a straggler. It exists for the correctness gate and forensic
    * drill-down at test scale; nothing downstream consumes it
    * ([[stripShared]] re-derives the owner with a min aggregation, and
    * the incremental path keeps per-(chunk, doc) state). At corpus
    * scale project it out — the scalar columns are all map-side
    * combinable.
    */
  def crossDocChunks(chunks: DataFrame, minChunkLen: Int = 16): DataFrame =
    clusterAgg(chunkPairState(chunks, minChunkLen))

  /** The cluster aggregation over per-(chunk, doc) state rows — ONE
    * definition shared by [[crossDocChunks]] and
    * [[crossDocChunksAgainst]], so the spec-pinned manifest merge rule
    * (old untouched rows ∪ incremental rows == full recompute) can
    * never drift apart by editing one copy. Rows are unique per
    * (chunk_hash, doc_id) by [[chunkPairState]] construction, so
    * `count(1)` IS the distinct doc count; the physical plan is the
    * same two-level (hash, doc) → (hash) aggregate Catalyst's
    * single-distinct rewrite produces for a direct countDistinct.
    */
  /** Loud build-config validation for the incremental chunk leg: the
    * batch's chunker params + minChunkLen must equal the persisted
    * state's recorded ones — mismatched boundaries/thresholds hash to
    * disjoint chunk populations and the silent answer would be "no
    * duplication". One limit-1 read per side (constant columns).
    */
  private def requireChunkCompat(newState: DataFrame,
                                 state: DataFrame): Unit = {
    import org.apache.spark.sql.types.StringType
    def cfgOf(df: DataFrame, side: String): Option[String] =
      df.schema.fields.find(_.name == "cfg").map(_.dataType) match {
        case Some(StringType) =>
          df.select(col("cfg")).limit(1).collect().headOption.map(_.getString(0))
        case None => throw new IllegalArgumentException(
          s"crossDocChunksAgainst: the $side records no `cfg` column — a " +
            "pre-record chunk state; rebuild with cdcChunks + chunkPairState " +
            "so build-config compatibility is verifiable")
        case other => throw new IllegalArgumentException(
          s"crossDocChunksAgainst: expected a StringType cfg column on the $side, found $other")
      }
    (cfgOf(newState, "batch"), cfgOf(state, "state")) match {
      case (Some(a), Some(b)) => require(a == b,
        s"crossDocChunksAgainst: batch chunked with ($a) but the state with " +
          s"($b) — chunk hashes cannot match and duplication would be " +
          "silently missed; rebuild one side")
      case _ => ()
    }
  }

  private def clusterAgg(pairState: DataFrame): DataFrame =
    pairState
      .groupBy(col("chunk_hash"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_occ")).as("n_occurrences"),
        min(col("len")).as("chunk_len"),
        array_join(transform(array_sort(collect_set(col("doc_id"))),
          _.cast("string")), ",").as("docs"))
      .filter(col("n_docs") >= 2)

  /** Per-(chunk, doc) occurrence state — the persisted form of the
    * chunk index an incremental corpus maintains: one row per
    * (chunk_hash, doc_id) with its occurrence count and chunk length.
    * Mergeable across disjoint-doc batches by plain union (no re-read
    * of old text), and exactly sufficient to rebuild every
    * [[crossDocChunks]] cluster. Partition the stored table by
    * `chunk_hash` so [[crossDocChunksAgainst]]'s semi-join prunes at
    * the source — ChunkDedupSpec's bucketed pin asserts the corpus
    * side of that join moves ZERO bytes under matched parallelism
    * (bucket count == shuffle partitions, the lake-scale sizing).
    *
    * Streams as written: [[cdcChunks]] is stateless per-row and this
    * aggregation is distinct-free, so a streaming ingest maintains the
    * state table directly — StreamingSpec pins complete-mode streaming
    * == batch exactly on the planted-paragraph fixture, chunked across
    * micro-batches. With ChunkDedupSpec's manifest-merge pin this
    * closes the three-implementation discipline for the chunk tier:
    * batch (q187–q189 oracles), incremental (merge rule == full
    * recompute), streaming (state == batch).
    */
  def chunkPairState(chunks: DataFrame, minChunkLen: Int = 16): DataFrame = {
    // hand-built chunk frames (alternative chunkers — e.g. the spec's
    // fixed-width contrast) are legitimate for the batch path and carry
    // an explicit "unrecorded" config: the incremental guard then
    // matches unrecorded-vs-unrecorded and refuses a recorded state
    // probed by an unrecorded batch (or vice versa) — still loud where
    // it matters, never a resolution error on the batch path
    val src = if (chunks.columns.contains("cfg")) chunks
              else chunks.withColumn("cfg", lit("unrecorded"))
    src
      .filter(length(col("chunk")) >= minChunkLen)
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("len"),
        // extend the chunker's config record with this state's own
        // parameter: a state filtered at another minChunkLen holds a
        // different chunk population, so the merge rule's "untouched
        // rows stay valid" premise breaks silently
        concat_ws(",", col("cfg"), lit(s"min=$minChunkLen")).as("cfg"))
      .groupBy(col("chunk_hash"), col("doc_id"), col("cfg"))
      .agg(count(lit(1)).as("n_occ"), min(col("len")).as("len"))
  }

  /** Incremental cross-document chunk clusters: a NEW batch of chunked
    * docs against the persisted [[chunkPairState]] of the prior corpus
    * (disjoint doc sets — the jaccardPairsAgainst contract, enforced by
    * the same loud probe). Returns the UPDATED cluster rows for every
    * chunk hash the new batch touches, with full old+new membership and
    * the [[crossDocChunks]] schema; stored clusters for untouched
    * hashes remain valid as-is, so the manifest merge rule is
    * (spec-pinned): old rows for untouched hashes ∪ this output ==
    * crossDocChunks(old ∪ new).
    *
    * Per-batch cost scales with the BATCH, not the corpus: the old
    * state is left-semi-restricted to hashes present in the new batch
    * BEFORE any aggregation, and the union re-aggregates only those
    * rows. A new crawl never re-chunks or re-reads old text.
    */
  def crossDocChunksAgainst(newChunks: DataFrame, state: DataFrame,
                            minChunkLen: Int = 16): DataFrame = {
    val newState = chunkPairState(newChunks, minChunkLen)
    requireChunkCompat(newState, state)
    // state side deliberately NOT distinct'd: semi-join semantics
    // ignore right-side duplicates, and a corpus-scale exchange per
    // batch would break the batch-scaled-cost contract
    val dup = newState.select(col("doc_id")).distinct()
      .join(state.select(col("doc_id")), Seq("doc_id"), "left_semi")
      .limit(1).collect()
    require(dup.isEmpty,
      s"crossDocChunksAgainst batch overlaps the state (e.g. doc=${dup.headOption.map(_.get(0)).orNull}): " +
        "the incremental contract requires disjoint doc sets")
    val touched = newState.select(col("chunk_hash")).distinct()
    val relevantOld = state.join(touched, Seq("chunk_hash"), "left_semi")
    // disjoint doc sets keep (hash, doc) uniqueness across the union,
    // so the SHARED cluster aggregation applies unchanged
    clusterAgg(newState.unionByName(relevantOld))
  }

  /** The removal transform over the same chunk space: strip every
    * cross-document repeated chunk from all but its FIRST occurrence
    * (owner = the minimum `doc_id` carrying the chunk — deterministic,
    * engine-independent), keeping host documents intact otherwise.
    * Sub-`minChunkLen` chunks are never stripped (they carry no dedup
    * signal and would shred text). Output is one row per chunked doc:
    * total/stripped character mass, stripped-chunk count, and the md5
    * of the kept text (chunks re-concatenated in `chunk_idx` order with
    * stripped spans removed) — compact and exactly verifiable without
    * shipping corpus-sized text through the gate.
    *
    * Plan: one shuffle on `chunk_hash` for the min-owner aggregation, a
    * join back on the SAME key (co-partitioned — no extra exchange on
    * the aggregated side), one final aggregation on `doc_id` to
    * reassemble. No broadcast assumption: the owner table is one row
    * per distinct long chunk, corpus-scale at 100 TB, so the join must
    * survive as a shuffled join (it does — no hint pins a broadcast).
    * Intra-document repeats of a chunk all stay with the owner doc:
    * cross-document dedup never rewrites the canonical copy.
    */
  def stripShared(chunks: DataFrame, minChunkLen: Int = 16): DataFrame = {
    val hashed = chunks
      .withColumn("chunk_hash", md5(col("chunk").cast("binary")))
      .withColumn("len", length(col("chunk")).cast("long"))
    val owners = hashed
      .filter(col("len") >= minChunkLen)
      .groupBy(col("chunk_hash"))
      .agg(min(col("doc_id")).as("owner"))
    hashed
      .join(owners, Seq("chunk_hash"), "left")
      // short chunks never match owners (same content implies same
      // length), so `owner` is non-null exactly where len >= min;
      // false && null = false keeps the flag two-valued
      .withColumn("strip",
        col("len") >= minChunkLen && col("doc_id") > col("owner"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("len")).as("total_chars"),
        sum(when(col("strip"), col("len")).otherwise(0L)).as("stripped_chars"),
        sum(when(col("strip"), 1L).otherwise(0L)).as("n_stripped_chunks"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("chunk_idx"),
            when(col("strip"), lit("")).otherwise(col("chunk")).as("chunk")))),
          x => x.getField("chunk")), "").cast("binary")).as("kept_md5"))
  }

  /** Per-document duplicated-mass profile over the SAME clusters: how
    * many of each doc's chunks (and characters) also appear in some
    * OTHER document — the per-doc quality signal a curation gate
    * thresholds on (a doc that is mostly repeated passages is
    * boilerplate even if no single whole-doc duplicate exists).
    * `n_chunks`/`total_chars` cover ALL of the doc's chunks; sharing is
    * assessed only on chunks ≥ minChunkLen (the same floor stripShared
    * enforces — sub-floor chunks can never be shared mass, but they ARE
    * the doc's mass, so q188.total_chars == q189.total_chars for every
    * doc and a doc whose chunks are all short keeps its zero row rather
    * than vanishing from the profile). Documents with zero shared
    * chunks keep a zero row, so the profile covers every chunked doc,
    * not just the offenders. Plan: one aggregation on chunk_hash over
    * the eligible subset, one left join back co-partitioned on the same
    * key, one final aggregation on doc_id — never a broadcast
    * assumption about the duplicated-mass volume, which at corpus scale
    * is unbounded. (An ineligible chunk can never hash-join an eligible
    * count row: identical content implies identical length.)
    */
  def duplicatedMass(chunks: DataFrame, minChunkLen: Int = 16): DataFrame = {
    val base = chunks
      .select(col("doc_id"), md5(col("chunk").cast("binary")).as("chunk_hash"),
        length(col("chunk")).cast("long").as("len"))
    val counts = base.filter(col("len") >= minChunkLen)
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col("doc_id")).as("nd"))
    base.join(counts, Seq("chunk_hash"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(col("len")).as("total_chars"),
        sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared_chunks"),
        sum(when(col("nd") >= 2, col("len")).otherwise(0L)).as("shared_chars"))
  }
}
