package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.queries.PipelineQueries.MultiChain

/** Deployment driver for the LLM corpus build — the
  * [[graft.cnpj.IngestJob]] counterpart for the q226 pipeline (the
  * reference ships a dir-parameterized ingest state machine; a corpus
  * build deploys the same way: directories in, lake tables + artifacts
  * out, never fixtures).
  *
  * Reads real `.warc.gz` crawl shards from `shardsDir` (the
  * [[graft.sources.Warc]] documented scan: `binaryFile` → per-file
  * scalar demux, embarrassingly parallel, no shuffle), drives the SAME
  * stage functions the gated composition rows use
  * ([[graft.queries.PipelineQueries.MultiChain]] — one copy, so the row
  * and the job cannot drift), and materializes
  *
  *   - `<lakeDir>/extracted|cleaned|cur|cur_keys|anchors|token_windows|
  *     pred|routed|tagged|spans|manifest` — parquet stage tables
  *     (`manifest` is the per-doc keep audit, the q228 shape — see
  *     [[MultiChain.keepManifest]]);
  *   - `<lakeDir>/mixed` — the final mix, PARTITIONED by `pred_lang`
  *     (downstream per-language consumers prune at the directory
  *     level);
  *   - `<lakeDir>/alloc_spent` — the per-cell token spend LEDGER under
  *     the persisted allocation (what makes the global budget reading
  *     possible across waves);
  *   - `<lakeDir>/ccnet_pair` — the frozen serving pair
  *     ([[graft.operators.CcnetServing]]): the artifact the NEXT wave's
  *     incremental pass tags with (the q228 leg);
  *   - `<lakeDir>/allocation` — the mixing allocation
  *     ([[graft.operators.Sampling]]): cells + seed + tokenizer
  *     fingerprint, the replayable mix decision.
  *
  * Each stage READS the previous stage's materialized table, never its
  * lineage: per-stage restartability, O(1) Catalyst planning per stage
  * (the r17 lineage-cut lesson applied structurally), and the exact
  * deployment shape the memoized fixture rows model — their persisted
  * frames stand in for these tables.
  *
  * Idempotency: every stage write is `mode("overwrite")`, and the
  * partitioned `mixed` table overwrites STATICALLY — [[run]] is a FULL
  * rebuild, so a partition for a language the new input no longer
  * produces must vanish, not linger (the session's dynamic mode is the
  * right default for per-partition incremental writers like the cnpj
  * `ref_date` snapshots, `cnpj/Ingest.scala:94-101`, not for
  * rebuilds). Re-running the job over the same shards is a no-op at
  * value level, spec-pinned in CorpusBuildJobSpec.
  *
  * The LID router is a FROZEN pretrained artifact passed by directory —
  * a crawl never trains its own router (Wenzek et al. 2020 §4.2 deploy
  * fastText LID as a fixed model); the job refuses a gram-length-skewed
  * artifact by name before touching any data.
  */
object CorpusBuildJob {

  /** One row per materialized stage table / artifact, in build order. */
  final case class StageResult(name: String, path: String, rows: Long)

  /** The wave-level COMMIT MARKER (ADVICE r18): a wave's state tables
    * commit per-table (`_SUCCESS`), so a wave that crashes AFTER
    * materializing cur/anchors/token_windows but BEFORE its manifest
    * would otherwise leave committed dedup state for a wave that never
    * entered the corpus — and if that wave is then abandoned or
    * renumbered (as the gate messages advise), a later doc could
    * silently die as a "duplicate" of a doc that was never ingested.
    * [[runIncremental]] deletes this marker before its first write and
    * re-creates it only after the LAST table lands; [[stateTables]]
    * layers and [[compactState]] absorbs ONLY marked waves, so a
    * half-written wave contributes nothing until it completes.
    */
  private[graft] val WaveMarker = "_WAVE_COMMITTED"

  /** The compact exact-dedup state (VERDICT r19 #1): `(doc_id, key)`
    * with `key = md5(NFC text)` — what [[runIncremental]]'s cross-wave
    * election and id-space gate scan instead of re-hashing the entire
    * old corpus text every wave. The full-text `cur` table remains a
    * state too, but is read ONLY by the anchor-verification leg
    * ([[graft.operators.SubstrDedup.dupSpansAgainst]]), which
    * semi-joins it down to the anchor-touched docs before any text
    * moves.
    */
  private[graft] def curKeys(cur: DataFrame): DataFrame =
    cur.select(col("doc_id"), md5(col("text")).as("key"))

  /** The cross-wave exact-dedup election against the KEY state: a new
    * doc whose canonical text hash already exists in the layered
    * `cur_keys` loses to the old copy. Hashing happens only on the NEW
    * wave's text; the state side is a 32-hex-char column scan.
    */
  private[graft] def electAgainstKeys(within: DataFrame,
                                      oldKeys: DataFrame): DataFrame =
    within.join(oldKeys.select(col("key")),
      md5(within("text")) === col("key"), "left_anti")

  /** The per-cell token spend this run/wave contributed under the
    * allocation — one row per (lang, bucket) cell actually selected
    * into `mixed`, stamped with the source wave ("" for the initial
    * build; rows stay unique per wave so compaction's set-union can
    * never collapse two waves that happened to spend equal amounts)
    * and the allocation fingerprint the spend is denominated under.
    */
  private def spentLedger(mixed: DataFrame, fp: Long,
                          wave: String): DataFrame =
    mixed.groupBy(col("pred_lang").as("lang"), col("bucket"))
      .agg(sum(col("n_tok")).as("spent_tokens"))
      .withColumn("wave", lit(wave))
      .withColumn("alloc_fp", lit(fp))

  /** `benchDir` (optional): a parquet directory of `(doc_id, text)`
    * benchmark documents. When present, the run records every curated
    * doc sharing a 13-token BPE window with the benchmark set
    * (`contaminated` table — the PaLM doc-drop stance, q213) and
    * EXCLUDES those docs from the mix; the registry itself persists as
    * `<lakeDir>/bench` so later waves test against it. The
    * token-window index persists as state REGARDLESS — benchmarks
    * arrive after ingest in production (the q228 retroactive-flip
    * story), and an index built at ingest time is what makes a late
    * probe wave-sized instead of corpus-sized.
    *
    * The materialized `manifest` is the AUDIT surface (the wave keep
    * rule over the initial corpus: within-corpus duplication permille,
    * contamination, bucket); the initial MIX itself remains the q226
    * budget-only contract (registry exclusion + per-cell budgets —
    * oracle-pinned by q230/q231), while waves additionally apply the
    * keep rule before mixing (the q228 contract).
    */
  def run(spark: SparkSession, shardsDir: String, lakeDir: String,
          lidDir: String, benchDir: Option[String] = None)
      : Seq[StageResult] = {
    import spark.implicits._
    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    def materialize(name: String, df: DataFrame,
                    partitionCols: Seq[String] = Seq.empty,
                    fullRebuild: Boolean = false): DataFrame = {
      val path = s"$lakeDir/$name"
      val w = df.write.mode("overwrite")
      val w2 = if (fullRebuild)
        w.option("partitionOverwriteMode", "static") else w
      (if (partitionCols.nonEmpty) w2.partitionBy(partitionCols: _*) else w2)
        .parquet(path)
      val back = spark.read.parquet(path)
      results += StageResult(name, path, back.count())
      back
    }

    // the router gate runs FIRST: a skewed artifact must fail before
    // the job spends a single task on the shards
    val lid = graft.operators.LangId.load(spark, lidDir)
    graft.operators.LangId.requireCompatible(lid, 2)

    // 1+2: shard scan -> demux -> HTTP -> line-preserving extraction
    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .load(shardsDir)
      .select(col("content")).as[Array[Byte]]
    val extracted = materialize("extracted",
      MultiChain.extract(MultiChain.pagesFromBlobs(spark, blobs)))
    // 3: C4 line clean
    val cleaned = materialize("cleaned", MultiChain.c4Clean(extracted))
    // 4: NFC canonicalize + exact-dedup election
    val cur = materialize("cur", MultiChain.nfcDedup(cleaned))
    // the COMPACT exact-dedup state for corpus growth: 16-byte keys, no
    // text — what every later wave's election and id gate actually scan
    materialize("cur_keys", curKeys(cur))
    // the winnow-anchor table over the curated corpus is what
    // [[runIncremental]] probes new waves against without re-reading
    // this one (the q228 leg) — compact (positions + 64-bit anchors,
    // no text), norm bit recorded
    materialize("anchors", graft.operators.SubstrDedup.anchors(cur))
    // the TOKEN-WINDOW state: built at ingest time even with no
    // benchmark in hand — a benchmark that arrives later probes THIS
    // index (contaminationTokenSpansAgainst) at new-bench cost instead
    // of re-tokenizing the corpus (the q228 doc-106 leg)
    materialize("token_windows",
      graft.operators.TokenDecontam.tokenWindowIndex(cur))
    // benchmark decontamination, when a registry exists at build time:
    // the hit record is a stage table (audit — window spans per doc),
    // the drop applies at the MIX boundary (tagged still covers every
    // doc, so the tag table stays a full-corpus audit surface)
    val contaminatedIds = benchDir.map { bd =>
      val bench = spark.read.parquet(bd)
      materialize("bench", bench)
      materialize("contaminated", graft.operators.TokenDecontam
          .contaminationTokenSpans(cur, bench))
        .select(col("doc_id")).distinct()
    }
    // 5: frozen-router LID + length-normalized confidence routing
    val pred = materialize("pred",
      graft.operators.LangId.predict(cur, lid))
    val routed = materialize("routed", MultiChain.route(cur, pred))
    // 6: self-trained LM terciles keyed on the PREDICTED language; the
    // (model, cuts) pair persists as ONE artifact for the next wave
    val lm = MultiChain.lmModel(routed,
      _.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val scored = MultiChain.scoredFrame(routed, lm)
    // the cuts frame (per-language quantiles over the scored corpus)
    // is consumed four times (save's null gate, the artifact write,
    // the count, the tag join) — persist the |languages|-row table
    // instead of re-running the quantile aggregation each time
    // (review r18)
    val cuts = MultiChain.cuts(scored)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    graft.operators.CcnetServing.save(s"$lakeDir/ccnet_pair",
      graft.operators.TextModelSeam.localize(lm), cuts)
    results += StageResult("ccnet_pair", s"$lakeDir/ccnet_pair",
      cuts.count())
    val tagged = materialize("tagged", MultiChain.tagged(scored, cuts))
    lm.unigrams.unpersist(); lm.bigrams.unpersist(); cuts.unpersist()
    // the within-corpus substring span table + the per-doc keep
    // manifest (VERDICT r19 #3: the initial build previously had no
    // per-doc audit surface — waves did; ONE copy of the keep rule,
    // [[MultiChain.keepManifest]], serves both)
    val spans = materialize("spans",
      graft.operators.SubstrDedup.dupSpans(cur))
    materialize("manifest", MultiChain.keepManifest(tagged,
      MultiChain.dupPermille(cur, spans), contaminatedIds))
    // 7: the persisted mixing allocation + the token-budget mix
    val cells = MultiChain.budgetCells(tagged)
    graft.operators.Sampling.saveAllocation(s"$lakeDir/allocation", cells,
      Seq("lang", "bucket"), "token_budget", seed = MultiChain.MixSeed)
    results += StageResult("allocation", s"$lakeDir/allocation",
      cells.count())
    val alloc = graft.operators.Sampling.loadAllocation(spark,
      s"$lakeDir/allocation")
    val mixBase = contaminatedIds
      .map(c => tagged.join(c, Seq("doc_id"), "left_anti"))
      .getOrElse(tagged)
    // STATIC partition overwrite for the partitioned table: run() is a
    // FULL rebuild, and the session's dynamic mode would leave a stale
    // pred_lang= directory behind when a re-run no longer produces
    // that language (review r18) — dynamic is for per-partition
    // incremental writers (the cnpj ref_date shape), not rebuilds
    val mixed = materialize("mixed",
      MultiChain.mixed(MultiChain.mixInput(mixBase, routed), alloc),
      partitionCols = Seq("pred_lang"), fullRebuild = true)
    // the SPEND LEDGER under the persisted allocation (VERDICT r19 #2):
    // the tokens this build consumed per cell, the base state the
    // global budget reading charges waves against
    materialize("alloc_spent", spentLedger(mixed,
      graft.operators.Sampling.allocationFingerprint(alloc), wave = ""))
    results.toSeq
  }

  /** All committed copies of one state table across the lake: the
    * initial build's plus every prior COMMITTED wave's
    * (`waves/<w>/<name>` where the wave carries its [[WaveMarker]] — a
    * wave that crashed mid-run has per-table `_SUCCESS` files but no
    * marker, and its state must NOT layer: its docs never entered the
    * corpus, so deduping against them would silently kill legitimate
    * re-ingests, ADVICE r18), EXCLUDING `excludeWave` — a wave re-run
    * must never treat its own previous output as prior state, or every
    * doc would dedup against itself. Wave order is name-sorted for
    * determinism (row order is irrelevant — every consumer aggregates
    * or joins).
    */
  private def stateTables(spark: SparkSession, lakeDir: String,
                          name: String, excludeWave: String)
      : Seq[DataFrame] = {
    def committed(p: java.nio.file.Path): Option[DataFrame] =
      if (java.nio.file.Files.exists(p.resolve("_SUCCESS")))
        Some(spark.read.parquet(p.toString))
      else None
    // a committed compaction scratch with NO base table is the
    // signature of a crash inside compactState's swap window — the
    // state is intact (the scratch IS the full union) but not yet in
    // place; refuse by name rather than serving waves-only state that
    // silently forgets the initial corpus (review r18)
    require(!(java.nio.file.Files.exists(java.nio.file.Paths
          .get(lakeDir, s"__compact_$name", "_SUCCESS"))
        && !java.nio.file.Files.exists(
          java.nio.file.Paths.get(lakeDir, name, "_SUCCESS"))),
      s"$lakeDir: an interrupted compaction left `__compact_$name` " +
        s"committed but no `$name` base table — re-run " +
        "CorpusBuildJob.compactState to finish the swap before " +
        "processing more waves")
    val wavesRoot = java.nio.file.Paths.get(lakeDir, "waves")
    val fromWaves =
      if (!java.nio.file.Files.exists(wavesRoot)) Seq.empty
      else listDir(wavesRoot)
        .sortBy(_.getFileName.toString)
        .filter(_.getFileName.toString != excludeWave)
        .filter(w => java.nio.file.Files.exists(w.resolve(WaveMarker)))
        .flatMap(w => committed(w.resolve(name)))
    committed(java.nio.file.Paths.get(lakeDir, name)).toSeq ++ fromWaves
  }

  /** `Files.list` with the stream CLOSED (an unclosed DirectoryStream
    * leaks one fd per call until GC — review r18).
    */
  private def listDir(p: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(p)
    try s.iterator().asScala.toVector finally s.close()
  }

  private def unionState(spark: SparkSession, lakeDir: String,
                         name: String, excludeWave: String)
      : Option[DataFrame] =
    stateTables(spark, lakeDir, name, excludeWave)
      .reduceOption(_.unionByName(_))

  /** Spec accessor: the layered union of one state table (what
    * [[runIncremental]] actually probes), exposed so CorpusBuildJobSpec
    * can assert the election frame's inputs structurally.
    */
  private[graft] def layeredState(spark: SparkSession, lakeDir: String,
                                  name: String,
                                  excludeWave: String = ""): Option[DataFrame] =
    unionState(spark, lakeDir, name, excludeWave)

  /** State COMPACTION: absorb every COMMITTED wave's state tables into
    * the base lake tables, so the per-wave union read ([[stateTables]])
    * goes back to one table per state regardless of how many waves have
    * landed — the union-read cost is linear in wave count, and all the
    * states are PLAIN UNIONS (doc-keyed corpus text and keys, anchor
    * rows, window rows, benchmark docs, wave-stamped spend rows), so
    * compaction is one rewrite per state with no semantics to
    * re-derive. An UNCOMMITTED wave (no [[WaveMarker]] — a mid-run
    * crash) is never absorbed: its state is not real corpus state.
    * Value-preservation is spec-pinned: a duplicate of an absorbed
    * wave's doc still dies, and the retro probe still reaches absorbed
    * docs.
    *
    * Write discipline, CRASH-SAFE at every window (review r18 — the
    * first cut could lose the base table between delete and move):
    *
    *   1. write the deduplicated union to `__compact_<name>` (scratch);
    *   2. delete the base table;
    *   3. move the scratch into place;
    *   4. delete the absorbed wave copies.
    *
    * A crash after (1) leaves a stale scratch beside an intact base —
    * the next compaction deletes and rebuilds it. A crash between (2)
    * and (3) leaves the committed scratch as the ONLY full copy;
    * [[stateTables]] refuses that lake by name and re-running
    * compactState FINISHES THE SWAP (the recovery branch below, which
    * first clears any partial base left by a crash mid-delete — ADVICE
    * r18) — state is never lost, merely not yet in place. A crash
    * after (3) leaves wave copies that the next compaction re-absorbs;
    * the dedup makes that re-absorption row-exact instead of
    * row-doubling. Re-running a completed compaction is a no-op.
    * Single-writer lake assumed, same as every overwrite in this job.
    *
    * DEDUP SHAPE (VERDICT r19 "missing" #3): the doc-keyed states
    * (`cur`, `cur_keys`) do NOT pay a full-row DISTINCT — wave
    * id-spaces are disjoint by the id gate, so outside the
    * crash-re-absorption window the union is already a set keyed by
    * doc_id. Compaction probes for duplicate ids with a column-pruned
    * key-sized aggregation first and falls back to a doc_id-keyed
    * dedup only when a re-absorption actually duplicated rows — the
    * common path rewrites corpus text WITHOUT shuffling it. The
    * remaining states are compact rows (anchors/windows/spend) or
    * benchmark-sized (`bench`) and keep the set-union DISTINCT.
    *
    * Compaction FREEZES the absorbed waves: their ids now live in the
    * base tables, so re-running an absorbed wave refuses at the
    * id-space gate exactly like any out-of-order replay (the
    * latest-wave idempotent-re-run guarantee holds only BEFORE that
    * wave is compacted — spec-pinned both ways).
    */
  def compactState(spark: SparkSession, lakeDir: String)
      : Seq[StageResult] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    val wavesRoot = java.nio.file.Paths.get(lakeDir, "waves")
    StateTableNames.foreach { name =>
      val base = java.nio.file.Paths.get(lakeDir, name)
      val scratch = java.nio.file.Paths.get(lakeDir, s"__compact_$name")
      // recovery: a committed scratch with no base is a crash inside
      // the previous swap — finish it (the scratch was the full union
      // when written, and stateTables refuses the lake until then, so
      // nothing can have changed since)
      if (java.nio.file.Files.exists(scratch.resolve("_SUCCESS"))
          && !java.nio.file.Files.exists(base.resolve("_SUCCESS"))) {
        // a crash MID-delete of the base (after its _SUCCESS went but
        // before the dir root) leaves a partial base directory that
        // would make the move throw FileAlreadyExists — clear it first;
        // safe because the committed scratch is the full union whenever
        // the base lacks _SUCCESS (ADVICE r18)
        graft.queries.PipelineQueries.deleteRecursively(base)
        java.nio.file.Files.move(scratch, base)
      }
      val waveCopies =
        if (!java.nio.file.Files.exists(wavesRoot)) Seq.empty
        else listDir(wavesRoot)
          .sortBy(_.getFileName.toString)
          .filter(w => java.nio.file.Files.exists(w.resolve(WaveMarker)))
          .map(_.resolve(name))
          .filter(p => java.nio.file.Files.exists(p.resolve("_SUCCESS")))
      if (waveCopies.isEmpty && java.nio.file.Files.exists(scratch))
        // a stale scratch beside an intact base (crash after step 1)
        // has nothing to contribute — clear it
        graft.queries.PipelineQueries.deleteRecursively(scratch)
      if (waveCopies.nonEmpty) {
        val all = stateTables(spark, lakeDir, name, excludeWave = "")
          .reduce(_.unionByName(_))
        val compacted =
          if (DocKeyedStates(name)) {
            // duplicate-id probe: one column-pruned aggregation over the
            // id column; clean (the common case) -> plain union write,
            // no text shuffle; dirty (crash re-absorption) -> doc-keyed
            // dedup (the copies are identical rows, so any survivor is
            // the right one)
            val hasDup = all.groupBy(col("doc_id"))
              .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
              .limit(1).collect().nonEmpty
            if (hasDup) all.dropDuplicates("doc_id") else all
          } else all.distinct()
        compacted.write.mode("overwrite").parquet(scratch.toString)
        graft.queries.PipelineQueries.deleteRecursively(base)
        java.nio.file.Files.move(scratch, base)
        waveCopies.foreach(graft.queries.PipelineQueries.deleteRecursively)
        results += StageResult(name, base.toString,
          spark.read.parquet(base.toString).count())
      }
    }
    results.toSeq
  }

  /** The state tables [[runIncremental]] layers and [[compactState]]
    * absorbs.
    */
  private val StateTableNames =
    Seq("cur", "cur_keys", "anchors", "token_windows", "bench",
      "alloc_spent")

  /** States keyed by `doc_id` whose compaction takes the shuffle-free
    * path (see [[compactState]]'s dedup-shape note).
    */
  private val DocKeyedStates = Set("cur", "cur_keys")

  /** The CORPUS-GROWTH leg (the q228 shape, dir-parameterized): process
    * a NEW wave of `.warc.gz` shards against a prior [[run]]'s lake —
    * the old corpus is touched ONLY through its persisted states:
    *
    *   - `<lakeDir>/cur_keys` — 16-byte md5 keys for the cross-wave
    *     exact-dedup election AND the id-space gate (no old text is
    *     read or re-hashed on this leg — VERDICT r19 #1);
    *   - `<lakeDir>/anchors` (+ `<lakeDir>/cur` for the verification
    *     semi-join over anchor-touched docs only) — the winnow-anchor
    *     state (`dupSpansAgainst`: per-wave cost scales with the wave
    *     plus the genuinely-duplicated old mass);
    *   - `<lakeDir>/ccnet_pair` — the FROZEN serving pair: the new
    *     wave is tagged with wave-1's model and cuts, never a
    *     re-estimation (re-estimating per wave would re-bucket history
    *     — the published CCNet deployment freezes the pair);
    *   - `<lakeDir>/allocation` + `<lakeDir>/alloc_spent` — the
    *     persisted mix under the GLOBAL budget reading (default): each
    *     wave samples only the REMAINDER of every cell's budget after
    *     the spend recorded by the initial build and every prior wave
    *     (`cumulativeBudget = false` keeps the per-wave-quota reading:
    *     each wave re-spends the full per-cell budget).
    *
    * Stage tables land under `<lakeDir>/waves/<waveName>/…`, overwrite
    * mode — re-running the LATEST wave is idempotent (its own state
    * dirs are excluded from the prior-state union, including its own
    * spend rows). Prior state LAYERS: every earlier COMMITTED wave's
    * state tables union with the initial build's, so wave N dedups and
    * probes against all of waves 1..N-1 at compact-state cost.
    * Replaying an EARLIER wave after later ones landed refuses at the
    * id-space gate (by then its ids no longer exceed the layered max)
    * — out-of-order replay is a loud error, never a silent dedup
    * against the future.
    *
    * Gates, all loud and all BEFORE the first write: router n,
    * pair/allocation manifests, the spend ledger's allocation
    * fingerprint, anchor norm bit (inside `dupSpansAgainst`), the
    * ID-SPACE gate (every new doc_id must exceed every old one,
    * because the min-id dedup election is only incremental ==
    * from-scratch under that order), the empty-wave gate, and the
    * LANGUAGE-INVENTORY gate (ADVICE r18): every language the wave
    * ROUTES must have a cut row in the frozen pair and a cell
    * inventory entry in the allocation — otherwise the failure would
    * fire MID-run (CcnetServing.tag's raise_error) after the wave's
    * state tables committed. The wave's [[WaveMarker]] is deleted
    * before the first write and re-created after the last, so a
    * mid-run crash leaves an UNCOMMITTED wave that no later wave
    * layers over (the same silent-corruption class, closed
    * structurally). Stated crash-window tradeoff: a RE-run of an
    * already-committed wave that crashes mid-way also retracts that
    * wave's marker — its tables are then a mix of old and new writes,
    * and not-layering the ambiguous state is the recoverable side
    * (re-running the wave to completion restores it; an idempotent
    * re-run rewrites identical tables, so only the marker was ever at
    * stake). The alternative — a stale marker over half-new tables —
    * would layer WRONG state silently.
    *
    * keep = `contaminated == 0 && dup_permille <= 300 && bucket !=
    * tail` (the q228 rule, ONE copy — [[MultiChain.keepManifest]]).
    *
    * `newBenchDir` (optional): a parquet dir of benchmark documents
    * that ARRIVED WITH THIS WAVE. Two probes run: (a) the new
    * benchmark against the lake's PERSISTED token-window index —
    * `retro_contaminated` records OLD docs that flip contaminated
    * retroactively (the q228 doc-106 shape: cost scales with the new
    * benchmark, never the old corpus); (b) the new WAVE against every
    * benchmark known so far (the initial registry plus this wave's).
    * The wave also materializes its own key/anchor/window/spend state
    * tables so future waves can layer over them.
    */
  def runIncremental(spark: SparkSession, newShardsDir: String,
                     lakeDir: String, lidDir: String, waveName: String,
                     newBenchDir: Option[String] = None,
                     cumulativeBudget: Boolean = true)
      : Seq[StageResult] = {
    import spark.implicits._
    val waveDir = s"$lakeDir/waves/$waveName"
    val results = scala.collection.mutable.ArrayBuffer.empty[StageResult]
    def materialize(name: String, df: DataFrame): DataFrame = {
      val path = s"$waveDir/$name"
      df.write.mode("overwrite").parquet(path)
      val back = spark.read.parquet(path)
      results += StageResult(name, path, back.count())
      back
    }
    // every state gate fires BEFORE shard work
    val lid = graft.operators.LangId.load(spark, lidDir)
    graft.operators.LangId.requireCompatible(lid, 2)
    val pair = graft.operators.CcnetServing.load(spark, s"$lakeDir/ccnet_pair")
    val alloc = graft.operators.Sampling.loadAllocation(spark,
      s"$lakeDir/allocation")
    val allocFp = graft.operators.Sampling.allocationFingerprint(alloc)
    // prior state is the UNION across the initial build and every
    // prior COMMITTED wave (each wave materialized its own
    // keys/anchors/windows/spend) — wave 3 dedups and probes against
    // waves 1 AND 2, still never re-reading any old corpus beyond its
    // compact states. The current wave's own dirs are excluded, which
    // is what keeps a latest-wave re-run idempotent; replaying an
    // EARLIER wave after later ones layered refuses loudly at the
    // id-space gate below (its min id no longer exceeds the layered
    // max) instead of silently deduping against the future.
    def requiredState(name: String): DataFrame =
      unionState(spark, lakeDir, name, waveName).getOrElse(
        throw new IllegalArgumentException(
          s"$lakeDir has no committed `$name` state (initial build or " +
            "prior waves) — run the initial CorpusBuildJob.run first" +
            (if (name == "cur_keys")
              " (a lake built before the key state existed can backfill " +
                "it: write select doc_id, md5(text) as key from `cur`)"
             else if (name == "alloc_spent")
              " (a lake built before the spend ledger existed can " +
                "backfill it from its `mixed` table, or pass " +
                "cumulativeBudget = false for the per-wave-quota reading)"
             else "")))
    val oldKeys = requiredState("cur_keys")
    val oldCur = requiredState("cur")
    val oldAnchors = requiredState("anchors")
    val oldWindows = requiredState("token_windows")
    // the spend ledger must be denominated under THIS allocation — a
    // re-estimated allocation with a stale ledger would subtract
    // apples from oranges; refuse by name before any shard work
    val spentPrior =
      if (!cumulativeBudget) None
      else Some {
        val sp = requiredState("alloc_spent")
        val fps = sp.select(col("alloc_fp")).distinct()
          .collect().map(_.getLong(0)).toSet
        require(fps.subsetOf(Set(allocFp)),
          s"$lakeDir/alloc_spent: spend recorded under allocation " +
            s"fingerprint(s) ${(fps - allocFp).mkString(", ")} but the " +
            s"persisted allocation fingerprints to $allocFp — tokens " +
            "spent under one allocation cannot be charged against " +
            "another; rebuild the ledger with the current allocation " +
            "or restore the allocation the ledger was recorded under")
        sp
      }

    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .load(newShardsDir)
      .select(col("content")).as[Array[Byte]]
    // the whole-wave gates run BEFORE the first write: a refused run
    // (empty wave, id-space overlap — incl. an out-of-order replay —
    // or a language the frozen artifacts never saw) must leave the
    // lake byte-identical, not half-overwrite the target wave's tables
    // on its way to the refusal. The extraction is PERSISTED across
    // the probe so the wave's most expensive leg (gzip/WARC/HTTP/HTML
    // parsing of every shard) runs once, not once for the gate and
    // again for the materialization (review r18).
    val extractedF = MultiChain.extract(MultiChain.pagesFromBlobs(spark, blobs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curProbe = MultiChain.nfcDedup(MultiChain.c4Clean(extractedF))
    try {
      val bounds = curProbe.agg(min(col("doc_id")), count(lit(1))).head()
      require(bounds.getLong(1) > 0L,
        s"$newShardsDir: the wave produced ZERO post-clean documents — " +
          "nothing to ingest; a whole-wave casualty is a crawl defect, " +
          "not a no-op")
      // the id gate reads the KEY state — a column-pruned scan of one
      // long column, never the old text table
      val maxOld = oldKeys.agg(max(col("doc_id"))).head().getLong(0)
      require(bounds.getLong(0) > maxOld,
        s"id-space overlap: new wave min doc_id ${bounds.getLong(0)} <= old " +
          s"corpus max $maxOld — the min-id dedup election is only " +
          "incremental == from-scratch when every new id exceeds every old " +
          "one; renumber the wave (or, for a replay of an out-of-order or " +
          "already-COMPACTED wave, rebuild the lake — its docs would " +
          "otherwise dedup against the future)")
      // LANGUAGE-INVENTORY gate (ADVICE r18): a language this wave
      // ROUTES that the frozen pair has no cuts for (or the allocation
      // no cells for) would otherwise fail MID-run — inside
      // CcnetServing.tag's raise_error or the mix's no-cell refusal —
      // after the wave's dedup state committed. Fail here, before any
      // write. One broadcast-model scoring pass over the persisted
      // probe; the inventories are |languages|-sized collects.
      val waveLangs = MultiChain.route(curProbe,
          graft.operators.LangId.predict(curProbe, lid))
        .select(col("pred_lang")).distinct()
        .collect().map(_.getString(0)).toSet
      val cutLangs = pair.cuts.select(col("lang")).distinct()
        .collect().map(_.getString(0)).toSet
      val cellLangs = alloc.cells.select(col("lang")).distinct()
        .collect().map(_.getString(0)).toSet
      val noCut = waveLangs -- cutLangs
      require(noCut.isEmpty,
        s"wave routes language(s) ${noCut.toSeq.sorted.mkString(", ")} " +
          "absent from the frozen pair's cuts — the frozen CCNet pair " +
          "cannot bucket a language it was never estimated on; " +
          "re-estimate the pair (full rebuild) or route the language " +
          "out before ingesting this wave")
      val noCell = waveLangs -- cellLangs
      require(noCell.isEmpty,
        s"wave routes language(s) ${noCell.toSeq.sorted.mkString(", ")} " +
          "absent from the persisted allocation's cell inventory — the " +
          "mix was estimated on a different language inventory; " +
          "re-estimate the allocation or route the language out")
    } catch {
      case t: Throwable => extractedF.unpersist(blocking = false); throw t
    }
    // the wave's PREVIOUS completion marker drops before the first
    // write: a re-run that crashes mid-way must leave an UNCOMMITTED
    // wave, never a stale marker over half-new tables
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(waveDir, WaveMarker))
    val extracted = materialize("extracted", extractedF)
    extractedF.unpersist(blocking = false)
    val cleaned = materialize("cleaned", MultiChain.c4Clean(extracted))
    // a re-run WITHOUT a benchmark must also retract the wave's prior
    // benchmark record (review r18): a stale waves/<w>/bench would keep
    // feeding future waves a registry this run's manifest ignores
    if (newBenchDir.isEmpty)
      Seq("bench", "retro_contaminated").foreach(n =>
        graft.queries.PipelineQueries.deleteRecursively(
          java.nio.file.Paths.get(waveDir, n)))
    // within-wave NFC dedup, then the CROSS-WAVE election against the
    // KEY state: a new doc whose canonical text already exists in the
    // old corpus loses to the old copy (min-id election — the id-space
    // gate makes the old id always smaller, so incremental ==
    // from-scratch on the union). Only the NEW wave's text is hashed;
    // the old side is the 16-byte key column (VERDICT r19 #1).
    val cur = materialize("cur",
      electAgainstKeys(MultiChain.nfcDedup(cleaned), oldKeys))
    // the wave's OWN growth state (future waves layer over it)
    materialize("cur_keys", curKeys(cur))
    materialize("anchors", graft.operators.SubstrDedup.anchors(cur))
    materialize("token_windows",
      graft.operators.TokenDecontam.tokenWindowIndex(cur))
    // frozen-router LID + routing, exactly the initial run's stages
    val pred = materialize("pred", graft.operators.LangId.predict(cur, lid))
    val routed = materialize("routed", MultiChain.route(cur, pred))
    // FROZEN-pair tagging (scorer loads per partition from the blob)
    val tagged = materialize("tagged", graft.operators.CcnetServing.tag(
      spark,
      routed.select(col("doc_id"), col("pred_lang").as("lang"), col("text")),
      pair.cuts,
      graft.operators.CcnetServing.scorerFactory(s"$lakeDir/ccnet_pair")))
    // cross-wave duplicated spans against the persisted anchor state;
    // the span table includes retroactively-touched OLD docs — the
    // state users consume it — while the manifest covers the new wave
    val spans = materialize("spans", graft.operators.SubstrDedup
      .mergeSpans(graft.operators.SubstrDedup.dupSpansAgainst(
        cur, oldCur, oldAnchors)))
    // the benchmark legs: (a) the LATE benchmark probes the persisted
    // window index — OLD docs flip contaminated retroactively at
    // new-bench cost; (b) the new wave tests against every benchmark
    // known so far. The `contaminated` column is ALWAYS present
    // (0 when no benchmark exists anywhere) — a manifest schema that
    // appears and disappears with the registry would skew consumers.
    val newBench = newBenchDir.map { bd =>
      val nb = spark.read.parquet(bd)
      materialize("bench", nb)
      materialize("retro_contaminated", graft.operators.TokenDecontam
        .contaminationTokenSpansAgainst(nb, oldWindows))
      nb
    }
    val oldBench = unionState(spark, lakeDir, "bench", waveName)
    val waveContaminated = (oldBench.toSeq ++ newBench.toSeq)
      .reduceOption(_.unionByName(_))
      .map(b => graft.operators.TokenDecontam
        .contaminationTokenSpans(cur, b)
        .select(col("doc_id")).distinct())
    val manifest = materialize("manifest", MultiChain.keepManifest(tagged,
      MultiChain.dupPermille(cur, spans), waveContaminated))
    // the mix: kept docs sample under the PERSISTED allocation —
    // recorded seed + budgets + tokenizer fingerprint; under the
    // global reading (default) each cell's budget is reduced by the
    // spend every prior run recorded in the ledger
    val kept = routed.join(
      manifest.filter(col("keep") === 1L).select(col("doc_id")), Seq("doc_id"))
    val mixIn = MultiChain.mixInput(
      tagged.join(kept.select(col("doc_id")), Seq("doc_id")), kept)
    val mixed = materialize("mixed", spentPrior match {
      case Some(sp) => MultiChain.mixedCumulative(mixIn, alloc, sp)
      case None     => MultiChain.mixed(mixIn, alloc)
    })
    // the wave's own spend rows (possibly zero rows when every cell was
    // already exhausted — the schema still commits so the ledger stays
    // uniform across waves)
    materialize("alloc_spent", spentLedger(mixed, allocFp, waveName))
    // the wave COMMIT MARKER, written LAST: only now may later waves
    // layer this wave's state (ADVICE r18)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(waveDir, WaveMarker), Array.emptyByteArray)
    results.toSeq
  }
}
