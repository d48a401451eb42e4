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
  *   - `<lakeDir>/extracted|cleaned|cur|pred|routed|tagged` — parquet
  *     stage tables;
  *   - `<lakeDir>/mixed` — the final mix, PARTITIONED by `pred_lang`
  *     (downstream per-language consumers prune at the directory
  *     level);
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
    // the DEDUP STATE for corpus growth: the winnow-anchor table over
    // the curated corpus is what [[runIncremental]] probes new waves
    // against without re-reading this one (the q228 leg) — compact
    // (positions + 64-bit anchors, no text), norm bit recorded
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
    materialize("mixed",
      MultiChain.mixed(MultiChain.mixInput(mixBase, routed), alloc),
      partitionCols = Seq("pred_lang"), fullRebuild = true)
    results.toSeq
  }

  /** All committed copies of one state table across the lake: the
    * initial build's plus every prior wave's (`waves/<w>/<name>`),
    * EXCLUDING `excludeWave` — a wave re-run must never treat its own
    * previous output as prior state, or every doc would dedup against
    * itself. Wave order is name-sorted for determinism (row order is
    * irrelevant — every consumer aggregates or joins).
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

  /** State COMPACTION: absorb every wave's state tables into the base
    * lake tables, so the per-wave union read ([[stateTables]]) goes
    * back to one table per state regardless of how many waves have
    * landed — the union-read cost is linear in wave count, and all
    * four states are PLAIN UNIONS (md5-keyed corpus text, anchor rows,
    * window rows, benchmark docs), so compaction is one rewrite per
    * state with no semantics to re-derive. Value-preservation is
    * spec-pinned: a duplicate of an absorbed wave's doc still dies,
    * and the retro probe still reaches absorbed docs.
    *
    * Write discipline, CRASH-SAFE at every window (review r18 — the
    * first cut could lose the base table between delete and move):
    *
    *   1. write the DISTINCT union to `__compact_<name>` (scratch);
    *   2. delete the base table;
    *   3. move the scratch into place;
    *   4. delete the absorbed wave copies.
    *
    * A crash after (1) leaves a stale scratch beside an intact base —
    * the next compaction deletes and rebuilds it. A crash between (2)
    * and (3) leaves the committed scratch as the ONLY full copy;
    * [[stateTables]] refuses that lake by name and re-running
    * compactState FINISHES THE SWAP (the recovery branch below) —
    * state is never lost, merely not yet in place. A crash after (3)
    * leaves wave copies that the next compaction re-absorbs; the
    * DISTINCT union makes that re-absorption row-exact instead of
    * row-doubling (all four states are sets — md5-keyed docs, anchor
    * rows, window rows, benchmark docs). Re-running a completed
    * compaction is a no-op. Single-writer lake assumed, same as every
    * overwrite in this job.
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
          && !java.nio.file.Files.exists(base.resolve("_SUCCESS")))
        java.nio.file.Files.move(scratch, base)
      val waveCopies =
        if (!java.nio.file.Files.exists(wavesRoot)) Seq.empty
        else listDir(wavesRoot)
          .sortBy(_.getFileName.toString)
          .map(_.resolve(name))
          .filter(p => java.nio.file.Files.exists(p.resolve("_SUCCESS")))
      if (waveCopies.isEmpty && java.nio.file.Files.exists(scratch))
        // a stale scratch beside an intact base (crash after step 1)
        // has nothing to contribute — clear it
        graft.queries.PipelineQueries.deleteRecursively(scratch)
      if (waveCopies.nonEmpty) {
        // DISTINCT, not a bare union: a crash-after-swap re-absorption
        // would otherwise double every absorbed row
        val all = stateTables(spark, lakeDir, name, excludeWave = "")
          .reduce(_.unionByName(_)).distinct()
        all.write.mode("overwrite").parquet(scratch.toString)
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
    Seq("cur", "anchors", "token_windows", "bench")

  /** The CORPUS-GROWTH leg (the q228 shape, dir-parameterized): process
    * a NEW wave of `.warc.gz` shards against a prior [[run]]'s lake —
    * the old corpus is touched ONLY through its persisted states:
    *
    *   - `<lakeDir>/cur` — md5 keys for cross-wave exact dedup (one
    *     column-pruned scan of the old table, no text comparison);
    *   - `<lakeDir>/anchors` — the winnow-anchor state
    *     (`dupSpansAgainst`: per-wave cost scales with the wave plus
    *     the genuinely-duplicated old mass);
    *   - `<lakeDir>/ccnet_pair` — the FROZEN serving pair: the new
    *     wave is tagged with wave-1's model and cuts, never a
    *     re-estimation (re-estimating per wave would re-bucket history
    *     — the published CCNet deployment freezes the pair);
    *   - `<lakeDir>/allocation` — the persisted mix: each wave samples
    *     under the SAME per-cell token budgets and recorded seed (the
    *     per-wave-quota reading of a budget; a group the allocation
    *     never saw refuses by name).
    *
    * Stage tables land under `<lakeDir>/waves/<waveName>/…`, overwrite
    * mode — re-running the LATEST wave is idempotent (its own state
    * dirs are excluded from the prior-state union). Prior state LAYERS:
    * every earlier wave's cur/anchors/token_windows/bench tables union
    * with the initial build's, so wave N dedups and probes against all
    * of waves 1..N-1 at compact-state cost. Replaying an EARLIER wave
    * after later ones landed refuses at the id-space gate (by then its
    * ids no longer exceed the layered max) — out-of-order replay is a
    * loud error, never a silent dedup against the future.
    *
    * Gates, all loud: router n, pair/allocation manifests, anchor norm
    * bit (inside `dupSpansAgainst`), and the ID-SPACE gate — every new
    * doc_id must exceed every old one, because the min-id dedup
    * election is only incremental == from-scratch under that order
    * (spec-pinned: the kept set equals a from-scratch dedup over the
    * union). An empty post-clean wave refuses by name rather than
    * silently writing empty tables.
    *
    * keep = `contaminated == 0 && dup_permille <= 300 && bucket !=
    * tail` (the q228 rule verbatim).
    *
    * `newBenchDir` (optional): a parquet dir of benchmark documents
    * that ARRIVED WITH THIS WAVE. Two probes run: (a) the new
    * benchmark against the lake's PERSISTED token-window index —
    * `retro_contaminated` records OLD docs that flip contaminated
    * retroactively (the q228 doc-106 shape: cost scales with the new
    * benchmark, never the old corpus); (b) the new WAVE against every
    * benchmark known so far (the initial registry plus this wave's).
    * The wave also materializes its own anchor/window state tables so
    * future waves can layer over them.
    */
  def runIncremental(spark: SparkSession, newShardsDir: String,
                     lakeDir: String, lidDir: String, waveName: String,
                     newBenchDir: Option[String] = None)
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
    // prior state is the UNION across the initial build and every
    // PRIOR wave (each wave materialized its own anchors/windows/cur)
    // — wave 3 dedups and probes against waves 1 AND 2, still never
    // re-reading any old corpus beyond its compact states. The current
    // wave's own dirs are excluded, which is what keeps a latest-wave
    // re-run idempotent; replaying an EARLIER wave after later ones
    // layered refuses loudly at the id-space gate below (its min id no
    // longer exceeds the layered max) instead of silently deduping
    // against the future.
    def requiredState(name: String): DataFrame =
      unionState(spark, lakeDir, name, waveName).getOrElse(
        throw new IllegalArgumentException(
          s"$lakeDir has no committed `$name` state (initial build or " +
            "prior waves) — run the initial CorpusBuildJob.run first"))
    val oldCur = requiredState("cur")
    val oldAnchors = requiredState("anchors")
    val oldWindows = requiredState("token_windows")

    val blobs = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc.gz")
      .load(newShardsDir)
      .select(col("content")).as[Array[Byte]]
    // the whole-wave gates run BEFORE the first write: a refused run
    // (empty wave, id-space overlap — incl. an out-of-order replay)
    // must leave the lake byte-identical, not half-overwrite the
    // target wave's tables on its way to the refusal. The extraction
    // is PERSISTED across the probe so the wave's most expensive leg
    // (gzip/WARC/HTTP/HTML parsing of every shard) runs once, not once
    // for the gate and again for the materialization (review r18).
    val extractedF = MultiChain.extract(MultiChain.pagesFromBlobs(spark, blobs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curProbe = MultiChain.nfcDedup(MultiChain.c4Clean(extractedF))
    try {
      val bounds = curProbe.agg(min(col("doc_id")), count(lit(1))).head()
      require(bounds.getLong(1) > 0L,
        s"$newShardsDir: the wave produced ZERO post-clean documents — " +
          "nothing to ingest; a whole-wave casualty is a crawl defect, " +
          "not a no-op")
      val maxOld = oldCur.agg(max(col("doc_id"))).head().getLong(0)
      require(bounds.getLong(0) > maxOld,
        s"id-space overlap: new wave min doc_id ${bounds.getLong(0)} <= old " +
          s"corpus max $maxOld — the min-id dedup election is only " +
          "incremental == from-scratch when every new id exceeds every old " +
          "one; renumber the wave (or, for a replay of an out-of-order or " +
          "already-COMPACTED wave, rebuild the lake — its docs would " +
          "otherwise dedup against the future)")
    } catch {
      case t: Throwable => extractedF.unpersist(blocking = false); throw t
    }
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
    // within-wave NFC dedup, then the CROSS-WAVE election: a new doc
    // whose canonical text already exists in the old corpus loses to
    // the old copy (min-id election — the id-space gate makes the old
    // id always smaller, so incremental == from-scratch on the union)
    val curWithin = MultiChain.nfcDedup(cleaned)
    val cur = materialize("cur", curWithin
      .join(oldCur.select(md5(col("text")).as("__k")),
        md5(curWithin("text")) === col("__k"), "left_anti"))
    // the wave's OWN growth state (future waves layer over it)
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
    val permille = cur
      .select(col("doc_id"), length(col("text")).cast("long").as("total_chars"))
      .join(spans.groupBy(col("doc_id"))
        .agg(sum(col("span_len")).as("dup_chars")), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("total_chars") === 0L, 0L)
          .otherwise(expr("(coalesce(dup_chars, 0L) * 1000) div total_chars"))
          .as("dup_permille"))
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
        .select(col("doc_id")).distinct()
        .withColumn("contaminated", lit(1L)))
    val manifest = materialize("manifest", waveContaminated
      .map(c => tagged.join(c, Seq("doc_id"), "left"))
      .getOrElse(tagged.withColumn("contaminated", lit(null).cast("long")))
      .withColumn("contaminated", coalesce(col("contaminated"), lit(0L)))
      .join(permille, Seq("doc_id"))
      .select(col("doc_id"), col("lang").as("pred_lang"), col("bucket"),
        col("avg_millibits"), col("dup_permille"), col("contaminated"),
        (col("contaminated") === 0L && col("dup_permille") <= 300L
          && col("bucket") =!= "tail").cast("long").as("keep")))
    // the mix: kept docs sample under the PERSISTED allocation —
    // recorded seed + budgets + tokenizer fingerprint, the replayable
    // per-wave quota
    val kept = routed.join(
      manifest.filter(col("keep") === 1L).select(col("doc_id")), Seq("doc_id"))
    val mixIn = MultiChain.mixInput(
      tagged.join(kept.select(col("doc_id")), Seq("doc_id")), kept)
    materialize("mixed", MultiChain.mixed(mixIn, alloc))
    results.toSeq
  }
}
